"""URL ingest source tests — driven with file:// URLs (no network in the
sandbox; urllib serves them through the same interface), covering fetch,
sniff, quarantine-on-error, and the handoff into the scoring pipeline."""

import pandas as pd
from pyspark.sql import functions as F

from quality_filter.io.fetch import fetch_urls, fetched_to_pages, sniff_content_type

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401


def test_sniff_content_type():
    assert sniff_content_type(b"\x89PNG\r\n") == "image/png"
    assert sniff_content_type(b"<html><body>x</body></html>") == "text/html"
    assert sniff_content_type(b"  <p>leading ws</p>") == "text/html"
    assert sniff_content_type("plain words\n".encode()) == "text/plain"
    assert sniff_content_type(b"\xff\xfe\x00\x01\x80\xff") == "application/octet-stream"
    assert sniff_content_type(b"P6\n2 2\n255\n" + b"\x00" * 12) == "image/x-portable-pixmap"


def test_fetch_urls_file_scheme(spark, tmp_path):
    html = tmp_path / "page.html"
    html.write_bytes(b"<html><body><p>hello fetched world</p></body></html>")
    txt = tmp_path / "doc.txt"
    txt.write_bytes(b"the and of to in is was for on with plain text content here")
    png = tmp_path / "img.bin"
    png.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)

    urls = [
        f"file://{html}",
        f"file://{txt}",
        f"file://{png}",
        f"file://{tmp_path}/does_not_exist.html",   # fetch error -> quarantine row
        None,
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = fetch_urls(df).toPandas()
    by = {r["url"]: r for _, r in out.iterrows() if r["url"] is not None}

    assert by[urls[0]]["fetch_ok"] and by[urls[0]]["content_type"] == "text/html"
    assert by[urls[1]]["fetch_ok"] and by[urls[1]]["content_type"] == "text/plain"
    assert by[urls[2]]["fetch_ok"] and by[urls[2]]["content_type"] == "image/png"
    assert not by[urls[3]]["fetch_ok"] and by[urls[3]]["error"]
    nulls = out[out["url"].isna()]
    assert len(nulls) == 1 and not nulls["fetch_ok"].iloc[0]
    assert bytes(by[urls[0]]["payload"]) == html.read_bytes()


def test_fetched_pages_flow_through_pipeline(spark, tmp_path):
    """fetch -> pages shape -> score_documents: texty payloads extract and
    score; failed fetches and binary payloads quarantine as undecodable."""
    from quality_filter.pipeline import score_documents

    good = tmp_path / "good.html"
    good.write_bytes(
        "<html><body><p>{}</p></body></html>".format(
            "the quick brown fox and the lazy dog were seen on the hill "
            "with a telescope for what it is worth " * 3
        ).encode()
    )
    binary = tmp_path / "blob.bin"
    binary.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    urls = [f"file://{good}", f"file://{binary}", f"file://{tmp_path}/missing.html"]
    fetched = fetch_urls(spark.createDataFrame([(u,) for u in urls], ["url"]))
    pages = fetched_to_pages(fetched)
    scored = score_documents(pages).toPandas().set_index("url")

    assert scored.loc[urls[0], "status"] in ("keep", "drop")  # scored for real
    assert scored.loc[urls[0], "extracted_text"].startswith("the quick brown fox")
    assert scored.loc[urls[1], "status"] == "quarantine"
    assert scored.loc[urls[2], "status"] == "quarantine"
