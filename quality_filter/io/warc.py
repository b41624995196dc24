"""WARC container source/sink — the Common-Crawl interchange format.

Crawl corpora arrive as WARC (ISO 28500): concatenated records, each a
``WARC/1.0`` header block terminated by CRLFCRLF, a Content-Length-framed
payload, then CRLFCRLF.  Length framing means ARBITRARY payload bytes are
safe — no quoting/escaping layer to get wrong (the failure mode the
JSONL/CSV fidelity twins exist to catch is impossible by construction
here; the fidelity contract is proved anyway, like ORC).

Spark shape:
  * ``read_warc``: a ``binaryFile`` scan (one task per WARC file — the
    Common-Crawl parallelism unit: CC ships millions of ~1 GB warc.gz
    files, and gzip'd WARC is not block-splittable, so per-file tasks
    are the real-world decomposition) + an Arrow-batched ``mapInPandas``
    parse into (url, warc_date, headers, payload) rows.  Whole-file gzip
    is handled transparently (magic-sniffed).
  * ``write_warc``: an Arrow-batched ``mapInPandas`` partition writer —
    one ``part-NNNNN.warc`` per input partition, returning a manifest
    (file, n_records) DataFrame; the write IS a Spark job, sized by the
    input partitioning.  Paths here are local-FS for the sandbox; on a
    cluster the same writer targets a fused mount / NFS-style path —
    the seam is the path string, not the code shape.

Strictness discipline (the FAILFAST lesson from io/formats.py): the
parser raises on any framing violation (missing version line, bad
Content-Length, missing record terminator) instead of resyncing
silently — a truncated crawl dump must abort the batch, not shrink it.
The writer rejects header values containing CR/LF (ISO 28500 forbids
bare CRLF in field values); payloads are unrestricted.
"""

from __future__ import annotations

import gzip
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("payload", T.BinaryType()),
    ]
)


def build_record(url: str, date: str, payload: bytes,
                 extra_headers: dict[str, str] | None = None,
                 rec_type: str = "resource") -> bytes:
    """One WARC record (``rec_type``: resource for raw payloads,
    conversion for WET extracted text).  Header values must be CRLF-free
    (ISO 28500); violations raise — a corrupt header would desynchronize
    every downstream reader of the file."""
    fields = [("WARC-Type", rec_type), ("WARC-Target-URI", url), ("WARC-Date", date)]
    for k, v in (extra_headers or {}).items():
        fields.append((k, v))
    for k, v in fields:
        if v is None:
            raise ValueError(f"WARC header field {k!r} is None — headers carry "
                             "strings only (encode NULLs upstream)")
        v = str(v)
        if "\r" in v or "\n" in v or "\r" in k or "\n" in k:
            raise ValueError(f"WARC header field {k!r} contains CR/LF: {v!r}")
        if v != v.strip() or k != k.strip():
            # the parser (and the WARC grammar) strips surrounding
            # whitespace from field values — padded values cannot
            # round-trip byte-identically, so refuse rather than mutate
            raise ValueError(f"WARC header field {k!r} has surrounding "
                             f"whitespace (not round-trippable): {v!r}")
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("utf-8") for k, v in fields
    ) + f"Content-Length: {len(payload)}\r\n".encode() + CRLF
    return head + payload + CRLF + CRLF


def iter_warc_records(data: bytes):
    """Yield (headers_dict, payload) per record; header names lowercased.
    Strict framing: any violation raises ValueError.  Whole-file gzip is
    decompressed transparently."""
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at byte {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated header block at byte {pos}")
        lines = data[pos:hdr_end].decode("utf-8").split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            name, sep, value = line.partition(":")
            if not sep:
                raise ValueError(f"malformed header line {line!r}")
            headers[name.strip().lower()] = value.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"bad Content-Length in record at byte {pos}") from e
        body_start = hdr_end + 4
        body_end = body_start + clen
        if data[body_end:body_end + 4] != b"\r\n\r\n":
            raise ValueError(f"missing record terminator at byte {body_end}")
        yield headers, data[body_start:body_end]
        pos = body_end + 4


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    header_cols: tuple[str, ...] = (),
    rec_type: str = "resource",
    const_headers: dict[str, str] | None = None,
    suffix: str = ".warc",
    header_names: tuple[str, ...] | None = None,
) -> DataFrame:
    """Write ``df`` as one WARC file per partition under ``path``
    (cleared first — overwrite semantics).  ``header_cols`` travel as
    ``X-<Name>`` WARC headers (CRLF-free values enforced);
    ``const_headers`` are stamped verbatim on every record (the WET
    Content-Type seam); the payload column is raw bytes.  Returns the
    collected-but-small manifest (file, n_records), one row per
    non-empty partition."""
    import pandas as pd

    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    cols = [url_col, date_col, payload_col, *header_cols]
    hdr_names = list(header_names) if header_names is not None else [
        f"X-{c.replace('_', '-').title()}" for c in header_cols
    ]
    if len(hdr_names) != len(header_cols):
        raise ValueError("header_names must match header_cols 1:1")

    def _write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}{suffix}")
        n = 0
        fh = None
        try:
            for pdf in batches:
                if fh is None:
                    fh = open(fname, "wb")
                for row in pdf.itertuples(index=False):
                    # FAILFAST on NULLs (the CRLF-rejection discipline):
                    # str(None) would stamp the literal 'None' into headers
                    # and a NULL payload would silently round-trip to b''/"".
                    for c in (url_col, date_col, payload_col, *header_cols):
                        if getattr(row, c) is None:
                            raise ValueError(
                                f"write_warc: NULL {c!r} in record for "
                                f"{getattr(row, url_col)!r} — WARC cannot "
                                "represent NULL; filter or fill upstream"
                            )
                    extra = dict(const_headers or {})
                    extra.update(
                        (h, str(getattr(row, c)))
                        for h, c in zip(hdr_names, header_cols)
                    )
                    fh.write(
                        build_record(
                            str(getattr(row, url_col)),
                            str(getattr(row, date_col)),
                            bytes(getattr(row, payload_col)),
                            extra,
                            rec_type=rec_type,
                        )
                    )
                    n += 1
        finally:
            if fh is not None:
                fh.close()
        if n:
            yield pd.DataFrame({"file": [fname], "n_records": [n]})

    manifest = df.select(*cols).mapInPandas(_write, "file string, n_records long").cache()
    manifest.count()  # materialize the write job exactly once (manifest is O(partitions))
    return manifest


def read_warc(
    spark: SparkSession, path: str, require_type: str | None = None
) -> DataFrame:
    """WARC files under ``path`` → (url, warc_date, headers, payload)
    rows.  One task per file (the CC decomposition); parse is an
    Arrow-batched mapInPandas over file contents.  ``require_type``
    makes the parse task ABORT on any record of a different WARC-Type
    (the WET strictness seam) — enforced where the bytes are read, so
    column pruning can never skip it."""
    import glob as _glob

    import pandas as pd

    if not _glob.glob(os.path.join(path, "*.warc*")):
        # empty input wrote no files; the other interchange twins return
        # an empty frame here, not an AnalysisException
        return spark.createDataFrame([], READ_SCHEMA)
    files = spark.read.format("binaryFile").load(os.path.join(path, "*.warc*"))

    def _parse(batches):
        for pdf in batches:
            out = {"url": [], "warc_date": [], "headers": [], "payload": []}
            for content in pdf["content"]:
                for headers, payload in iter_warc_records(bytes(content)):
                    if require_type is not None and headers.get(
                        "warc-type"
                    ) != require_type:
                        raise ValueError(
                            f"expected WARC-Type {require_type!r}, got "
                            f"{headers.get('warc-type')!r} for "
                            f"{headers.get('warc-target-uri')!r}"
                        )
                    out["url"].append(headers.get("warc-target-uri"))
                    out["warc_date"].append(headers.get("warc-date"))
                    out["headers"].append(headers)
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    return files.select("content").mapInPandas(_parse, READ_SCHEMA)


def write_wet(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    date_col: str = "warc_date",
    text_col: str = "text",
    header_cols: tuple[str, ...] = (),
) -> DataFrame:
    """WET sink — Common Crawl's extracted-text sibling of WARC: each
    record is ``WARC-Type: conversion`` with a ``text/plain`` UTF-8
    payload and a ``WARC-Refers-To`` pointer at the source capture
    (synthesized deterministically from the URL here; CC points at the
    response record's uuid).  This is exactly what the pipeline's
    extracted_text column IS — the engine can hand its output to any
    WET consumer.  Same partition-writer shape as write_warc."""
    from pyspark.sql import functions as F

    pages = df.select(
        F.col(url_col).alias("url"),
        F.col(date_col).alias("warc_date"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        # NB: itertuples() renames leading-underscore columns — the
        # internal refers column must be a plain identifier
        F.concat(F.lit("<urn:qf:source:"), F.col(url_col), F.lit(">")).alias(
            "qf_refers_to"
        ),
        *[F.col(c) for c in header_cols],
    )
    return write_warc(
        pages,
        path,
        header_cols=("qf_refers_to", *header_cols),
        rec_type="conversion",
        const_headers={"Content-Type": "text/plain"},
        suffix=".warc.wet",
        header_names=(
            "WARC-Refers-To",
            *[f"X-{c.replace('_', '-').title()}" for c in header_cols],
        ),
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET files under ``path`` → (url, warc_date, text, headers) rows.
    Strict: every record must be ``WARC-Type: conversion`` (a WET file
    containing response/resource records is a mislabeled WARC — abort,
    the formats-module FAILFAST discipline) — enforced inside the parse
    task itself, where the bytes are read, so column pruning can never
    elide the check."""
    from pyspark.sql import functions as F

    rt = read_warc(spark, path, require_type="conversion")
    return rt.select(
        "url",
        "warc_date",
        F.decode(F.col("payload"), "UTF-8").alias("text"),
        "headers",
    )
