"""Multimodal plumbing tests — schema, batching, quarantine discipline.
The decode itself is a documented stub; what these tests pin is the
Spark-side contract (Arrow batch flow, null routing, decimation)."""

import pytest
from pyspark.sql import functions as F

from quality_filter.operators.multimodal import (
    IMAGE_FEATURE_DIM, MEDIA_SCHEMA, decode_features, frame_sample, generate_media,
)

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(generate_media(120, seed=11), schema=MEDIA_SCHEMA)


def test_decode_schema_and_rowcount(spark, media):
    out = decode_features(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "payload_bytes", "payload_crc", "features", "decode_ok",
    ]
    rows = out.collect()
    assert len(rows) == 120


def test_null_payloads_quarantined_not_failed(spark, media):
    out = decode_features(media).toPandas()
    nulls = out[out["payload_bytes"].isna()]
    assert len(nulls) > 0
    assert (~nulls["decode_ok"]).all()
    ok = out[out["decode_ok"]]
    assert (ok["features"].map(len) == IMAGE_FEATURE_DIM).all()


def test_decode_deterministic(spark, media):
    a = decode_features(media).toPandas().sort_values("media_id")
    b = decode_features(media.repartition(7)).toPandas().sort_values("media_id")
    assert (a["payload_crc"].fillna(-1).values == b["payload_crc"].fillna(-1).values).all()
    for fa, fb in zip(a["features"], b["features"]):
        assert (fa is None and fb is None) or list(fa) == list(fb)


def test_frame_sample_decimation(spark, media):
    out = frame_sample(media, every_k=4).toPandas()
    # per url: rows 1, 3, 7, 11, ... (rn==1 or (rn+1)%4==0)
    full = media.toPandas()
    per_url = full.groupby("url").size()
    expected = sum(1 + (n + 1) // 4 - (1 if (1 + 1) % 4 == 0 else 0) for n in per_url)
    # structural: fewer rows out, at least one per url
    assert 0 < len(out) < len(full)
    assert set(out["url"]) == set(full["url"])
