"""Validation expressions + stateful streaming forward fill."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from quality_filter.functions.validation import (
    base64_decode, check_conservation, enum_check, non_empty_check,
)

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

SF = "/root/testdata/sf0.01"


def test_enum_check_soft_and_hard(spark):
    df = spark.createDataFrame(
        [("MEAN",), ("MEDIAN",), ("BOGUS",), (None,)], ["agg"]
    )
    soft = df.select(enum_check(F.col("agg"), ("MEAN", "MEDIAN", "MAX", "MIN")).alias("ok")).collect()
    assert [r.ok for r in soft] == [True, True, False, True]
    hard = df.filter(F.col("agg") != "BOGUS").select(
        enum_check(F.col("agg"), ("MEAN", "MEDIAN"), soft=False)
    )
    hard.collect()  # valid rows pass through
    with pytest.raises(Exception):
        df.select(enum_check(F.col("agg"), ("MEAN",), soft=False)).collect()


def test_base64_source(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    rt = docs.select(
        "doc_id",
        F.decode(base64_decode(F.base64(F.encode("text", "UTF-8"))), "UTF-8").alias("roundtrip"),
        "text",
    ).toPandas()
    assert (rt["roundtrip"] == rt["text"]).all()
    bad = spark.createDataFrame([("!!!not-base64???",)], ["b"]).select(
        base64_decode(F.col("b")).alias("d")
    ).head()
    assert bad["d"] is None  # malformed → NULL → quarantine, not exception


def test_non_empty_check(spark):
    df = spark.createDataFrame([("x",), ("",), (None,)], ["t"])
    got = [r.ok for r in df.select(non_empty_check(F.col("t")).alias("ok")).collect()]
    assert got == [True, False, False]


def test_conservation_via_exceptall(spark):
    from quality_filter.corpus import generate_pages, pages_spark_schema
    from quality_filter.pipeline import filter_corpus

    pages = generate_pages(150, seed=31).drop(columns=["cls"])
    sdf = spark.createDataFrame(pages, schema=pages_spark_schema())
    kept, dropped, quar = filter_corpus(sdf)
    res = check_conservation(sdf, [kept, dropped, quar], key="url")
    assert res == {"missing": 0, "extra": 0, "ok": True}
    # negative control: drop one output → invariant fails
    res2 = check_conservation(sdf, [kept, dropped], key="url")
    assert not res2["ok"] and res2["missing"] > 0


def test_stream_forward_fill_late_matches_batch_on_shuffled_arrival(spark, tmp_path):
    """Out-of-order micro-batch input: rows arrive shuffled within
    10-minute blocks (inside the watermark delay).  The watermarked
    variant buffers, reorders by event time, and flushes the tail via
    EventTimeTimeout on the sentinel-driven no-data batch — output equals
    the batch forward fill exactly.  The in-order variant would be wrong
    on this input by construction."""
    import random
    import time

    from quality_filter.operators.windows import forward_fill
    from quality_filter.streaming.stateful import stream_forward_fill_late

    base = pd.Timestamp("2025-06-01 00:00:00")
    rng = random.Random(42)
    rows = []
    eid = 0
    for block in range(4):           # 4 blocks x 10 minutes
        block_rows = []
        for minute in range(10):
            for user in (1, 2, 3):
                v = (
                    None if rng.random() < 0.6
                    else round(rng.uniform(1, 100), 3)
                )
                block_rows.append(
                    (user, base + pd.Timedelta(minutes=block * 10 + minute), eid, v)
                )
                eid += 1
        rng.shuffle(block_rows)      # disorder WITHIN the watermark delay
        rows.append(block_rows)

    cols = ["user_id", "ts", "event_id", "v"]
    stream_dir = str(tmp_path / "late_stream")
    schema = "user_id LONG, ts TIMESTAMP, event_id LONG, v DOUBLE"
    for i, block_rows in enumerate(rows):
        spark.createDataFrame(pd.DataFrame(block_rows, columns=cols), schema=schema) \
            .coalesce(1).write.mode("append").parquet(stream_dir)
        time.sleep(0.3)  # distinct mtimes -> file source preserves order
    # sentinel far in the future: advances the watermark past every real
    # row so the buffered tail flushes (excluded from the comparison)
    sentinel = pd.DataFrame([(999, base + pd.Timedelta(days=7), 10**6, 1.0)], columns=cols)
    spark.createDataFrame(sentinel, schema=schema).coalesce(1).write.mode("append").parquet(stream_dir)

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    filled = stream_forward_fill_late(
        sdf, "user_id", "ts", "event_id", "v", "filled", delay="10 minutes"
    )
    q = (
        filled.writeStream.format("parquet")
        .option("path", str(tmp_path / "late_out"))
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.read.parquet(str(tmp_path / "late_out"))
        .filter(F.col("user_id") != 999)
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    flat = pd.DataFrame([r for b in rows for r in b], columns=cols)
    batch = spark.createDataFrame(flat, schema=schema)
    want = (
        forward_fill(batch, "user_id", "ts", "event_id", F.col("v"), "filled")
        .select("user_id", "ts", "event_id", "filled")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) == len(want) == 120
    pd.testing.assert_series_equal(got["filled"], want["filled"], check_names=False)
    pd.testing.assert_series_equal(got["event_id"], want["event_id"], check_names=False)


def test_stream_forward_fill_matches_batch(spark, tmp_path):
    from quality_filter.operators.windows import forward_fill
    from quality_filter.streaming.stateful import stream_forward_fill

    ev_path = f"{SF}/events.parquet"
    batch_ev = spark.read.parquet(ev_path)
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))

    want = (
        forward_fill(batch_ev, "user_id", "ts", "event_id", pv, "filled")
        .select("user_id", "ts", "event_id", "filled")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )

    # stage the events file into a stream dir
    batch_ev.write.mode("overwrite").parquet(str(tmp_path / "evstream"))
    sdf = spark.readStream.schema(batch_ev.schema).parquet(str(tmp_path / "evstream"))
    prepared = sdf.withColumn("v", pv).select("user_id", "ts", "event_id", "v")
    filled = stream_forward_fill(prepared, "user_id", "ts", "event_id", "v", "filled")
    q = (
        filled.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_series_equal(got["filled"], want["filled"], check_names=False)
