"""Watermarked tumbling-window keep-rate over a scored stream."""

import pytest

from quality_filter.corpus import generate_pages, pages_spark_schema
from quality_filter.pipeline import tiered_scored
from quality_filter.streaming.stream import (
    read_pages_stream, score_stream, windowed_keep_rate,
)

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401


def test_streaming_session_window_matches_batch_sessionize(spark, tmp_path):
    """F.session_window (streaming, state-store merged) must produce the
    same (user, session_start, n_events) set as the batch lag-based
    sessionize — identical gap semantics by definition."""
    from pyspark.sql import functions as F

    from quality_filter.operators.windows import sessionize
    from quality_filter.streaming.stream import stream_sessionized_counts

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .filter(F.col("user_id") <= 20)
        # the parquet reads as TIMESTAMP_NTZ; watermarks need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    src = str(tmp_path / "sess_src")
    ev.write.parquet(src)
    # sentinel in a LATER file: session windows emit in append mode only
    # once the watermark passes their end; the far-future row flushes
    # every real session (excluded from the comparison below)
    import time

    time.sleep(0.3)
    spark.createDataFrame(
        [(10**6, ev.agg(F.max("ts")).head()[0] + __import__("datetime").timedelta(days=30),
          9999, "view", 1.0, "{}")],
        schema=ev.schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    agg = stream_sessionized_counts(stream, "user_id", "ts", gap="1 hour", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
        if r["user_id"] != 9999
    }

    batch = sessionize(ev, "user_id", "ts", "event_id", gap_seconds=3600)
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == want and len(got) > 10


def test_windowed_keep_rate_matches_batch(spark, tmp_path):
    pages = generate_pages(240, seed=55, days=2).drop(columns=["cls"])
    sdf_b = spark.createDataFrame(pages, schema=pages_spark_schema())
    src = str(tmp_path / "src")
    sdf_b.write.parquet(src)

    stream = read_pages_stream(spark, src, max_files=3)
    agg = windowed_keep_rate(score_stream(stream), watermark="0 seconds", window="6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("keeprate")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from keeprate").toPandas().sort_values("window_start")

    from pyspark.sql import functions as F

    want = (
        tiered_scored(sdf_b)
        .groupBy(F.window("warc_ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("status") == "keep", 1).otherwise(0)).alias("n_keep"),
        )
        .select(F.col("w.start").alias("window_start"), "n_docs", "n_keep")
        .toPandas().sort_values("window_start")
    )
    assert len(got) == len(want)
    assert (got["n_docs"].values == want["n_docs"].values).all()
    assert (got["n_keep"].values == want["n_keep"].values).all()
    assert ((got["n_keep"] <= got["n_docs"]).all())
