"""Watermarked tumbling-window keep-rate over a scored stream."""

import pytest

from quality_filter.corpus import generate_pages, pages_spark_schema
from quality_filter.pipeline import tiered_scored
from quality_filter.streaming.stream import (
    read_pages_stream, score_stream, windowed_keep_rate,
)

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401


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
