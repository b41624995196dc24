"""Bucketed-table IO: pre-shuffled co-location for repeated joins.

At 10^12 docs, every doc-keyed join (scores x metadata, dedup labels x
corpus, embedding index x text) pays a full shuffle of both sides unless
the tables are CO-LOCATED.  Hash-bucketing both tables on the join key at
write time (`bucketBy` + `sortBy`) moves that shuffle to ingest: Spark's
bucketed scan exposes the on-disk hash partitioning to the planner, so a
join of two tables bucketed on the same key with the same bucket count
plans WITHOUT an Exchange on either side (and with `sortBy`, without a
Sort), and an equality filter on the bucket key prunes to a single
bucket's files at the scan (`SelectedBucketsCount`).

This is the Iceberg `bucket(N, col)` partition-transform analog in the
sandbox's catalog (BASELINE.json names an Iceberg input; the same write
pattern maps 1:1 onto `writeTo(...).partitionedBy(bucket(N, col))` when
an Iceberg runtime is present).

`bucketBy` requires a catalog table (saveAsTable) — plain parquet paths
carry no bucketing metadata.  Tables are written EXTERNAL (explicit
path) so test/job artifacts stay under the caller's directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame, name: str, path: str, bucket_col: str, n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external catalog table hash-bucketed (and
    sorted) by ``bucket_col``.  Joins between tables written with the
    SAME (key, n_buckets) are exchange-free; pick n_buckets so one
    bucket's rows fit an executor (at 10^12 docs: thousands of buckets —
    bucket count, unlike partition count, is fixed at write time, so
    size it for the largest planned consumer)."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(name)
    )


def read_bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — the ONLY way the planner sees the bucket spec
    (spark.read.parquet(path) on the same files would silently drop the
    co-location and reintroduce the shuffle)."""
    return spark.table(name)
