"""pages-table IO: Iceberg-first with a partitioned-parquet fallback.

The design target is an Iceberg table partitioned by days(warc_ts)
(north_rule).  The sandbox has no Iceberg runtime jar, so the same layout
is expressed as hive-partitioned parquet (`warc_dt=YYYY-MM-DD/`): scan
planning still prunes partitions on warc_dt predicates, which is what the
per-split checkpoint/resume relies on.  Code paths select on the source
string so a cluster with Iceberg uses `iceberg:<catalog.db.table>`
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "warc_dt"


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """``iceberg:db.pages`` → Iceberg catalog table; anything else →
    (partitioned) parquet path."""
    if source.startswith("iceberg:"):
        return spark.read.format("iceberg").load(source[len("iceberg:"):])
    return spark.read.parquet(source)


def with_partition_col(df: DataFrame) -> DataFrame:
    return df.withColumn(PARTITION_COL, F.to_date("warc_ts").cast("string"))


def write_pages_partitioned(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the pages table partitioned by day — the days(warc_ts)
    Iceberg partition transform expressed as a hive layout."""
    with_partition_col(df).write.mode(mode).partitionBy(PARTITION_COL).parquet(path)


def url_host(url=None) -> F.Column:
    """Host component for salting/rollups (parse_url is JVM-native)."""
    return F.parse_url(F.col("url") if url is None else url, F.lit("HOST"))
