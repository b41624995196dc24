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


INVALID_HOST = "_invalid_"


def url_host(url=None) -> F.Column:
    """Host component for salting/rollups (try_parse_url is JVM-native).
    Malformed URLs map to the ``_invalid_`` sentinel host instead of
    aborting the job (ANSI parse_url throws — one bad crawl record would
    kill a whole rollup batch); bad rows aggregate under the sentinel,
    visible in the rollup output for quarantine."""
    u = F.col("url") if url is None else url
    return F.coalesce(F.try_parse_url(u, F.lit("HOST")), F.lit(INVALID_HOST))


TRACKING_PARAM_PATTERN = "^(utm_[^=]*|ref|fbclid|gclid)="


def canonical_url_col(url=None) -> F.Column:
    """SURT-style URL canonicalization for URL-level dedup (the web-corpus
    practice of collapsing crawl variants of one page before any content
    dedup): lowercase the host, strip a leading ``www.``, drop the
    fragment, strip a trailing slash from the path, remove tracking query
    params (utm_*/ref/fbclid/gclid) and sort the survivors so param order
    never splits a page's identity.

    Pure narrow map over JVM-native functions (try_parse_url + array
    HOFs); no shuffle, no UDF — at 10^12 pages this runs at scan speed.
    Scheme is normalized to https (crawls record http/https variants of
    the same page).

    Malformed URLs NEVER abort the job (ANSI ``parse_url`` throws —
    one bad crawl record would crash a batch or permanently wedge
    ``stream_url_dedup``'s microbatch): ``try_parse_url`` yields NULL
    for unparseable input, and such rows fall back to their RAW url
    string as the canonical key — they dedup among byte-identical
    copies of themselves and are preserved for quarantine downstream."""
    u = F.col("url") if url is None else url
    host = F.regexp_replace(
        F.lower(F.try_parse_url(u, F.lit("HOST"))), "^www\\.", ""
    )
    path = F.regexp_replace(F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")), "/$", "")
    q = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    qs = F.array_join(kept, "&")
    # fallback tests the POST-lower/strip host — the same predicate the
    # DuckDB twin applies (a host of exactly 'www.' strips to '' and must
    # fall back too, or the engines' canonical keys diverge)
    return F.when(host.isNull() | (host == ""), u).otherwise(
        F.concat(
            F.lit("https://"), host, path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        )
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """One surviving page per canonical URL: (canonical_url, rep id =
    min id, n_dups).  One map-side-combined hash shuffle keyed on the
    canonical URL — O(distinct URLs) rows move, and a URL crawled 10^6
    times collapses in the partial agg, so crawl-frequency skew
    self-mitigates exactly like segment dedup."""
    return (
        df.withColumn("canonical_url", canonical_url_col(F.col(url_col)))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
