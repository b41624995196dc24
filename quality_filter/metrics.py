"""Corpus metrics & skew-safe host rollups.

The hot-host problem (north_rule): a handful of hosts dominate a
Common-Crawl slice, so a naive groupBy(url_host) puts one reducer behind
the rest.  The rollup here pre-aggregates on (host, salt) — deterministic
salt from xxhash64(url), never rand() — then finishes on host.  Both
phases are hash aggregates with map-side partial aggregation; the salt
bounds any single reducer key to ~1/n_salts of a hot host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quality_filter.io.pages import url_host


def salted_host_rollup(scored: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-host keep/drop metrics via two-phase salted aggregation.

    Output: url_host, n_docs, n_keep, keep_rate, avg_quality.
    """
    salted = scored.withColumn("_host", url_host()).withColumn(
        "_salt", F.pmod(F.xxhash64("url"), F.lit(n_salts))
    )
    partial = salted.groupBy("_host", "_salt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("status") == "keep", 1).otherwise(0)).alias("k"),
        F.sum(F.coalesce("quality_score", F.lit(0.0))).alias("q_sum"),
        F.sum(F.when(F.col("quality_score").isNotNull(), 1).otherwise(0)).alias("q_n"),
    )
    return (
        partial.groupBy("_host")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("k").alias("n_keep"),
            (F.sum("q_sum") / F.when(F.sum("q_n") > 0, F.sum("q_n"))).alias("avg_quality"),
        )
        .withColumn("keep_rate", F.col("n_keep") / F.col("n_docs"))
        .withColumnRenamed("_host", "url_host")
    )


def corpus_summary(scored: DataFrame) -> DataFrame:
    """One row per (status, lang_pred) with counts + mean scores — the
    rollup the judge of a filtering run reads first."""
    return (
        scored.rollup("status", "lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            F.round(F.avg("tox_score"), 6).alias("avg_tox"),
            F.round(F.avg("ppl"), 4).alias("avg_ppl"),
        )
    )
