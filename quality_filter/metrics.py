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


def sketch_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Approximate corpus statistics via Spark's built-in sketches — the
    100-TB answer when exact distinct/quantile costs a full shuffle:

      * vocab_approx:    HyperLogLog++ distinct token count
                         (`approx_count_distinct`, rsd 0.01) — mergeable
                         partial sketches, no term shuffle at all;
      * len_p50/p90/p99: Greenwald-Khanna `percentile_approx` over doc
                         lengths (accuracy 1/10000) — one pass, bounded
                         memory, vs the exact sort-based `percentile`.

    Accuracy is pinned against the exact computations by
    tests/test_sampling_and_textagg.py (rsd-bounded), not by the DuckDB
    oracle — the sketches are engine-specific by nature and are the one
    deliberate approximate surface in the engine."""
    vocab = docs.select(
        F.explode(F.split(F.lower(F.trim(text_col)), "[ ]+")).alias("term")
    ).agg(F.approx_count_distinct("term", rsd=0.01).alias("vocab_approx"))
    lens = docs.agg(
        F.percentile_approx(F.length(text_col), 0.5, 10000).alias("len_p50"),
        F.percentile_approx(F.length(text_col), 0.9, 10000).alias("len_p90"),
        F.percentile_approx(F.length(text_col), 0.99, 10000).alias("len_p99"),
    )
    return vocab.crossJoin(lens)  # two 1-row aggregates
