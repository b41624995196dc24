"""Relational operators the harness checks (SURVEY §2.10): broadcast join,
salted skew join, rollup, set ops.  The salted join is the north_rule's
hot-url-host treatment: deterministic salt = pmod(xxhash64(unique_col), S),
never rand() (reproducibility across retries and parallelism levels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Explicit broadcast of the small side — no shuffle of the big side."""
    return big.join(F.broadcast(small), on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: replicate the small side n_salts times,
    salt the big side deterministically from a unique column, join on
    (key, salt).  Result is row-identical to the plain join; the shuffle
    spreads each hot key over n_salts reducers.

    Use when the small side is too big to broadcast and the key is skewed
    (the hot-host case at Common-Crawl scale).
    """
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src_col)), F.lit(n_salts)).cast("int")
    )
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


def rollup_counts(df: DataFrame, dims: list[str], value: str) -> DataFrame:
    return (
        df.rollup(*dims)
        .agg(F.count(F.lit(1)).alias("n_rows"), F.round(F.sum(value), 4).alias("sum_value"))
    )


def anti_join_keys(left: DataFrame, right: DataFrame, on: str) -> DataFrame:
    """Keys in left with no match in right (NOT EXISTS)."""
    return left.join(right, on, "left_anti")


def apportion_budget(
    df: DataFrame, key_col: str, weight_col: str, total: int
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of an integer budget
    over weighted keys — the crawl scheduler's 'give each host a fetch
    quota ∝ reputation' step, and the curation scheduler's 'token
    budget per source' step.  Exact integers end to end:

        base_i   = (total · w_i) div ΣW
        leftover = total - Σ base_i           (< #keys with w > 0)
        quota_i  = base_i + 1 for the `leftover` largest remainders
                   ((total · w_i) mod ΣW, ties by key ascending)

    Σ quota == total EXACTLY (conservation is a theorem of the method,
    asserted in tests) — floor-share-only allocation under-spends, and
    float shares drift.  ΣW = 0 (or an empty relation) allocates 0
    everywhere by spec.  Negative weights are rejected (they break the
    remainder bound).

    Plan: the weight relation is O(keys) — a dimension (hosts/sources),
    never the corpus — so the two single-partition windows (ΣW/Σbase
    totals and the remainder ranking) are the pagerank-normalization
    precedent, not a scale hazard.  total · w must fit BIGINT: pre-scale
    weights (the trustrank tw ≤ 9.2e15 note) if total · max_w nears
    2^63."""
    from pyspark.sql import Window as W

    d = df.select(
        F.col(key_col).alias("_k"), F.col(weight_col).cast("long").alias("_w")
    )
    d = d.withColumn(
        "_w",
        F.when(F.col("_w") < 0, F.raise_error("apportion_budget: negative weight"))
        .otherwise(F.col("_w")),
    )
    # Guard the documented total·w BIGINT bound (was noted, not enforced):
    # past it the base/remainder arithmetic overflows — an opaque ANSI
    # ARITHMETIC_OVERFLOW here, a silent wrap with ansi.enabled=false.
    # With every w ≤ lim the products are safe; ΣW itself can still
    # overflow, but inputs are non-negative so a negative total proves a
    # wrap (the non-ANSI case) — abort with the remediation named.
    _w_lim = ((1 << 63) - 1) // max(1, int(total))
    d = d.withColumn(
        "_w",
        F.when(
            F.col("_w") > F.lit(_w_lim),
            F.raise_error(
                "apportion_budget: total*w exceeds BIGINT — pre-scale weights"
            ),
        ).otherwise(F.col("_w")),
    )
    d = d.withColumn("_tw", F.sum("_w").over(W.partitionBy()))
    d = d.withColumn(
        "_tw",
        F.when(
            F.col("_tw") < 0,
            F.raise_error("apportion_budget: BIGINT overflow in ΣW — pre-scale weights"),
        ).otherwise(F.col("_tw")),
    )
    d = d.select(
        "_k", "_w", "_tw",
        F.expr(f"CASE WHEN _tw = 0 THEN 0L ELSE ({total}L * _w) div _tw END")
        .alias("_base"),
        F.expr(f"CASE WHEN _tw = 0 THEN 0L ELSE ({total}L * _w) % _tw END")
        .alias("_rem"),
    )
    d = d.withColumn(
        "_leftover",
        F.when(F.col("_tw") == 0, F.lit(0).cast("long")).otherwise(
            F.lit(total).cast("long") - F.sum("_base").over(W.partitionBy())
        ),
    )
    rn = F.row_number().over(
        W.partitionBy().orderBy(F.col("_rem").desc(), F.col("_k").asc())
    )
    return d.withColumn("_rn", rn).select(
        F.col("_k").alias(key_col),
        F.col("_w").alias(weight_col),
        (
            F.col("_base")
            + F.when(F.col("_rn") <= F.col("_leftover"), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("quota"),
    )
