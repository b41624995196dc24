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
