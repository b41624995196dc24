"""Deterministic, engine-portable sampling operators.

A training-data pipeline needs samples that are (a) reproducible across
reruns, task retries, and parallelism levels, and (b) content-addressed
— NOT `df.sample()` (seeded per-partition RNG: the sample changes when
the partitioning does) and NOT `LIMIT` (reads whichever partitions come
first).  Hash sampling keys each row's fate to md5 of its id: the same
row is in or out forever, on any engine — DuckDB computes the identical
sample, so these are fully oracle-checkable.

Scale shape: a narrow map + filter, no shuffle; the sample decision is
pushed into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32  # first 8 md5 hex digits, uniform on [0, 2^32)


def hash_bucket(id_col: Column) -> Column:
    """Uniform [0, 2^32) bucket from md5 of the stringified id —
    `conv(substr(md5(id), 1, 8), 16, 10)` — byte-identical in DuckDB as
    `('0x' || substr(md5(id), 1, 8))::BIGINT` (same trick as the
    minhash/simhash portable hash universes)."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")


def hash_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep each row iff hash_bucket(id) < rate * 2^32: a deterministic
    ~rate sample, invariant under repartition/sort/retry."""
    return df.filter(hash_bucket(F.col(id_col)) < int(rate * _HASH_SPACE))


def stratified_hash_sample(
    df: DataFrame, id_col: str, stratum_col: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling (e.g. language rebalancing: downsample
    English, keep all of everything else).  Same row-fate determinism;
    the per-stratum threshold is a CASE over the stratum column, so the
    plan stays a single narrow filter — no shuffle, no per-group pass."""
    thr: Column = F.lit(int(default_rate * _HASH_SPACE))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, int(rate * _HASH_SPACE)).otherwise(thr)
    return df.filter(hash_bucket(F.col(id_col)) < thr)
