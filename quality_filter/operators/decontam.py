"""Benchmark decontamination — Bloom-filter candidate pass + exact verify.

The exact eval-leak guard broadcasts the benchmark's full n-gram STRING
set into the probe join.  At a 100-TB corpus × large benchmark suite
that broadcast is the bottleneck: gigabytes of strings shipped to every
executor and hashed per probe row.  This module is the
candidates+rescore pattern (proven in knn_join) applied to it:

1. Build a Bloom filter over the benchmark n-grams — DISTRIBUTED: each
   n-gram maps to k bit positions computed JVM-side (md5 → 60-bit int →
   mod m), positions are distinct-aggregated (bounded by m, never by
   benchmark size) and only the BIT ARRAY (m/8 bytes — 3 orders of
   magnitude smaller than the string set) reaches the driver/executors.
2. Probe: corpus shingles compute the same k positions JVM-side; one
   vectorized Arrow kernel tests all k bits per shingle against the
   broadcast bit array (numpy gather — no per-row Python hashing).
3. Exact verify: only maybe-member (doc, ngram) survivor rows join the
   true benchmark set, so the expensive exact comparison runs on the
   fpr-bounded candidate volume.  The verify join is deliberately NOT
   broadcast-hinted: candidates are rare, so AQE picks the cheap side,
   and the full-string broadcast the Bloom pass exists to avoid never
   happens.

No false negatives (Bloom guarantee) → post-verify output is
BIT-IDENTICAL to the exact form; false positives only cost verify-join
rows.  The md5 position rule is engine-portable (the repo's md5-universe
trick), so a DuckDB oracle can replay the construction exactly.

Reference parity: the score→threshold→gate shape of
/root/reference/opennsfw2/_inference.py:100-119 (candidate score, exact
decision), re-expressed for set membership at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BLOOM_BITS = 1 << 20
DEFAULT_BLOOM_HASHES = 5


def bloom_positions(col: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """The k bit positions of a string value by Kirsch–Mitzenmacher
    double hashing: position_i = (h1 + i·h2) mod n_bits from TWO md5
    evaluations (halves + amortizes the per-probe hash cost vs k
    independent md5s; same asymptotic fpr).  Each h is 15 hex chars =
    60 bits, so h1 + (k-1)·h2 stays inside a signed 64-bit long for
    k ≤ 8 — exact in every engine (the simhash_md5 hex-prefix trick)."""
    assert n_hashes <= 8, "h1 + (k-1)*h2 must fit a signed 64-bit long"

    def h(salt: str) -> Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10
        ).cast("long")

    h1, h2 = h("a|"), h("b|")
    return [((h1 + F.lit(i) * h2) % n_bits).alias(f"bp{i}") for i in range(n_hashes)]


def build_bloom(
    df: DataFrame, col: str, n_bits: int = DEFAULT_BLOOM_BITS,
    n_hashes: int = DEFAULT_BLOOM_HASHES,
) -> np.ndarray:
    """Bloom bit array (packed uint8, little bit-order within a byte)
    over df[col]'s values.  The only driver transfer is the DISTINCT
    position list — ≤ n_bits longs regardless of input cardinality, and
    the positions are computed + deduplicated executor-side."""
    pos = (
        df.select(F.explode(F.array(*bloom_positions(F.col(col), n_bits, n_hashes))).alias("p"))
        .distinct()
        .collect()
    )
    bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)
    idx = np.array([r["p"] for r in pos], dtype=np.int64)
    np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    return bits


def bloom_maybe_member(
    bits: np.ndarray, n_bits: int, n_hashes: int, col: Column
) -> Column:
    """Vectorized membership probe: k JVM-side positions → ONE Arrow
    crossing doing a numpy bit gather per position column.  True iff
    every bit is set (maybe-member); False is a Bloom-certain miss."""
    frozen = bits  # closure broadcast: ~n_bits/8 bytes per executor

    @F.pandas_udf("boolean")
    def kernel(*pos: pd.Series) -> pd.Series:
        acc = np.ones(len(pos[0]), dtype=bool)
        for p in pos:
            v = p.to_numpy(dtype=np.int64)
            acc &= (frozen[v >> 3] >> (v & 7) & 1).astype(bool)
        return pd.Series(acc)

    return kernel(*bloom_positions(col, n_bits, n_hashes))


def decontaminate_bloom(
    docs: DataFrame, ngrams: Column, id_col: str, bench: DataFrame,
    n_bits: int = DEFAULT_BLOOM_BITS, n_hashes: int = DEFAULT_BLOOM_HASHES,
) -> DataFrame:
    """(id, n_hits, contaminated) for every doc — bit-identical to the
    exact broadcast-join form, computed as Bloom candidates + exact
    verify.  ``bench`` must have one distinct n-gram per row in column
    ``ng``; ``ngrams`` is the per-doc distinct shingle array column."""
    bits = build_bloom(bench, "ng", n_bits, n_hashes)
    probe = docs.select(F.col(id_col), F.explode(ngrams).alias("ng")).filter(
        bloom_maybe_member(bits, n_bits, n_hashes, F.col("ng"))
    )
    hits = probe.join(bench, "ng").groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
    )
