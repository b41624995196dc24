"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random-hyperplane) variant as the scale path: at 10^12 rows the
brute-force scan is a full-corpus map (fine for one query, embarrassingly
parallel), while the LSH variant turns repeated queries into a bucket
lookup — the buckets are the partition keys.

All math uses native higher-order functions (zip_with/aggregate), JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(
    df: DataFrame, vec_col: str, id_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    The query vector is a literal array folded into the plan (broadcast by
    value); the scan is a single narrow map + a k-row ORDER BY (Spark
    executes as TakeOrderedAndProject — no full sort materialization).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_lsh_buckets(
    df: DataFrame, vec_col: str, id_col: str, planes: list[list[float]]
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string over the planes.
    Deterministic given the plane list (caller derives planes from a seed).
    At scale: repartition by bucket → queries probe one bucket."""
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return df.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def knn_lsh(
    df: DataFrame, vec_col: str, id_col: str, query_vec: list[float],
    planes: list[list[float]], k: int = 10,
) -> DataFrame:
    """ANN: restrict the exact scan to the query's LSH bucket.
    Recall < 1.0 by construction; the scale path for repeated queries."""
    bucketed = hyperplane_lsh_buckets(df, vec_col, id_col, planes)
    import math

    qbits = "".join(
        "1" if sum(a * b for a, b in zip(p, query_vec)) >= 0 else "0" for p in planes
    )
    candidates = df.join(
        bucketed.filter(F.col("bucket") == qbits).select(id_col), id_col
    )
    return knn_bruteforce(candidates, vec_col, id_col, query_vec, k)


def make_planes(dim: int, n_planes: int, seed: int = 1234) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG state dependence)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()
