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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    df: DataFrame, vec_col: str, n_clusters: int = 8,
    iters: int = 10, seed: int = 7, sample_rows: int = 4096,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means on a bounded driver-side sample.

    The centroid table is a MODEL ARTIFACT, not a query-time computation:
    at corpus scale it is trained once on a sample (this routine), shipped
    like langid.npz, and the assignment below is the distributed part.
    Sample bounded by ``sample_rows`` so driver memory is constant.
    """
    import numpy as np

    rows = df.select(vec_col).limit(sample_rows).collect()
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = (X @ cent.T).argmax(axis=1)  # cosine on normalized rows
        for c in range(n_clusters):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent.tolist()


def ivf_assign(df: DataFrame, vec_col: str, id_col: str, centroids: list[list[float]]) -> DataFrame:
    """(id, cluster): nearest-centroid assignment, all native expressions.
    At scale the output is written bucketed/partitioned by cluster so a
    query probes one bucket (the inverted file)."""
    sims = [
        dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
        / (norm(F.col(vec_col)) + F.lit(1e-12))
        for c in centroids
    ]
    best = F.greatest(*sims)
    cluster = F.lit(-1)
    for i in reversed(range(len(sims))):
        cluster = F.when(sims[i] == best, F.lit(i)).otherwise(cluster)
    return df.select(F.col(id_col), cluster.cast("int").alias("cluster"))


def knn_ivf(
    df: DataFrame, vec_col: str, id_col: str, query_vec: list[float],
    centroids: list[list[float]], n_probe: int = 2, k: int = 10,
) -> DataFrame:
    """ANN via IVF: exact scan restricted to the ``n_probe`` clusters
    nearest to the query.  Recall grows with n_probe; n_probe = n_clusters
    degrades gracefully to the exact scan."""
    import numpy as np

    q = np.array(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    cent = np.array(centroids, dtype=np.float64)
    order = (cent @ q).argsort()[::-1][:n_probe].tolist()
    assigned = ivf_assign(df, vec_col, id_col, centroids)
    candidates = df.join(
        assigned.filter(F.col("cluster").isin(order)).select(id_col), id_col
    )
    return knn_bruteforce(candidates, vec_col, id_col, query_vec, k)
