"""Distributed k-means refinement: twin bit-identity, invariance, objective."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from quality_filter.operators import similarity as S

from tests.test_spark_pipeline import spark  # session fixture  # noqa: F401

SF = "/root/testdata/sf0.01"
PQ = f"{SF}/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(PQ)


@pytest.fixture(scope="module")
def cents0(emb):
    return S.train_ivf_centroids(emb, "embedding", "vec_id", n_clusters=8, seed=7)


def test_refine_bitwise_matches_local_twin(emb, cents0):
    got = S.kmeans_refine(emb, "embedding", cents0, iters=3)
    want = S.kmeans_refine_local(PQ, "embedding", cents0, iters=3)
    # EXACT float equality: integer accumulations + one shared driver
    # update function — not approx, the whole point of the design
    assert got == want


def test_refine_partition_invariant(emb, cents0):
    a = S.kmeans_refine(emb, "embedding", cents0, iters=2)
    b = S.kmeans_refine(
        emb.repartition(11).sortWithinPartitions(F.col("vec_id").desc()),
        "embedding", cents0, iters=2,
    )
    assert a == b


def test_step_stats_match_twin_int_sums(emb, cents0):
    rows = S.kmeans_step_stats(emb, "embedding", cents0).collect()
    import pyarrow.parquet as pq

    X = np.array(
        pq.read_table(PQ, columns=["embedding"]).column("embedding").to_pylist(),
        dtype=np.float64,
    )
    Xi = S._normalized_micro(X, S.KMEANS_SCALE)
    assign = S._assign_rows(X, np.asarray(cents0, dtype=np.float64))
    for r in rows:
        members = Xi[assign == r["cluster"]]
        assert r["n"] == len(members)
        assert r["sum_micro"] == int(members[:, r["dim"]].sum())


def test_refinement_improves_quantization(emb, cents0):
    """Refinement exists because sample-trained centroids underfit: from
    a deliberately tiny init sample (32 rows), full-corpus Lloyd rounds
    must measurably raise the mean cosine to the assigned centroid; from
    the full-corpus-converged init (sf0.01 < the 4096 sample cap) they
    must leave it unchanged up to the 1e-6 integerization grid."""
    import pyarrow.parquet as pq

    X = np.array(
        pq.read_table(PQ, columns=["embedding"]).column("embedding").to_pylist(),
        dtype=np.float64,
    )
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    def objective(cents):
        C = np.asarray(cents, dtype=np.float64)
        return float((Xn @ C.T).max(axis=1).mean())

    tiny_init = S.train_ivf_centroids(
        emb, "embedding", "vec_id", n_clusters=8, seed=7, sample_rows=32
    )
    refined_tiny = S.kmeans_refine_local(PQ, "embedding", tiny_init, iters=5)
    assert objective(refined_tiny) > objective(tiny_init) + 1e-4

    refined_full = S.kmeans_refine_local(PQ, "embedding", cents0, iters=3)
    assert abs(objective(refined_full) - objective(cents0)) < 1e-6


def test_cluster_balanced_sample_quota_and_membership(spark):
    """Equal-quota cluster sampling: (a) every emitted rank is within
    the quota, (b) each cluster contributes exactly min(cluster_size,
    quota) rows, (c) members carry their true refined-centroid
    assignment (subset of kmeans_refined_clusters), and (d) the md5
    rank makes the pick deterministic: re-running yields the identical
    set."""
    import __spark_entry__ as E

    Q = E.CLUSTER_SAMPLE_QUOTA
    got = E.queries()["cluster_balanced_sample"](spark, SF).collect()
    assert got and all(1 <= r["rk"] <= Q for r in got)

    asg = {
        r["vec_id"]: r["cluster"]
        for r in E.queries()["kmeans_refined_clusters"](spark, SF).collect()
    }
    sizes = {}
    for c in asg.values():
        sizes[c] = sizes.get(c, 0) + 1
    picked = {}
    for r in got:
        assert asg[r["vec_id"]] == r["cluster"]
        picked[r["cluster"]] = picked.get(r["cluster"], 0) + 1
    for c, n in sizes.items():
        assert picked.get(c, 0) == min(n, Q), (c, n, picked.get(c, 0))

    again = {
        (r["vec_id"], r["cluster"], r["rk"])
        for r in E.queries()["cluster_balanced_sample"](spark, SF).collect()
    }
    assert again == {(r["vec_id"], r["cluster"], r["rk"]) for r in got}
