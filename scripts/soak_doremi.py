"""DoReMi replication soak (round 5).

Adversarial duplication for `textagg.doremi_mixture_weights`: replicate
the sf0.1 documents R× (same source labels, disjoint doc ids — ids are
irrelevant to the operator, which keys on source only).  Replication
multiplies every c12 / c1 / n_t by R while the bigram-TYPE relations
stay fixed, so:

  * the model dims are EXACTLY constant: bg/bgq row counts and B do not
    move at any R (the vocabulary-bounded-dimension claim, the KN soak
    invariant);
  * the per-source fact (source, w1, w2) row count is EXACTLY constant —
    replication only scales the n_t column, so the broadcast join and
    the per-source aggregation process the SAME number of rows at R=4
    as at R=1;
  * wall must be ~FLAT in R (the only growing stage is the token
    explode feeding two partial aggs — map-side work that scales with
    splits);
  * weights stay a probability vector (Σ = 1 ± rounding) and drift only
    mildly: p(w2|w1) = ((4·R·c12−3)·B + 3·nrc·nlc)/(4·R·c1·B) moves with
    R (the absolute discount 3/4 does not scale), so bits shift by
    O(1/R·c12) — assert the max per-source weight drift is small and
    monotonically shrinking, NOT exact invariance.

Run exclusively (no concurrent Spark).
Usage: PYTHONPATH=/root/repo python scripts/soak_doremi.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quality_filter.operators import textagg  # noqa: E402
from quality_filter.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="qf-soak-doremi")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("source", "text")
    docs.persist().count()

    # fixed dims reference: the bigram-type count at R=1
    bg1 = textagg._kn_model_dims(docs, "text")[4]

    weights = {}
    walls = {}
    for r in (1, 2, 4):
        rep = docs
        for _ in range(1, r):
            rep = rep.unionByName(docs)
        # warm + time best-of-2 (host drift discipline)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = textagg.doremi_mixture_weights(rep, "text", "source").collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        walls[r] = best
        weights[r] = {row["source"]: row["weight"] for row in rows}
        br = textagg._kn_model_dims(rep, "text")[4]
        assert br == bg1, f"B moved under replication: {bg1} -> {br} at R={r}"
        s = sum(weights[r].values())
        assert abs(s - 1.0) < 1e-4, f"weights not normalized at R={r}: {s}"
        print(f"R={r}: wall={walls[r]:.2f}s  B={br}  sum_w={s:.6f}")

    drift2 = max(abs(weights[2][s] - weights[1][s]) for s in weights[1])
    drift4 = max(abs(weights[4][s] - weights[2][s]) for s in weights[2])
    print(f"max weight drift R1->R2 {drift2:.2e}, R2->R4 {drift4:.2e}")
    assert drift2 < 1e-3 and drift4 <= drift2 + 1e-12, (
        "weight drift must be small and shrinking (discount effect is O(1/R))"
    )
    assert walls[4] < walls[1] * 2.5, (
        f"wall not ~flat under replication: {walls}"
    )
    print("SOAK PASS:", {k: round(v, 2) for k, v in walls.items()})
    spark.stop()


if __name__ == "__main__":
    main()
