"""ExactSubstr replication soak (r4 verdict item 5).

Adversarial duplication for `dedup.excise_duplicate_spans`
(arXiv:2107.06499 §4.1): replicate the sf0.1 documents R× with disjoint
ids ABOVE the originals.  Every replica span then duplicates the
original's (global order = (id, position), original id smaller), so:

  * the ORIGINAL docs' output rows must be EXACTLY the R=1 rows at
    every R (replicas can never steal a min-struct keeper);
  * every replica doc with >= span_len tokens must be FULLY excised
    (n_removed == n_tokens), and shorter replicas untouched;
  * wall must grow <= ~linearly in R: the window relation is O(tokens)
    (linear in R by construction), while a 10^9-hot span ships one row
    per map task through the min-struct partial agg (the segment_dedup
    skew lesson) — superlinear growth would mean the keeper join is
    blowing up on hot spans.

Run exclusively (no concurrent Spark).
Usage: PYTHONPATH=/root/repo python scripts/soak_exactsubstr.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quality_filter.operators import dedup  # noqa: E402
from quality_filter.operators.dedup import SPAN_WORDS  # noqa: E402
from quality_filter.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 1_000_000_000


def main() -> None:
    spark = get_spark(app_name="qf-soak-exactsubstr")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    docs.persist().count()

    base_rows = None
    walls = {}
    for r in (1, 2, 4):
        rep = docs
        for i in range(1, r):
            rep = rep.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET))
            )
        t0 = time.perf_counter()
        out = {
            row["doc_id"]: (row["n_tokens"], row["n_removed"], row["dedup_fp"])
            for row in dedup.excise_duplicate_spans(rep, "text", "doc_id").collect()
        }
        walls[r] = time.perf_counter() - t0
        orig = {k: v for k, v in out.items() if k < OFFSET}
        if r == 1:
            base_rows = orig
        assert orig == base_rows, f"original excision drifted at R={r}"
        # replicas with >= span_len tokens fully excised; shorter untouched
        for k, (n_tok, n_rm, _) in out.items():
            if k >= OFFSET:
                if n_tok >= SPAN_WORDS:
                    assert n_rm == n_tok, f"replica {k} not fully excised"
                else:
                    assert n_rm == 0, f"short replica {k} excised"
        print(
            f"R={r}  rows={r * docs.count():7d}  wall={walls[r]:6.2f}s  "
            f"orig rows exactly stable; replicas fully excised",
            flush=True,
        )
    assert walls[4] <= 6.0 * walls[1], (
        f"superlinear wall: {walls[1]:.2f}s -> {walls[4]:.2f}s at R=4"
    )
    print("OK: excised output exactly stable, wall <= ~linear in R")


if __name__ == "__main__":
    main()
