"""Round-4 scale soak: segment dedup + incremental band-index probe.

Methodology mirrors BENCH/ROUND3.md's soak: one session, cached input,
replication factor R grows the corpus with EXACT duplicates — the
adversarial case for dedup (every segment/band of replica r>0 collides
with replica 0).  Invariants asserted, wall clocks reported:

1. segment_dedup at R in {1, 4, 16}: replicas share every segment, so
   the total number of KEPT segments must be constant in R (first
   occurrence only — all survivors come from the min-id replica); the
   min-struct partial agg should keep per-doc cost falling as fixed
   overhead amortizes, despite R× more occurrence rows.
2. incremental_near_dup_flags with a FIXED probe batch against an
   index grown R× in {1, 4, 16}: flagged-doc output must be identical
   at every R (extra replicas add band rows for keys the probe already
   hits), and probe wall should grow far sublinearly — the join
   shuffle is bounded by the batch's band rows, the index side is
   scan+prune.

Run exclusively (no concurrent Spark) — host drift poisons mixed runs.
Usage: PYTHONPATH=/root/repo python scripts/soak_round4.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quality_filter.operators import dedup  # noqa: E402
from quality_filter.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = (1, 4, 16)
OFFSET = 1_000_000_000


def replicate(docs, r):
    """R exact copies with disjoint doc_ids; replica 0 keeps the
    original ids so min-id survivors are replica-0 rows."""
    out = docs
    for i in range(1, r):
        out = out.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET))
        )
    return out


def main() -> int:
    spark = get_spark(app_name="qf-soak-r4")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    n_base = docs.count()

    print(f"\n## segment_dedup soak (base {n_base} docs)\n")
    print("| R | docs | sum(n_kept) | wall | us/doc |")
    print("|---|---|---|---|---|")
    kept_ref = None
    for r in REPS:
        rep = replicate(docs, r).cache()
        n = rep.count()  # materialize outside the timed window
        t0 = time.perf_counter()
        out = dedup.segment_dedup(rep, "text", "doc_id")
        kept = out.agg(F.sum("n_kept")).collect()[0][0]
        dt = time.perf_counter() - t0
        if kept_ref is None:
            kept_ref = kept
        assert kept == kept_ref, f"kept segments drifted: {kept} vs {kept_ref}"
        print(f"| {r} | {n:,} | {kept:,} | {dt:.1f}s | {dt / n * 1e6:.0f} |")
        rep.unpersist()

    print(f"\n## incremental_near_dup probe vs growing index (batch {n_base} docs)\n")
    batch_bands = dedup.lsh_bands(
        dedup.minhash_signature(docs, "text", "doc_id"), "doc_id"
    ).cache()
    batch_bands.count()
    print("| R | index band rows | flagged | wall |")
    print("|---|---|---|---|")
    flagged_ref = None
    for r in REPS:
        idx_docs = replicate(docs.withColumn("doc_id", F.col("doc_id") + F.lit(500_000_000)), r)
        idx_path = f"/tmp/qf_soak_idx_{r}"
        dedup.write_band_index(
            dedup.lsh_bands(
                dedup.minhash_signature(idx_docs, "text", "doc_id"), "doc_id"
            ),
            idx_path,
        )
        idx = dedup.read_band_index(spark, idx_path)
        n_idx = idx.count()
        t0 = time.perf_counter()
        flags = dedup.incremental_near_dup_flags(batch_bands, idx, "doc_id")
        flagged = flags.filter(F.col("hit_index")).count()
        dt = time.perf_counter() - t0
        if flagged_ref is None:
            flagged_ref = flagged
        assert flagged == flagged_ref, f"flags drifted: {flagged} vs {flagged_ref}"
        print(f"| {r} | {n_idx:,} | {flagged:,} | {dt:.1f}s |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
