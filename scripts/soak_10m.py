"""End-of-round 10M-row soak: tiered pipeline + segment dedup.

Extends the round-2/3 10M pipeline soaks (BENCH/ROUND2.md §10M,
BENCH/ROUND3.md §10M) with the round-4 segment-dedup operator, per the
round-4 memory's round-5 punch list.  One session, cached parquet
input, exclusive run (no concurrent Spark), warmup pass before timing.

Corpus: bench.py's deterministic pages generator, 100k base rows
replicated row-parallel with rewritten urls (same recipe as bench.py's
ensure_pages) to 1M and 10M rows.  Replication makes every replica's
text an exact copy of a base row, so:
  * pipeline docs/sec should be FLAT 1M -> 10M (shuffle-free map plan
    scales with input splits);
  * the gate -> segment_dedup composition (dedup over the SCRUBBED
    text of kept docs — the realistic curation order, extraction and
    gating upstream of dedup) must keep an IDENTICAL kept-segment
    total at 1M and 10M (replicas contribute zero new segments —
    asserted; extraction is deterministic, so replica text is exact),
    and its wall should scale with the scan, not with the 10x
    duplicate explosion, because the min-struct partial agg collapses
    repeats map-side.

Usage: PYTHONPATH=/root/repo python scripts/soak_10m.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BASE = 100_000
PAGES_PARTITIONS = 64
SCALES = (10, 100)  # replicate factors -> 1M, 10M rows


def ensure_pages(spark, replicate: int) -> str:
    from pyspark.sql import functions as F

    from quality_filter.corpus import generate_pages, pages_spark_schema

    path = f"/tmp/qf_bench_pages_{N_BASE}x{replicate}_p{PAGES_PARTITIONS}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pdf = generate_pages(N_BASE, seed=2026).drop(columns=["cls"])
        sdf = spark.createDataFrame(pdf, schema=pages_spark_schema())
        if replicate > 1:
            reps = F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("_rep")
            sdf = (
                sdf.select("*", reps)
                .withColumn("url", F.concat("url", F.lit("#r"), F.col("_rep")))
                .drop("_rep")
            )
        sdf.repartition(PAGES_PARTITIONS).write.mode("overwrite").parquet(path)
    return path


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    from pyspark.sql import functions as F

    from quality_filter.operators import dedup
    from quality_filter.pipeline import tiered_scored
    from quality_filter.session import get_spark

    spark = get_spark(app_name="qf-soak-10m")

    print("| rows | pipeline wall | docs/sec | gate->segdedup wall | kept segs |")
    print("|---|---|---|---|---|")
    kept_ref = None
    for rep in SCALES:
        pages = spark.read.parquet(ensure_pages(spark, rep))
        n = N_BASE * rep
        force(tiered_scored(pages))  # warmup: workers + artifacts + codegen
        t0 = time.perf_counter()
        force(tiered_scored(pages))
        pipe = time.perf_counter() - t0

        gated = (
            tiered_scored(pages)
            .filter(F.col("status") == "keep")
            .select("url", "scrubbed_text")
        )
        t0 = time.perf_counter()
        kept = (
            dedup.segment_dedup(gated, "scrubbed_text", "url")
            .agg(F.sum("n_kept"))
            .collect()[0][0]
        )
        seg = time.perf_counter() - t0
        if kept_ref is None:
            kept_ref = kept
        assert kept == kept_ref, f"kept segments drifted: {kept} vs {kept_ref}"
        print(
            f"| {n:,} | {pipe:.1f}s | {n / pipe:,.0f} | {seg:.1f}s | {kept:,} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
