"""Benchmark runner — prints ONE JSON line.

Headline: end-to-end quality-filter pipeline (filter_corpus, tiered) over a
deterministic synthetic pages corpus sized by SF, plus representative
operator queries from __spark_entry__ over the driver testdata tables.
Every timed query is forced with the noop sink (full computation, no
driver collect).

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  QF_BENCH_PAGES      (rows in the synthetic pages corpus; default 40000)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("QF_BENCH_PAGES", "40000"))
PAGES_CACHE = f"/tmp/qf_bench_pages_{N_PAGES}"

# operator queries timed from the registry (representative of each family)
BENCH_QUERIES = [
    "pricing_summary",        # scan + group agg
    "revenue_by_nation",      # broadcast joins
    "salted_user_stats",      # salted skew join
    "hourly_event_stats",     # event-time tumbling window
    "forward_fill_purchase",  # ordered window function
    "sessionized_counts",     # lag + cumulative windows
    "near_dup_pairs",         # minhash + LSH band join
    "simhash_docs",           # explode + 64-bit agg
    "knn_bruteforce",         # vector math, top-k
]


def ensure_pages(spark) -> str:
    """Deterministic pages corpus parquet, built once and cached (build
    time is NOT part of the measured pipeline)."""
    marker = os.path.join(PAGES_CACHE, "_SUCCESS")
    if not os.path.exists(marker):
        from quality_filter.corpus import generate_pages, pages_spark_schema

        pdf = generate_pages(N_PAGES, seed=2026).drop(columns=["cls"])
        sdf = spark.createDataFrame(pdf, schema=pages_spark_schema())
        sdf.repartition(CPUS * 2).write.mode("overwrite").parquet(PAGES_CACHE)
    return PAGES_CACHE


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(CPUS))
    from quality_filter.session import get_spark
    from quality_filter.pipeline import tiered_scored
    import __spark_entry__ as E

    spark = get_spark(cpus=CPUS, app_name="qf-bench")
    pages_path = ensure_pages(spark)

    timings: dict[str, float] = {}

    # headline: tiered pipeline end-to-end over the pages corpus —
    # one scan, one model pass, all three outputs (single job)
    pages = spark.read.parquet(pages_path)
    t0 = time.perf_counter()
    force(tiered_scored(pages))
    pipeline_sec = time.perf_counter() - t0
    timings["pipeline_filter_corpus"] = round(pipeline_sec, 3)

    qs = E.queries()
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        force(qs[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "e2e_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": round(N_PAGES / pipeline_sec, 1),
        "pages_rows": N_PAGES,
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
