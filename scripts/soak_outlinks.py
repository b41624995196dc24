"""Outlink-tier scale soak: href extraction → host edges → PageRank.

Methodology mirrors soak_round4.py: one session, cached input,
replication factor R grows the crawl with NEW pages (offset doc_ids →
fresh md5 link targets), i.e. a genuinely R×-larger crawl rather than
exact duplicates — the steady-state shape for link-graph building.

Invariants asserted, wall clocks reported:
1. The host universe and edge-relation size stay DIMENSION-bounded
   (≤ OL_HOSTS nodes, ≤ OL_HOSTS² weighted edges) at every R — the
   whole corpus collapses in the map-side partial agg, so the shuffle
   never grows with the crawl.
2. Total edge weight grows exactly linearly in the page count
   (2 absolute links per page, minus self-loops — which are
   id-dependent, so computed per level from the output itself).
3. Per-page wall cost of edges+pagerank should stay ~flat as R grows
   (narrow extraction scales with input splits; the iterative part
   runs on the collapsed dimension only).

Run exclusively (no concurrent Spark) — host drift poisons mixed runs.
Usage: PYTHONPATH=/root/repo python scripts/soak_outlinks.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quality_filter.operators import graph, links  # noqa: E402
from quality_filter.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = (1, 4, 16)
OFFSET = 1_000_000_000


def main() -> int:
    from __spark_entry__ import OL_HOSTS, _ol_pages

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="qf-soak-outlinks")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text").cache()
    n0 = docs.count()
    print(f"base docs: {n0}")
    ok = True
    for r in REPS:
        rep = docs
        for i in range(1, r):
            rep = rep.union(
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET))
            )
        rep = rep.cache()
        n = rep.count()
        t0 = time.perf_counter()
        edges = links.host_edges(_ol_pages(rep)).cache()
        ne = edges.count()
        t_edges = time.perf_counter() - t0
        tot_w = edges.agg(F.sum("w")).first()[0]
        nodes = (
            edges.select(F.col("src").alias("h"))
            .union(edges.select(F.col("dst").alias("h")))
            .distinct()
            .count()
        )
        t0 = time.perf_counter()
        pr = graph.pagerank(edges, iters=3)
        npr = pr.count()
        t_pr = time.perf_counter() - t0
        per_page_us = (t_edges + t_pr) / n * 1e6
        print(
            f"R={r:2d} pages={n:6d} edges={ne:4d} nodes={nodes} "
            f"tot_w={tot_w} edges_wall={t_edges:6.2f}s pr_wall={t_pr:6.2f}s "
            f"per_page={per_page_us:7.1f}us"
        )
        if nodes > OL_HOSTS or ne > OL_HOSTS * OL_HOSTS:
            print("FAIL: edge relation not dimension-bounded")
            ok = False
        # every page emits exactly 2 non-relative link instances; self
        # loops (target == own host) are dropped, so tot_w ≤ 2n and the
        # drop fraction must stay small (md5-uniform: ~2/OL_HOSTS)
        if not (2 * n * 0.9 <= tot_w <= 2 * n):
            print(f"FAIL: total edge weight {tot_w} not ~2x pages {n}")
            ok = False
        edges.unpersist()
        rep.unpersist()
    spark.stop()
    print("soak:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
