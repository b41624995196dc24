"""Adversarial-duplication soak for tfidf_cosine_pairs.

Exact-duplicate replication is the worst case for any pair-emitting
dedup operator: R replicas of one doc produce O(R²) legitimate pairs.
The df hot-term cap is the bound — once replication pushes a term's
document frequency above max_df the term leaves BOTH the join and the
norms, so sufficiently hot boilerplate stops generating candidate work
entirely.  This soak replicates the sf0.01 documents R× with disjoint
doc_ids and records pair count and wall:

expected shape:
  * R small: pairs grow ~R² within duplicate clusters (correct output,
    every replica pair IS a near-dup);
  * R ≥ max_df: shared vocabulary saturates the cap, vectors empty,
    pair count COLLAPSES and wall stays bounded — the 100-TB behavior
    (a boilerplate phrase in 10^9 docs never reaches the join).

Run exclusively (no concurrent Spark jobs); one session, cached input.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from quality_filter.operators import dedup
from quality_filter.session import get_spark

SF_DIR = os.environ.get("QF_SF_DIR", "/root/testdata/sf0.01")


def main():
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="qf-soak-tfidf-cos")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n = base.count()
    print(f"base docs: {n}")
    for R in (1, 4, 16, 64):
        reps = spark.range(R).select(F.col("id").alias("_r"))
        corpus = (
            base.crossJoin(F.broadcast(reps))
            .select((F.col("doc_id") + F.col("_r") * 1_000_000).alias("doc_id"), "text")
            .repartition(32)
            .cache()
        )
        corpus.count()
        t0 = time.time()
        out = dedup.tfidf_cosine_pairs(corpus, "text", "doc_id", min_cos=0.5)
        pairs = out.count()
        w = time.time() - t0
        print(f"R={R:3d} docs={n*R:7d} pairs={pairs:9d} wall={w:6.1f}s "
              f"us_per_doc={w/(n*R)*1e6:8.1f}")
        corpus.unpersist()


if __name__ == "__main__":
    main()
