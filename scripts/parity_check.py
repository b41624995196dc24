"""Large-corpus Spark-vs-oracle parity check on fresh seeds.

Heavier than the pytest parity suite (25k rows per seed, both pipeline
variants); run before releases / after touching any Spark formulation.

Contract surfaces checked (see pipeline.py docstring for the tiered
NULL-masking semantics — dropped rows expose no scrubbed_text):
  * keep/status labels: exact on every row (tiered)
  * scrubbed_text: byte-identical on kept rows (tiered) and on all
    non-quarantined rows (score_documents)

Usage: python scripts/parity_check.py [seed ...]   (defaults: 2 seeds)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(os.environ.get("QF_PARITY_ROWS", "25000"))


def main() -> None:
    from quality_filter.corpus import generate_pages, pages_spark_schema
    from quality_filter.oracle import run_oracle
    from quality_filter.pipeline import score_documents, tiered_scored
    from quality_filter.session import get_spark

    seeds = [int(a) for a in sys.argv[1:]] or [31337, 99991]
    spark = get_spark(app_name="qf-parity")
    failed = False
    for seed in seeds:
        pages = generate_pages(N_ROWS, seed=seed).drop(columns=["cls"])
        sdf = spark.createDataFrame(pages, schema=pages_spark_schema())
        want = run_oracle(pages).sort_values("url").reset_index(drop=True)

        got = (
            tiered_scored(sdf)
            .select("url", "keep", "status", "scrubbed_text")
            .toPandas().sort_values("url").reset_index(drop=True)
        )
        keep_eq = bool((got["keep"].values == want["keep"].values).all())
        stat_eq = bool((got["status"].values == want["status"].values).all())
        k = got["keep"].values
        kept_text = bool(
            (got["scrubbed_text"][k].fillna("\0") == want["scrubbed_text"][k].fillna("\0")).all()
        )

        full = (
            score_documents(sdf)
            .select("url", "status", "scrubbed_text")
            .toPandas().sort_values("url").reset_index(drop=True)
        )
        nq = full["status"].values != "quarantine"
        full_text = bool(
            (full["scrubbed_text"][nq].fillna("\0") == want["scrubbed_text"][nq].fillna("\0")).all()
        )

        ok = keep_eq and stat_eq and kept_text and full_text
        failed |= not ok
        print(
            f"seed {seed}: rows={N_ROWS} keep={keep_eq} status={stat_eq} "
            f"kept_text={kept_text} full_text={full_text} -> {'OK' if ok else 'FAIL'}"
        )
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
