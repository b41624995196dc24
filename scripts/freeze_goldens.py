"""Freeze golden expected outputs (run once; commit the JSON).

The analog of opennsfw2's hardcoded expected probabilities
(/root/reference/tests/unit/test_core.py:46,58): golden inputs are
regenerated deterministically (generate_pages, fixed seed), expected
outputs are produced by the oracle and committed.  Tests then assert the
oracle still reproduces them exactly AND the Spark pipeline matches.
"""

from __future__ import annotations

import json
import os

from quality_filter.corpus import generate_pages
from quality_filter.oracle import run_oracle

GOLDEN_SEED = 123
GOLDEN_ROWS = 40
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "expected.json")


def main() -> None:
    pages = generate_pages(GOLDEN_ROWS, seed=GOLDEN_SEED)
    res = run_oracle(pages.drop(columns=["cls"]))
    res["cls"] = pages["cls"].values
    records = json.loads(res.to_json(orient="records"))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(records, f, indent=1, ensure_ascii=False, sort_keys=True)
    print(f"wrote {len(records)} golden rows → {OUT}")
    print(res["status"].value_counts().to_dict())


if __name__ == "__main__":
    main()
