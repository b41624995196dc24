"""Deterministic artifact builder.

Produces the three broadcast artifacts the pipeline ships to executors
via ``spark-submit --files`` (never downloaded at task time — the
anti-``_download.py`` per /root/reference/opennsfw2/_download.py:13-26 and
the Dockerfile pre-warm precedent /root/reference/Dockerfile:28-30):

  * ``langid.npz`` — hashed char-n-gram NB language identifier
  * ``lm.npz``     — char 5-gram LM counts (perplexity scorer)
  * ``rules.json`` — frozen RuleConfig (thresholds, stopwords, PII regexes)

Fully seeded; rebuilding always yields byte-identical models.
"""

from __future__ import annotations

import os

from quality_filter import corpus
from quality_filter.config import DEFAULT_ARTIFACT_DIR, RuleConfig
from quality_filter.models import langid as langid_mod
from quality_filter.models import lm as lm_mod


def build_all(artifact_dir: str | None = None, seed: int = 7) -> dict[str, str]:
    artifact_dir = artifact_dir or DEFAULT_ARTIFACT_DIR
    os.makedirs(artifact_dir, exist_ok=True)

    training = corpus.make_training_corpus(seed=seed)

    lid = langid_mod.train(training)
    lid_path = os.path.join(artifact_dir, "langid.npz")
    lid.save(lid_path)

    all_sentences = [s for lang in sorted(training) for s in training[lang]]
    lm = lm_mod.train(all_sentences)
    lm_path = os.path.join(artifact_dir, "lm.npz")
    lm.save(lm_path)

    stopwords = tuple(
        sorted({w for lang in corpus.STOPWORDS for w in corpus.STOPWORDS[lang]})
    )
    cfg = RuleConfig(stopwords=stopwords)
    rules_path = os.path.join(artifact_dir, "rules.json")
    cfg.save(rules_path)

    return {"langid": lid_path, "lm": lm_path, "rules": rules_path}


if __name__ == "__main__":
    import sys

    out = build_all(sys.argv[1] if len(sys.argv) > 1 else None)
    for k, v in out.items():
        print(f"{k}: {v}")
