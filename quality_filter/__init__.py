"""quality_filter — a PySpark-native web-corpus quality-filter engine.

Re-expresses the behavioral contract of bhky/opennsfw2 (score-then-threshold
classification, batched vectorized inference with broadcast model artifacts,
windowed aggregation over an ordered stream, golden-output exact-score
testing — see /root/reference/opennsfw2/_inference.py) as a document-level
pipeline over Common-Crawl-style `pages` tables:

    extract text from html  →  language-ID  →  LM perplexity  →
    Gopher/C4 heuristic rules  →  PII scrub  →  toxicity gate  →
    keep / drop / quarantine

Built from scratch on the public PySpark DataFrame API.  No code is ported
from the reference; file:line citations in docstrings are behavioral
contracts only.
"""

__version__ = "0.1.0"

from quality_filter.config import RuleConfig, load_config, DEFAULT_ARTIFACT_DIR

__all__ = ["RuleConfig", "load_config", "DEFAULT_ARTIFACT_DIR", "__version__"]
