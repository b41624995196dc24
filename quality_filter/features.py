"""Frozen feature + gating spec (pure-Python reference implementation).

This module *defines* the per-document semantics.  The Spark pipeline
(quality_filter/functions/rules.py) re-expresses the same formulas as
native Column expressions; goldens + the F1 harness pin the two together.
Every function here is a pure per-row function of (text, config, models) —
no cross-row state — so results are identical at any parallelism level.
"""

from __future__ import annotations

import math
import re
from typing import Iterable

# ---- frozen lexical definitions (shared strings, used verbatim in Spark) --

# token separator characters (explicit class: Java \s is ASCII-only while
# Python \s is Unicode — an explicit class keeps both engines identical)
TOKEN_SEP_CHARS = " \t\n\r\x0b\f\u00a0"
TOKEN_SEP_PATTERN = "[" + TOKEN_SEP_CHARS + "]+"

# the EXACT set of chars Python's str.strip() removes (str.isspace() is
# True), frozen as a literal so the Spark side can trim identically.
# Spark's trim() strips ASCII spaces only, which leaves phantom empty
# edge tokens after split() and diverges from tokenize() below on text
# with leading/trailing tabs/newlines/nbsp — reachable via the
# pre-populated `text` passthrough column, which extraction does NOT
# whitespace-normalize.
PY_WHITESPACE_CHARS = '\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000'
PY_STRIP_PATTERN = "^[" + PY_WHITESPACE_CHARS + "]+|[" + PY_WHITESPACE_CHARS + "]+$"


# symbol characters counted by the symbol-density rule
SYMBOL_PATTERN = r"[#%&*+<=>@^_|~$\\]"

# caps used by normalized features
LENGTH_NORM_CAP = 2000.0
# the hashed add-k LM saturates near ppl≈260 for fully-unseen text, so the
# normalization lives on that scale
PPL_NORM_CAP = 300.0
PPL_NORM_SCALE = 100.0

_token_sep_re = re.compile(TOKEN_SEP_PATTERN)
_symbol_re = re.compile(SYMBOL_PATTERN)


def sigmoid(x: float) -> float:
    if x >= 0:
        return 1.0 / (1.0 + math.exp(-x))
    e = math.exp(x)
    return e / (1.0 + e)


def tokenize(text: str) -> list[str]:
    return [t for t in _token_sep_re.split(text.strip())] if text.strip() else []


def text_features(text: str, stopwords: Iterable[str]) -> dict[str, float]:
    """The heuristic (Gopher/C4-style) feature block.  Frozen spec:

      n_chars         = len(text)
      tokens          = split on TOKEN_SEP_PATTERN after strip
      n_words         = len(tokens)
      stopword_ratio  = #(lower(token) in stopwords) / n_words   (0 if no tokens)
      symbol_ratio    = #(symbol chars) / n_chars                (0 if empty)
      distinct_ratio  = #distinct lower(token) / n_words         (0 if no tokens)
      mean_word_len   = sum(len(token)) / n_words                (0 if no tokens)
      length_norm     = min(n_chars, 2000) / 2000
    """
    sw = set(stopwords)
    n_chars = len(text)
    tokens = tokenize(text)
    n_words = len(tokens)
    lower = [t.lower() for t in tokens]
    stop_n = sum(1 for t in lower if t in sw)
    sym_n = len(_symbol_re.findall(text))
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "stopword_ratio": (stop_n / n_words) if n_words else 0.0,
        "symbol_ratio": (sym_n / n_chars) if n_chars else 0.0,
        "distinct_ratio": (len(set(lower)) / n_words) if n_words else 0.0,
        "mean_word_len": (sum(len(t) for t in tokens) / n_words) if n_words else 0.0,
        "length_norm": min(float(n_chars), LENGTH_NORM_CAP) / LENGTH_NORM_CAP,
    }


def ppl_norm(ppl: float) -> float:
    return min(ppl, PPL_NORM_CAP) / PPL_NORM_SCALE


def quality_score(feats: dict[str, float], weights: dict[str, float], bias: float) -> float:
    z = bias + sum(w * feats[name] for name, w in weights.items())
    return sigmoid(z)


def quality_contribs(
    feats: dict[str, float], weights: dict[str, float], bias: float
) -> dict[str, float]:
    """Per-term contribution to the quality logit: weight x feature, plus
    the bias — the NUMERIC attribution analog of Grad-CAM's per-region
    heat (/root/reference/opennsfw2/_inspection.py:103-122): it says HOW
    MUCH each input signal pushed the score, where ``reasons`` only says
    which gates failed.  Invariant: sigmoid(sum(values)) == quality_score."""
    out = {name: w * feats[name] for name, w in weights.items()}
    out["bias"] = bias
    return out


def py_pattern(pattern: str) -> str:
    """Strip the Java-only (?U) prefix for use with Python ``re``.

    Canonical patterns carry a leading ``(?U)`` so Java regex uses
    Unicode \\d and \\b (UNICODE_CHARACTER_CLASS).  Python's re rejects
    the flag — and doesn't need it: str patterns are Unicode-classed by
    default, which is exactly what (?U) turns on for Java.  One stored
    pattern, two engine spellings, same language matched."""
    return pattern[4:] if pattern.startswith("(?U)") else pattern


def tox_pattern(lexicon: Iterable[str]) -> str:
    """Word-bounded alternation over the lexicon; applied to lower(text).

    (?U) makes Java's \\b use Unicode word chars like Python's — without
    it Java sees a word boundary between a lexicon word and an adjacent
    accented letter (e.g. 'frakkü') where Python does not."""
    return r"(?U)\b(" + "|".join(sorted(lexicon)) + r")\b"


def tox_score(text: str, lexicon: Iterable[str], n_words: float, a: float, b: float) -> float:
    """sigmoid(a * matches/n_words + b) — the calibrated-sigmoid-vs-fixed-
    threshold gate pattern (/root/reference/opennsfw2/_inference.py:224)."""
    if not n_words:
        return sigmoid(b)
    matches = len(re.findall(py_pattern(tox_pattern(lexicon)), text.lower()))
    return sigmoid(a * (matches / n_words) + b)


def scrub_pii(text: str, pii_rules) -> str:
    """Chained substitution in frozen rule order (email → phone → ip)."""
    out = text
    for rule in pii_rules:
        out = re.sub(py_pattern(rule.pattern), rule.replacement, out)
    return out
