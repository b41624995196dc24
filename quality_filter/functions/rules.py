"""Native Column expressions for the heuristic feature block.

Spark re-expression of the frozen spec in quality_filter/features.py —
every formula here must stay in lockstep with its Python twin (goldens +
the F1 harness pin them together).  All expressions are JVM-side
(whole-stage-codegen or higher-order functions); NO Python UDFs in this
module — this is the "cheap native tier" that runs before any model
stage (the decimation-before-expensive-op lesson,
/root/reference/opennsfw2/_inference.py:205).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from quality_filter.config import RuleConfig
from quality_filter.features import (
    LENGTH_NORM_CAP,
    PPL_NORM_CAP,
    PPL_NORM_SCALE,
    SYMBOL_PATTERN,
    TOKEN_SEP_PATTERN,
    tox_pattern,
)


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def tokens_col(text: Column) -> Column:
    """Token array per the frozen spec (explicit separator class)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, TOKEN_SEP_PATTERN)
    )


def feature_columns(text: Column, cfg: RuleConfig) -> dict[str, Column]:
    """All heuristic features as named Columns over a single token array.

    Mirrors features.text_features exactly (see its docstring for the
    frozen definitions).
    """
    toks = tokens_col(text)
    n_chars = F.length(text).cast("double")
    n_words = F.size(toks).cast("double")
    stop_lit = F.array(*[F.lit(w) for w in cfg.stopwords])
    stop_n = F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, F.lower(t)))).cast("double")
    sym_n = F.regexp_count(text, F.lit(SYMBOL_PATTERN)).cast("double")
    distinct_n = F.size(F.array_distinct(F.transform(toks, F.lower))).cast("double")
    tok_len_sum = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double")
    safe_words = F.when(n_words > 0, n_words)
    safe_chars = F.when(n_chars > 0, n_chars)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "stopword_ratio": F.coalesce(stop_n / safe_words, F.lit(0.0)),
        "symbol_ratio": F.coalesce(sym_n / safe_chars, F.lit(0.0)),
        "distinct_ratio": F.coalesce(distinct_n / safe_words, F.lit(0.0)),
        "mean_word_len": F.coalesce(tok_len_sum / safe_words, F.lit(0.0)),
        "length_norm": F.least(n_chars, F.lit(LENGTH_NORM_CAP)) / F.lit(LENGTH_NORM_CAP),
    }


def ppl_norm_col(ppl: Column) -> Column:
    return F.least(ppl, F.lit(PPL_NORM_CAP)) / F.lit(PPL_NORM_SCALE)


def quality_score_col(feats: dict[str, Column], cfg: RuleConfig) -> Column:
    z = F.lit(float(cfg.quality_bias))
    for name, w in cfg.quality_weights.items():
        z = z + F.lit(float(w)) * feats[name]
    return sigmoid(z)


def tox_score_col(text: Column, n_words: Column, cfg: RuleConfig) -> Column:
    """Lexicon-density toxicity, fully native (regexp_count is codegen'd)."""
    pat = tox_pattern(cfg.tox_lexicon)
    matches = F.regexp_count(F.lower(text), F.lit(pat)).cast("double")
    density = F.coalesce(matches / F.when(n_words > 0, n_words), F.lit(0.0))
    return sigmoid(F.lit(float(cfg.tox_a)) * density + F.lit(float(cfg.tox_b)))


def scrub_pii_col(text: Column, cfg: RuleConfig) -> Column:
    """Chained regexp_replace in frozen rule order (email → phone → ip)."""
    out = text
    for rule in cfg.pii_rules:
        out = F.regexp_replace(out, rule.pattern, rule.replacement)
    return out


def hard_rule_reasons(feats: dict[str, Column], cfg: RuleConfig) -> list[tuple[str, Column]]:
    """(reason name, fail condition) for the native-tier rules, in the
    oracle's frozen order."""
    return [
        ("too_short", feats["n_chars"] < cfg.min_chars),
        ("too_long", feats["n_chars"] > cfg.max_chars),
        ("too_few_words", feats["n_words"] < cfg.min_words),
        ("low_stopword", feats["stopword_ratio"] < cfg.min_stopword_ratio),
        ("high_symbol", feats["symbol_ratio"] > cfg.max_symbol_ratio),
        ("low_distinct", feats["distinct_ratio"] < cfg.min_distinct_ratio),
        ("word_len", ~feats["mean_word_len"].between(cfg.min_mean_word_len, cfg.max_mean_word_len)),
    ]
