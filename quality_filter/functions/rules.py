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
    PY_STRIP_PATTERN,
    PY_WHITESPACE_CHARS,
    SYMBOL_PATTERN,
    TOKEN_SEP_PATTERN,
    tox_pattern,
)


_NONSPACE_WS = [c for c in PY_WHITESPACE_CHARS if c != " "]


def strip_col(text: Column) -> Column:
    """Exact analog of Python's str.strip(): removes the frozen
    PY_WHITESPACE_CHARS class from both ends.  Spark's trim() strips
    ASCII spaces only — using it leaves phantom empty edge tokens after
    split() on text with leading/trailing tabs/newlines/nbsp, diverging
    from the oracle's tokenize() (features.py).

    Fast path: trim() handles the space-only case, then the full
    strip regex runs only when a non-space whitespace char survives at
    either end (rare — extraction whitespace-collapses its output; only
    raw `text` passthrough rows can hit it).  The unconditional regex is
    ~9x slower at 1M rows: its trailing `[ws]+$` branch back-tracks at
    every interior space."""
    s1 = F.trim(text)
    first = F.substring(s1, 1, 1)
    last = F.substring(s1, -1, 1)
    edge_ws = first.isin(*_NONSPACE_WS) | last.isin(*_NONSPACE_WS)
    return F.when(
        edge_ws, F.regexp_replace(s1, PY_STRIP_PATTERN, F.lit(""))
    ).otherwise(s1)


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def tokens_col(text: Column) -> Column:
    """Token array per the frozen spec (explicit separator class)."""
    trimmed = strip_col(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, TOKEN_SEP_PATTERN)
    )


def tokens_lower_col(text: Column) -> Column:
    """Lowercased token array — ``split(lower(trim(text)), SEP)``.

    Identical to ``transform(tokens_col(text), lower)``: lowercasing maps
    no char into or out of the (whitespace-only) separator class, so
    lower-then-split ≡ split-then-lower, and it needs one split instead of
    split + interpreted transform.  Stage this ONCE as an intermediate
    column and reference it from every consumer — referencing the
    expression inline makes each consumer recompute the split (measured
    ~1.4x on the whole feature block at 1M rows).
    """
    trimmed = strip_col(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(F.lower(trimmed), TOKEN_SEP_PATTERN)
    )


def feature_columns(
    text: Column, cfg: RuleConfig, toks_lower: Column | None = None
) -> dict[str, Column]:
    """All heuristic features as named Columns.

    Mirrors features.text_features exactly (see its docstring for the
    frozen definitions).  ``toks_lower`` should be a staged
    tokens_lower_col(text) column (see its docstring); if None it is
    inlined (correct but slower).

    Formulation notes (each measured at 1M rows, 32 cores):
      * stopword count: higher-order filter + ``isin`` (Catalyst turns the
        126-literal In into an O(1) InSet hash probe).  3x faster than a
        separator-bounded regex alternation, ~4x faster than
        array_contains against an array literal (O(|stopwords|) scan).
      * sum(len(token)) == length(regexp_replace(trimmed, SEP, "")) —
        tokens are exactly the non-separator chars, in order; no
        interpreted aggregate().
      * distinct lower tokens == array_distinct(toks_lower), no
        interpreted transform().
    """
    if toks_lower is None:
        toks_lower = tokens_lower_col(text)
    trimmed = strip_col(text)
    n_chars = F.length(text).cast("double")
    n_words = F.size(toks_lower).cast("double")
    sw = list(cfg.stopwords)
    stop_n = F.size(F.filter(toks_lower, lambda x: x.isin(*sw))).cast("double")
    sym_n = F.regexp_count(text, F.lit(SYMBOL_PATTERN)).cast("double")
    distinct_n = F.size(F.array_distinct(toks_lower)).cast("double")
    tok_len_sum = F.length(
        F.regexp_replace(trimmed, TOKEN_SEP_PATTERN, F.lit(""))
    ).cast("double")
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


def quality_contribs_col(feats: dict[str, Column], cfg: RuleConfig) -> Column:
    """MAP<STRING, DOUBLE> of per-term logit contributions (weight x
    feature, plus bias) — the Spark twin of features.quality_contribs;
    native column math, no Python crossing."""
    entries: list[Column] = []
    for name, w in cfg.quality_weights.items():
        entries += [F.lit(name), (F.lit(float(w)) * feats[name]).cast("double")]
    entries += [F.lit("bias"), F.lit(float(cfg.quality_bias)).cast("double")]
    return F.create_map(*entries)


def tox_score_col(text: Column, n_words: Column, cfg: RuleConfig) -> Column:
    """Lexicon-density toxicity, fully native (regexp_count is codegen'd)."""
    pat = tox_pattern(cfg.tox_lexicon)
    matches = F.regexp_count(F.lower(text), F.lit(pat)).cast("double")
    density = F.coalesce(matches / F.when(n_words > 0, n_words), F.lit(0.0))
    return sigmoid(F.lit(float(cfg.tox_a)) * density + F.lit(float(cfg.tox_b)))


def _guard_kind(pattern: str) -> str:
    """Guard class a pattern admits: '@' (must contain '@'), 'd' (must
    contain a decimal digit), or '' (no guard).

    Conservative on inference: a pattern containing any negated character
    class (``[^``) gets NO guard — the '@'/digit token might live inside
    the negation (e.g. ``[^\\d]``), where it is not a necessary condition.
    """
    if "[^" in pattern:
        return ""
    if "@" in pattern:
        return "@"
    if "\\d" in pattern or "[0-9]" in pattern:
        return "d"
    return ""


def _enabled_guard_kinds(rules) -> set[str]:
    """Guard kinds that are provably safe for this rule chain.

    The guard-on-ORIGINAL-text proof requires that no replacement in the
    chain can INTRODUCE a guard character (otherwise an earlier rule's
    output could newly satisfy a later rule's guard while the original
    text does not).  Enforced at expression-build time, not assumed:
    any replacement containing '@' disables '@' guards chain-wide; any
    replacement containing a decimal digit disables 'd' guards.  The
    frozen default replacements ('<EMAIL>', '<PHONE>', '<IP>') keep both.
    """
    enabled = {"@", "d"}
    for r in rules:
        if "@" in r.replacement:
            enabled.discard("@")
        if any(ch.isdigit() for ch in r.replacement):
            enabled.discard("d")
    return enabled


def _pii_guard(kind: str, text: Column) -> Column | None:
    """Cheap necessary-condition guard Column for a guard kind, or None.

    A pattern with a literal '@' can only match text containing '@'
    (memchr-fast contains); a pattern requiring a digit can only match
    text containing one.  Guards only ever SKIP a replace that would have
    been a no-op, so the output is identical — but most documents carry
    no PII, and skipping the full regex scan is ~3.5x on the scrub stage
    at 1M rows.
    """
    if kind == "@":
        return text.contains("@")
    if kind == "d":
        # \\p{Nd} = all Unicode decimal digits (what (?U)\\d matches) —
        # an ASCII-only [0-9] guard would skip texts whose only digits
        # are e.g. Arabic-Indic, breaking the necessary-condition proof
        return F.regexp_like(text, F.lit("\\p{Nd}"))
    return None


def scrub_pii_col(text: Column, cfg: RuleConfig) -> Column:
    """Chained regexp_replace in frozen rule order (email → phone → ip),
    with consecutive same-guard rules grouped under one conditional.

    Guard safety is VALIDATED, not assumed (see _guard_kind /
    _enabled_guard_kinds): negated classes and guard-introducing
    replacements both fall back to guard=None (unconditional replace —
    always correct, merely slower)."""
    enabled = _enabled_guard_kinds(cfg.pii_rules)
    out = text
    i, rules = 0, list(cfg.pii_rules)

    def kind_of(rule) -> str:
        k = _guard_kind(rule.pattern)
        return k if k in enabled else ""

    while i < len(rules):
        kind = kind_of(rules[i])
        guard = _pii_guard(kind, text)
        j = i
        chained = out
        while j < len(rules) and kind_of(rules[j]) == kind:
            chained = F.regexp_replace(chained, rules[j].pattern, rules[j].replacement)
            j += 1
        out = chained if guard is None else F.when(guard, chained).otherwise(out)
        i = j
    return out


def pii_replacement_pairs(text: Column, cfg: RuleConfig) -> Column:
    """Ordered array of (search, replacement-token) pairs for every
    distinct PII span in ``text``: struct(ri, nl, s, r) sorted by
    (rule order, -length(s), s) — LONGEST spans first within a rule so a
    span that is a strict substring of another (10.1.1.1 inside
    10.1.1.10) can never clobber the longer one's occurrence.  The
    token is ``<NAME:xxxxxxxx>`` with xxxxxxxx = md5(span)[:8] — the
    md5-universe determinism precedent, so the SAME span maps to the
    SAME token in every document of the corpus (and in the DuckDB
    twin)."""
    # factory, NOT default-arg lambdas: F.transform binds a 2nd lambda
    # param to the ARRAY INDEX (see CLAUDE.md invariant)
    def entry_fn(ri: int, name: str):
        def entry(m: Column) -> Column:
            return F.struct(
                F.lit(ri).alias("ri"),
                (-F.length(m)).alias("nl"),
                m.alias("s"),
                F.concat(
                    F.lit(f"<{name.upper()}:"),
                    F.substring(F.md5(m), 1, 8),
                    F.lit(">"),
                ).alias("r"),
            )

        return entry

    pairs = None
    for ri, rule in enumerate(cfg.pii_rules):
        ms = F.array_distinct(
            F.regexp_extract_all(text, F.lit(rule.pattern), F.lit(0))
        )
        e = F.transform(ms, entry_fn(ri, rule.name))
        pairs = e if pairs is None else F.concat(pairs, e)
    return F.array_sort(pairs)


def pseudonymize_pii_col(text: Column, cfg: RuleConfig) -> Column:
    """Join-preserving PII pseudonymization: every distinct PII span is
    replaced by a deterministic content-addressed token, so downstream
    analysis can still group/join on the entity (same email → same
    token corpus-wide) while the raw value never leaves the engine —
    the anonymization verb ``scrub_pii_col`` (which blanks to a fixed
    tag) cannot provide.

    Spans are identified on the RAW text (one extraction pass per rule
    — more principled than chained extraction, and replacement tokens
    are hex-in-angle-brackets that no rule's pattern can re-match),
    then applied as ONE left fold over the (rule, -len, span)-sorted
    pair array.  Zero-shuffle narrow map; per-row cost bounded by
    (spans per doc)·len(text)."""
    return F.aggregate(
        pii_replacement_pairs(text, cfg),
        text,
        lambda acc, p: F.replace(acc, p["s"], p["r"]),
    )


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
