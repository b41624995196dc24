"""Text-analysis functions over the ``documents`` table — all native
Column expressions so each one carries a DuckDB oracle (SURVEY §2.9).

token counting (whitespace + BPE-ish regex), language guess (stopword-hit
argmax — the SQL-expressible shadow of the real langid model), document
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from quality_filter.corpus import STOPWORDS

# BPE-ish token pattern: letter runs | single digits | single punctuation
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def tokens_simple(text: Column) -> Column:
    """Split on single-space runs (documents-table text is pre-normalized)."""
    return F.split(F.trim(text), "[ ]+")


def token_count_ws(text: Column) -> Column:
    return F.size(tokens_simple(text))


def token_count_bpe(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def stopword_hits(text: Column, lang: str) -> Column:
    # isin over a literal list becomes an InSet hash probe (O(1) per
    # token); array_contains against an array literal is an O(n) scan
    words = list(STOPWORDS[lang])
    return F.size(F.filter(tokens_simple(text), lambda t: F.lower(t).isin(*words)))


def lang_guess(text: Column) -> Column:
    """Heuristic language guess: argmax of per-language stopword hits,
    ties broken by language-code order, zero hits → 'und'.  (The cheap
    SQL shadow of the NB langid model — used for oracle-checkable tests
    and as a FAST-profile prefilter.)"""
    langs = sorted(STOPWORDS)
    hits = {lang: stopword_hits(text, lang) for lang in langs}
    best = F.greatest(*[hits[lang] for lang in langs])
    out = F.lit("und")
    # reverse order so earlier languages win ties via later when() wrapping
    expr = out
    for lang in reversed(langs):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


# Encoding-noise patterns shared with the DuckDB oracle VERBATIM: only
# \xNN hex escapes and explicit chars, which Java regex and RE2 read
# identically (the (?U) seam does not arise — no \d/\w/\b classes).
REPLACEMENT_CHAR = "�"
CTRL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"  # controls minus \t \n \r
NON_ASCII_PATTERN = r"[^\x00-\x7f]"


def encoding_noise_cols(text: Column) -> list[Column]:
    """Mojibake / encoding-damage signals (the CCNet-class filter that
    catches mis-decoded crawls before they poison an LM corpus):
    U+FFFD replacement-char count (a decoder already gave up), raw
    control-character count (binary bleed-through), and the non-ASCII
    character ratio (legitimate for non-Latin languages — a RATIO, not
    a gate, so downstream mixes it with the langid signal).  All
    codegen'd regexp_count narrow maps, zero shuffle."""
    n_repl = F.regexp_count(text, F.lit(REPLACEMENT_CHAR)).cast("long")
    n_ctrl = F.regexp_count(text, F.lit(CTRL_PATTERN)).cast("long")
    n_chars = F.length(text)
    ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        F.regexp_count(text, F.lit(NON_ASCII_PATTERN)).cast("double")
        / n_chars.cast("double")
    )
    return [
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_ctrl"),
        F.round(ratio, 6).alias("nonascii_ratio"),
        ((n_repl > 0) | (n_ctrl > 0)).alias("encoding_suspect"),
    ]


# The common UTF-8-bytes-read-as-latin1/cp1252 artifacts (the ftfy-core
# cases): each LEFT string is exactly what the right character's UTF-8
# bytes render as under a latin1/cp1252 mis-decode.  ORDER IS PART OF
# THE SPEC — both engines apply the chain top-to-bottom, so a repair
# that exposes a later pattern behaves identically everywhere.
# 3-byte sequences first (they contain 2-byte lookalikes as substrings).
MOJIBAKE_MAP: tuple[tuple[str, str], ...] = (
    ("â€™", "’"),  # â€™ → ’
    ("â€œ", "“"),  # â€œ → “
    ("â€“", "–"),  # â€“ → –
    ("â€”", "—"),  # â€” → —
    ("â€¦", "…"),  # â€¦ → …
    ("Ã¡", "á"),  # Ã¡ → á
    ("Ã©", "é"),  # Ã© → é
    ("Ã­", "í"),  # Ã­ → í
    ("Ã³", "ó"),  # Ã³ → ó
    ("Ãº", "ú"),  # Ãº → ú
    ("Ã±", "ñ"),  # Ã± → ñ
    ("Ã¼", "ü"),  # Ã¼ → ü
    ("Ã¶", "ö"),  # Ã¶ → ö
    ("Ã¤", "ä"),  # Ã¤ → ä
    ("Ã¨", "è"),  # Ã¨ → è
    ("Ãª", "ê"),  # Ãª → ê
    ("Ã§", "ç"),  # Ã§ → ç
)


def mojibake_repair_col(text: Column) -> Column:
    """Repair the common double-encode artifacts (UTF-8 bytes rendered
    through a latin1/cp1252 decode) by an ordered LITERAL replace chain
    — the fixer companion to encoding_noise_cols' detector, the
    ftfy-lite step a web pipeline runs between extraction and scoring.
    Literal replaces only (no regex on data): engine-identical by
    construction, codegen'd narrow map, zero shuffle."""
    out = text
    for bad, good in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def mojibake_repair_py(s: str) -> str:
    """Pure-Python twin of mojibake_repair_col (the oracle/spec form)."""
    for bad, good in MOJIBAKE_MAP:
        s = s.replace(bad, good)
    return s
