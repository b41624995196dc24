"""HTML → text extraction, shared by the oracle and the Spark path.

THE ONE IMPLEMENTATION RULE: this module is imported both by the
single-threaded oracle (quality_filter/oracle.py) and by the Spark
``mapInPandas`` extraction stage (quality_filter/operators/extract.py).
Byte-identical extracted text per url (BASELINE.json input_hint) is
guaranteed *by construction* — same function, same version, same options.

Precedent: the reference keeps a deliberately lossy in-memory JPEG
round-trip purely for bit-compatibility with the original Caffe pipeline
(/root/reference/opennsfw2/_image.py:38-46, README.md:310-312).  The
lesson applied here: never "improve" this extractor in only one path;
goldens pin its exact output.

Pure stdlib (html.parser) — deterministic, no external deps.
"""

from __future__ import annotations

import unicodedata
from html.parser import HTMLParser

# Tags whose text content is boilerplate/non-content and must be dropped.
_SKIP_TAGS = frozenset(
    ["script", "style", "nav", "header", "footer", "noscript", "template", "head"]
)
# Void elements never push onto the skip stack (they cannot nest content).
_VOID_TAGS = frozenset(
    ["br", "hr", "img", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"]
)


class _TextExtractor(HTMLParser):
    """Collects text chunks outside of skip-listed elements."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            piece = data.strip()
            if piece:
                self.chunks.append(piece)


import html as _htmllib
import re as _re

_COMMENT_RE = _re.compile(r"<!--.*?-->", _re.S)
# script/style are RAWTEXT elements: the parser switches to cdata mode
# and the FIRST matching close tag ends the block regardless of any
# '<script>' text inside — a lazy body is exactly that semantics.
_RAWTEXT_TAGS = frozenset(["script", "style"])
_RAWTEXT_RE = _re.compile(
    r"<(" + "|".join(sorted(_RAWTEXT_TAGS)) + r")\b[^>]*>.*?</\1\s*>",
    _re.S | _re.I,
)
# all other skip tags nest by depth: innermost-first match (the guarded
# body may not contain a same-tag open OR close), so nested same-tag
# blocks (<nav>..<nav>..</nav>..</nav>) resolve inner-to-outer across
# the fixed-point loop — matching html.parser's depth counting.  (A lazy
# .*? body stops at the FIRST close tag and strands the outer tail.)
_SKIP_BLOCK_RE = _re.compile(
    r"<(" + "|".join(sorted(_SKIP_TAGS - _RAWTEXT_TAGS)) + r")\b[^>]*>(?:(?!</?\1\b)[\s\S])*</\1\s*>",
    _re.I,
)
# html.parser's tag-start rule: '<' opens markup only before letter / '/' / '!' / '?'
_TAG_RE = _re.compile(r"</?[A-Za-z][^>]*>|<![^>]*>|<\?[^>]*>")
_STRAY_LT_RE = _re.compile(r"<(?![A-Za-z/!?])")
# Fast convergence gate for the skip-block fixed point: BOTH block
# regexes above require a '<tagname' opener, so if no opener remains
# neither can match and another sub round is provably a no-op.  A
# search() is far cheaper than two full sub() scans; profiled, the
# confirm round was ~28% of extract_text on corpus html (every doc
# converges in one real round — nesting is rare).
_SKIP_SNIFF_RE = _re.compile(r"<(" + "|".join(sorted(_SKIP_TAGS)) + r")\b", _re.I)


def extract_text(html: str) -> str:
    """Extract visible text from an HTML string — THE frozen spec.

    Policy (goldens depend on every step — the analog of the
    exactly-specified preprocess pipeline /root/reference/opennsfw2/_image.py:20-68):
      1. drop comments
      2. drop skip-tag blocks (script/style/nav/header/footer/noscript/
         template/head), repeated to a fixed point for nesting
      3. stray '<' (html.parser's non-markup rule) becomes its own token
      4. strip remaining markup tags (each boundary becomes whitespace)
      5. decode character references
      6. collapse all whitespace runs to single spaces
      7. Unicode NFC normalization

    Byte-identical to extract_text_reference (the html.parser twin) on
    every well-formed corpus input — verified across seeds and pinned by
    tests/test_extraction.py::test_fast_matches_reference_on_corpus.
    They diverge only on pathological unterminated markup (`<Z<footer>`),
    where html.parser's error recovery is itself erratic; this regex
    pipeline is the defined behavior and is ~7x faster (the extraction
    stage dominates per-doc cost at scale).
    """
    # "<!--" absent -> _COMMENT_RE cannot match (pattern starts with the
    # literal); C-level substring test beats the no-op regex scan.
    s = _COMMENT_RE.sub(" ", html) if "<!--" in html else html
    # Fixed point with a sniff gate: run sub rounds only while a skip-tag
    # opener remains (no opener -> both subs provably no-op -> converged);
    # an unclosed opener that no sub can consume exits via prev == s.
    # Output-identical to the unconditional prev != s loop by the
    # implication documented at _SKIP_SNIFF_RE.
    while _SKIP_SNIFF_RE.search(s):
        prev = s
        s = _RAWTEXT_RE.sub(" ", s)
        s = _SKIP_BLOCK_RE.sub(" ", s)
        if s == prev:
            break
    s = _STRAY_LT_RE.sub(" < ", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    collapsed = " ".join(s.split())
    return unicodedata.normalize("NFC", collapsed)


def extract_text_reference(html: str) -> str:
    """html.parser-based twin, kept as a cross-validation reference
    (differential-tested against extract_text on corpus inputs)."""
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    joined = " ".join(parser.chunks)
    collapsed = " ".join(joined.split())
    return unicodedata.normalize("NFC", collapsed)


def extract_text_from_bytes(html_bytes: bytes | None) -> str | None:
    """Decode (transparently un-gzipping) then extract.

    Common-Crawl-style payloads frequently arrive gzip-compressed (WARC
    record bodies); a leading 1F 8B magic triggers stdlib gunzip before
    the strict UTF-8 decode.  This lives HERE — the one shared module —
    so oracle and Spark stay byte-identical by construction; clean-text
    goldens are unaffected (no golden payload is compressed).

    Returns None for undecodable/corrupt payloads → the row is routed to
    the quarantine output instead of failing the job (the
    malformed-payload dispatch analog,
    /root/reference/app/services/file_service.py:125-156).
    """
    if html_bytes is None:
        return None
    raw = bytes(html_bytes)
    if raw[:2] == b"\x1f\x8b":
        import gzip
        import zlib

        try:
            raw = gzip.decompress(raw)
        except (OSError, EOFError, zlib.error):
            return None  # recognized-but-corrupt container → quarantine
    try:
        html = raw.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, ValueError):
        return None
    try:
        return extract_text(html)
    except Exception:
        return None
