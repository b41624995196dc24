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


def extract_text(html: str) -> str:
    """Extract visible text from an HTML string.

    Policy (frozen; goldens depend on every step — the analog of the
    exactly-specified preprocess pipeline /root/reference/opennsfw2/_image.py:20-68):
      1. parse with html.parser, convert_charrefs=True
      2. drop text inside script/style/nav/header/footer/noscript/template/head
      3. strip each chunk, drop empties
      4. join chunks with a single space
      5. collapse all whitespace runs to single spaces
      6. Unicode NFC normalization
    """
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    joined = " ".join(parser.chunks)
    collapsed = " ".join(joined.split())
    return unicodedata.normalize("NFC", collapsed)


def extract_text_from_bytes(html_bytes: bytes | None) -> str | None:
    """Decode UTF-8 (strict) then extract.

    Returns None for undecodable payloads → the row is routed to the
    quarantine output instead of failing the job (the malformed-payload
    dispatch analog, /root/reference/app/services/file_service.py:125-156).
    """
    if html_bytes is None:
        return None
    try:
        html = bytes(html_bytes).decode("utf-8", errors="strict")
    except (UnicodeDecodeError, ValueError):
        return None
    try:
        return extract_text(html)
    except Exception:
        return None
