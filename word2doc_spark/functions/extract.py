"""HTML → text extraction.

The reference extracts wiki-markup via an external wikiextractor fork
(/root/reference/.gitmodules:1-3, invoked from
src/build-doc-retriever-model.py:47-48 — the submodule is not vendored).
Our corpus is Common-Crawl-style HTML (BASELINE.json input_hint), so the
extractor here is our own deterministic HTML-to-text function. The per-row
invariant is byte-identical extracted text per url between the Spark
pandas-UDF path and this single-process function — guaranteed by both paths
calling exactly this code, and asserted per url in tests.

It also applies the reference's preprocess-filter semantics as options
(/root/reference/src/word2doc/retriever/prep_wikipedia.py:12-37): HTML
entity unescape and title-pattern drop filters.
"""

from __future__ import annotations

import html as _html
import regex

_SCRIPT_RE = regex.compile(r"(?is)<(script|style|noscript)\b.*?</\1\s*>")
_COMMENT_RE = regex.compile(r"(?s)<!--.*?-->")
_BLOCK_RE = regex.compile(
    r"(?i)</\s*(p|div|h[1-6]|li|tr|table|section|article|header|footer|"
    r"blockquote|pre|ul|ol)\s*>|<\s*br\s*/?\s*>"
)
_TAG_RE = regex.compile(r"(?s)<[^>]*>")
_HSPACE_RE = regex.compile(r"[ \t\f\v ]+")
_VSPACE_RE = regex.compile(r"\n{3,}")

# B1 drop filters (prep_wikipedia.py:22-32 semantics, applied to titles/urls)
BLACKLIST_IDS = frozenset({"23443579", "52643645"})
_DISAMBIG_RE = regex.compile(r"(\(disambiguation\)|\(disambiguation page\))", regex.I)
_LIST_RE = regex.compile(r"^(List of .+|Index of .+|Outline of .+)$")


def extract_text(html_bytes: bytes | None, encoding: str = "utf-8") -> str | None:
    """Deterministic HTML→plain-text. None/empty html → None."""
    if html_bytes is None or len(html_bytes) == 0:
        return None
    raw = html_bytes.decode(encoding, errors="replace")
    s = _COMMENT_RE.sub(" ", raw)
    s = _SCRIPT_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    lines = [_HSPACE_RE.sub(" ", ln).strip() for ln in s.split("\n")]
    s = "\n".join(lines)
    s = _VSPACE_RE.sub("\n\n", s).strip()
    return s if s else None


def is_dropped_title(title: str) -> bool:
    """Reference B1 filter: disambiguation / List-of pages are dropped."""
    return bool(_DISAMBIG_RE.search(title)) or bool(_LIST_RE.match(title))
