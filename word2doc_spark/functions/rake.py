"""RAKE keyword extraction (Rose et al. 2010 — public algorithm).

The reference trims each SQuAD question to its top RAKE phrase before
retrieval (/root/reference/src/word2doc/optimizer/pre_process.py:92 via
keywords/rake_extractor.py:1-11, which wraps rake_nltk). rake_nltk needs
NLTK tokenizers/stopword data that are absent from this environment, so
this is an implementation of the published algorithm itself — candidate
phrases split at stopwords/punctuation, word scores deg(w)/freq(w),
phrase score = Σ word scores — using the engine's reference-verbatim
STOPWORDS set. Algorithm parity, not byte parity with rake_nltk
(documented env constraint; the golden query fixtures are pre-trimmed).
"""

from __future__ import annotations

import regex

from word2doc_spark.functions.stopwords import STOPWORDS

_WORD_RE = regex.compile(r"[\p{L}\p{N}\p{M}']+|[^\p{L}\p{N}\p{M}\s]")
_PUNCT_RE = regex.compile(r"^\p{P}+$")


def candidate_phrases(text: str,
                      stopwords: frozenset | set = STOPWORDS) -> list[list[str]]:
    """Maximal runs of non-stopword, non-punctuation tokens, in order."""
    phrases: list[list[str]] = []
    cur: list[str] = []
    for m in _WORD_RE.finditer(text):
        tok = m.group()
        if _PUNCT_RE.match(tok) or tok.lower() in stopwords:
            if cur:
                phrases.append(cur)
                cur = []
        else:
            cur.append(tok)
    if cur:
        phrases.append(cur)
    return phrases


def rake_phrases(text: str,
                 stopwords: frozenset | set = STOPWORDS
                 ) -> list[tuple[str, float]]:
    """Ranked (phrase, score) descending; ties keep first-occurrence order
    (deterministic — the reference's rake_nltk tie order is dict-insertion,
    SURVEY §2.J3 analog)."""
    phrases = candidate_phrases(text, stopwords)
    if not phrases:
        return []
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    scored = [(" ".join(p), sum(deg[w] / freq[w] for w in p))
              for p in phrases]
    # stable sort → equal scores keep occurrence order
    scored.sort(key=lambda t: -t[1])
    return scored


def rake_top_phrase(text: str,
                    stopwords: frozenset | set = STOPWORDS) -> str:
    """The reference's query trim: top-ranked phrase of the lowercased
    text; the text itself when no candidate phrase survives."""
    ranked = rake_phrases(text.lower(), stopwords)
    return ranked[0][0] if ranked else text.lower()
