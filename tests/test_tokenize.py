"""Analyzer semantics vs a literal re-statement of the reference algorithm.

The test-local `_reference_grams` follows the reference control flow
verbatim-in-spirit (per-gram slice filtering, tokenizer.py:79-104 +
utils.py:111-138), while the engine's Analyzer uses single-pass keep-flags
+ batched hashing. Multiset equality across arbitrary unicode proves the
optimization is semantics-preserving.
"""

import unicodedata
from collections import Counter

import numpy as np
import regex
from hypothesis import given, settings, strategies as st

from word2doc_spark.functions.hashing import murmurhash3_32
from word2doc_spark.functions.stopwords import STOPWORDS
from word2doc_spark.functions.tokenize import (
    Analyzer, is_filtered_word, nfd, simple_tokenize,
)

_TOKEN_RE = regex.compile(
    r"([\p{L}\p{N}\p{M}]+)|([^\p{Z}\p{C}])",
    flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE,
)
_PUNCT = regex.compile(r"^\p{P}+$")


def _ref_filter_word(text: str) -> bool:
    text = unicodedata.normalize("NFD", text)
    if _PUNCT.match(text):
        return True
    return text.lower() in STOPWORDS


def _ref_filter_ngram(gram: list[str]) -> bool:
    return any(_ref_filter_word(w) for w in gram)  # mode='any'


def _reference_grams(text: str, n: int = 2) -> list[str]:
    t = unicodedata.normalize("NFD", text)
    words = [m.group().lower() for m in _TOKEN_RE.finditer(t)]
    spans = [
        (s, e + 1)
        for s in range(len(words))
        for e in range(s, min(s + n, len(words)))
        if not _ref_filter_ngram(words[s:e + 1])
    ]
    return [" ".join(words[s:e]) for (s, e) in spans]


def test_tokenizer_basics():
    assert simple_tokenize("Hello, world!") == ["Hello", ",", "world", "!"]
    assert simple_tokenize("a1b2 c-d") == ["a1b2", "c", "-", "d"]
    assert simple_tokenize("") == []


def test_filter_word():
    assert is_filtered_word("the")
    assert is_filtered_word("...")
    assert is_filtered_word("The".lower())
    assert not is_filtered_word("spark")
    assert not is_filtered_word("café")


def test_grams_match_reference_examples():
    a = Analyzer(ngram=2, hash_size=2 ** 24)
    cases = [
        "The quick brown fox jumps over the lazy dog",
        "Café résumé ﬁsh naïve",       # NFC / ligature input
        "Café résumé",                          # already-NFD input
        "the of and a is",                                        # stopwords only
        "!!! ... ???",                                            # punct only
        "word2doc builds an inverted index, quickly.",
        "Multi\nline\ttext  with   spaces",
        "ﬁsh ﬁsh ﬁsh repeated tokens tokens",
    ]
    for text in cases:
        assert Counter(a.grams(text)) == Counter(_reference_grams(text)), text


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_grams_match_reference_property(text):
    a = Analyzer(ngram=2, hash_size=2 ** 24)
    assert Counter(a.grams(text)) == Counter(_reference_grams(text))


def test_analyze_counts_and_collisions():
    # hash_size=8 forces collisions; colliding grams must merge tfs
    # (reference sum_duplicates semantics, build_tfidf.py:142).
    a = Analyzer(ngram=2, hash_size=8)
    text = "spark index spark index crawl"
    terms, tfs = a.analyze(text)
    grams = _reference_grams(text)
    want = Counter(murmurhash3_32(g) % 8 for g in grams)
    got = dict(zip(terms.tolist(), tfs.tolist()))
    assert got == dict(want)
    assert int(tfs.sum()) == len(grams)
    assert np.all(np.diff(terms) > 0)  # sorted unique


def test_analyze_batch_matches_single():
    a = Analyzer(ngram=2, hash_size=2 ** 18)
    texts = ["spark shuffle partition", "", "the the the", "café crawl café",
             None, "block max wand heap"]
    texts_in = [t if t is not None else "" for t in texts]
    bt, btf = a.analyze_batch(texts_in)
    for text, terms, tfs in zip(texts_in, bt, btf):
        st_, stf = Analyzer(ngram=2, hash_size=2 ** 18).analyze(text)
        assert np.array_equal(terms, st_)
        assert np.array_equal(tfs, stf)


def test_query_analysis_same_as_docs():
    # reference applies the identical pipeline to queries
    a = Analyzer(ngram=2, hash_size=2 ** 24)
    q = "what is the spark shuffle?"
    d_terms, d_tfs = a.analyze(q)
    grams = _reference_grams(q)
    assert int(d_tfs.sum()) == len(grams)
