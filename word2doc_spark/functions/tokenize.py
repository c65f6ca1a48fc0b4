"""Text analysis: NFD → simple-tokenize → 1..n-grams → filter → hash → tf.

Semantics contract (what we must compute, from the reference):
* tokenizer regex ``([\\p{L}\\p{N}\\p{M}]+)|([^\\p{Z}\\p{C}])`` with
  IGNORECASE|UNICODE|MULTILINE —
  /root/reference/src/word2doc/tokenizers/simple_tokenizer.py:19-30
* NFD normalization at every boundary —
  /root/reference/src/word2doc/retriever/utils.py:106-108
* n-grams of all lengths 1..n over lowercased tokens, a gram dropped if ANY
  of its tokens is all-punctuation or a stopword —
  /root/reference/src/word2doc/tokenizers/tokenizer.py:79-104,
  /root/reference/src/word2doc/retriever/utils.py:111-138
* gram string = tokens joined by a single space; term_id =
  murmur3_32(gram, positive) % hash_size —
  /root/reference/src/word2doc/retriever/utils.py:75-77
* per-doc tf = Counter over term_ids (hash collisions merge tfs) —
  /root/reference/src/word2doc/retriever/build_tfidf.py:59-76

Implementation is ours: single-pass keep-flags per token (equivalent to the
reference's per-gram re-filtering because filter mode is 'any'), an
executor-lifetime token-verdict cache, and batch-vectorized hashing.
"""

from __future__ import annotations

import unicodedata
from collections import Counter

import numpy as np
import regex

from word2doc_spark.functions.hashing import TermHashCache
from word2doc_spark.functions.stopwords import STOPWORDS

TOKEN_PATTERN = r"([\p{L}\p{N}\p{M}]+)|([^\p{Z}\p{C}])"
_TOKEN_RE = regex.compile(
    TOKEN_PATTERN, flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE
)
_PUNCT_RE = regex.compile(r"^\p{P}+$")


def nfd(text: str) -> str:
    return unicodedata.normalize("NFD", text)


def simple_tokenize(text: str) -> list[str]:
    """Token surface forms, in order (case preserved)."""
    return [m.group() for m in _TOKEN_RE.finditer(text)]


def is_filtered_word(word: str) -> bool:
    """True if the (lowercased) token is punctuation-only or a stopword."""
    w = unicodedata.normalize("NFD", word)
    if _PUNCT_RE.match(w):
        return True
    return w.lower() in STOPWORDS


class Analyzer:
    """Reusable text→(term_ids, tfs) analyzer with executor-lifetime caches.

    Instantiate once per executor (lazily inside a pandas UDF closure) and
    call :meth:`analyze_batch` per Arrow batch.
    """

    def __init__(self, ngram: int = 2, hash_size: int = 2 ** 24):
        if ngram not in (1, 2):
            raise ValueError("only ngram in {1,2} supported (reference default is 2)")
        self.ngram = ngram
        self.hash_size = hash_size
        self._hash_cache = TermHashCache(hash_size)
        self._word_verdict: dict[str, bool] = {}  # lowercased word -> filtered?

    # -- gram extraction ----------------------------------------------------
    def grams(self, text: str) -> list[str]:
        """Kept (unfiltered) 1..n-gram strings for one document, in order."""
        verdict = self._word_verdict
        words = [m.group().lower() for m in _TOKEN_RE.finditer(nfd(text))]
        kept = np.empty(len(words), dtype=bool)
        for i, w in enumerate(words):
            v = verdict.get(w)
            if v is None:
                v = is_filtered_word(w)
                if len(verdict) < 4_000_000:
                    verdict[w] = v
            kept[i] = not v
        out = [w for w, k in zip(words, kept) if k]
        if self.ngram >= 2 and len(words) > 1:
            both = kept[:-1] & kept[1:]
            # interleave order does not matter (bag-of-grams); appending
            # bigrams after unigrams keeps this a two-pass vector op
            out.extend(
                f"{words[i]} {words[i + 1]}" for i in np.flatnonzero(both)
            )
        return out

    # -- per-doc term counting ---------------------------------------------
    def analyze(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """One document → (sorted unique term_ids int64, tfs int32)."""
        g = self.grams(text)
        if not g:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32))
        ids = self._hash_cache.lookup(g)
        uniq, counts = np.unique(ids, return_counts=True)
        return uniq, counts.astype(np.int32)

    def analyze_batch(
        self, texts: "list[str]"
    ) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """Batch form: hash ALL grams of the batch in one vectorized call,
        then split back per document. This is the Arrow-UDF hot path."""
        all_grams: list[str] = []
        offsets = np.empty(len(texts) + 1, dtype=np.int64)
        offsets[0] = 0
        for i, t in enumerate(texts):
            g = self.grams(t) if t else []
            all_grams.extend(g)
            offsets[i + 1] = len(all_grams)
        ids = self._hash_cache.lookup(all_grams)
        term_lists: list[np.ndarray] = []
        tf_lists: list[np.ndarray] = []
        for i in range(len(texts)):
            doc_ids = ids[offsets[i]:offsets[i + 1]]
            if doc_ids.size == 0:
                term_lists.append(np.empty(0, dtype=np.int64))
                tf_lists.append(np.empty(0, dtype=np.int32))
            else:
                uniq, counts = np.unique(doc_ids, return_counts=True)
                term_lists.append(uniq)
                tf_lists.append(counts.astype(np.int32))
        return term_lists, tf_lists


def analyze_query_terms(
    query: str, ngram: int = 2, hash_size: int = 2 ** 24,
    analyzer: Analyzer | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Query → (unique term_ids, query tfs); same analysis as documents
    (reference applies the identical ngram pipeline to queries —
    /root/reference/src/word2doc/retriever/tfidf_doc_ranker.py:84-107)."""
    a = analyzer or Analyzer(ngram=ngram, hash_size=hash_size)
    return a.analyze(query)
