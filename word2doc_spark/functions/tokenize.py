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

    Hot-path design: every word gets a dense int id on first sight; kept
    unigram term_ids live in a numpy table indexed by word id, and bigram
    term_ids in an int-keyed dict ``wid_a * CAP + wid_b`` — so on cache
    hits no gram string is ever built and no string is hashed. Web text is
    Zipfian: after warm-up the per-token cost is one dict probe. (The
    original string-keyed path caused allocator/memory-bandwidth pressure
    that capped multi-core scaling of the analysis stage.)
    """

    _WID_CAP = 1 << 24  # dense word-id space bound for bigram int keys

    def __init__(self, ngram: int = 2, hash_size: int = 2 ** 24):
        if ngram not in (1, 2):
            raise ValueError("only ngram in {1,2} supported (reference default is 2)")
        self.ngram = ngram
        self.hash_size = hash_size
        self._hash_cache = TermHashCache(hash_size)
        self._word_verdict: dict[str, bool] = {}  # lowercased word -> filtered?
        # word string -> dense wid; wid -> (kept?, unigram term_id)
        self._wid: dict[str, int] = {}
        self._wid_strings: list[str] = []
        self._wid_kept = np.empty(1024, dtype=bool)
        self._wid_term = np.empty(1024, dtype=np.int64)
        self._bigram_term: dict[int, int] = {}

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
        terms, tfs = self.analyze_batch([text or ""])
        return terms[0], tfs[0]

    def _maybe_reset(self) -> None:
        """Bound executor memory: flush caches together when the word table
        is full (bigram keys embed word ids — they must never outlive the
        word table). Zipfian text re-warms the head vocabulary instantly."""
        if len(self._wid) > 4_000_000:
            self._wid = {}
            self._wid_strings = []
            self._wid_kept = np.empty(1024, dtype=bool)
            self._wid_term = np.empty(1024, dtype=np.int64)
            self._bigram_term = {}

    # -- wid table management -------------------------------------------
    def _grow(self, n: int) -> None:
        while self._wid_kept.size < n:
            self._wid_kept = np.concatenate(
                (self._wid_kept, np.empty(self._wid_kept.size, dtype=bool)))
            self._wid_term = np.concatenate(
                (self._wid_term, np.empty(self._wid_term.size, dtype=np.int64)))

    def _intern_words(self, words: list[str]) -> np.ndarray:
        """words → wid array; registers new words (verdict computed, term_id
        hashed lazily in one vectorized call per batch of new words)."""
        wid_map = self._wid
        out = np.empty(len(words), dtype=np.int64)
        new_words: list[str] = []
        new_idx: list[int] = []
        for i, w in enumerate(words):
            v = wid_map.get(w, -1)
            if v < 0:
                new_words.append(w)
                new_idx.append(i)
            else:
                out[i] = v
        if new_words:
            # dedupe within the miss list, preserve first occurrence
            start = len(self._wid_strings)
            fresh: list[str] = []
            for w in new_words:
                if w not in wid_map:
                    wid_map[w] = start + len(fresh)
                    fresh.append(w)
            self._wid_strings.extend(fresh)
            self._grow(len(self._wid_strings))
            if fresh:
                ids = self._hash_cache.lookup(fresh)
                for j, w in enumerate(fresh):
                    wid = start + j
                    self._wid_kept[wid] = not is_filtered_word(w)
                    self._wid_term[wid] = ids[j]
            for i in new_idx:
                out[i] = wid_map[words[i]]
        return out

    def _doc_term_ids(self, words: list[str]) -> np.ndarray:
        """One document's words → int64 array of kept gram term_ids
        (unigrams then bigrams; bag order is irrelevant downstream)."""
        if not words:
            return np.empty(0, dtype=np.int64)
        wids = self._intern_words(words)
        kept = self._wid_kept[wids]
        parts = [self._wid_term[wids[kept]]]
        if self.ngram >= 2 and len(words) > 1:
            both = kept[:-1] & kept[1:]
            if both.any():
                a = wids[:-1][both]
                b = wids[1:][both]
                keys = a * self._WID_CAP + b
                bt = self._bigram_term
                terms = np.empty(keys.size, dtype=np.int64)
                miss_pos: list[int] = []
                klist = keys.tolist()
                for i, kk in enumerate(klist):
                    t = bt.get(kk, -1)
                    if t < 0:
                        miss_pos.append(i)
                    else:
                        terms[i] = t
                if miss_pos:
                    strs = self._wid_strings
                    miss_grams = [f"{strs[a[i]]} {strs[b[i]]}" for i in miss_pos]
                    ids = self._hash_cache.lookup(miss_grams)
                    for j, i in enumerate(miss_pos):
                        t = int(ids[j])
                        terms[i] = t
                        if len(bt) < 8_000_000:
                            bt[klist[i]] = t
                parts.append(terms)
        return np.concatenate(parts) if len(parts) > 1 else parts[0]

    def analyze_batch(
        self, texts: "list[str]"
    ) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """Batch form over one Arrow batch. Per-doc term counting via
        np.unique over int64 gram ids; strings only on cache misses."""
        self._maybe_reset()
        term_lists: list[np.ndarray] = []
        tf_lists: list[np.ndarray] = []
        finditer = _TOKEN_RE.finditer
        for t in texts:
            if not t:
                term_lists.append(np.empty(0, dtype=np.int64))
                tf_lists.append(np.empty(0, dtype=np.int32))
                continue
            words = [m.group().lower() for m in finditer(nfd(t))]
            ids = self._doc_term_ids(words)
            if ids.size == 0:
                term_lists.append(np.empty(0, dtype=np.int64))
                tf_lists.append(np.empty(0, dtype=np.int32))
            else:
                uniq, counts = np.unique(ids, return_counts=True)
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
