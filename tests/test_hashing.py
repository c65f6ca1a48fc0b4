"""MurmurHash3 x86_32 bit-identity (public test vectors) + batch==scalar."""

import numpy as np
from hypothesis import given, settings, strategies as st

from word2doc_spark.functions.hashing import (
    TermHashCache, murmurhash3_32, murmurhash3_batch,
)

# Public MurmurHash3_x86_32 test vectors (Appleby's reference impl).
VECTORS = [
    (b"", 0, 0x00000000),
    (b"", 1, 0x514E28B7),
    (b"hello", 0, 0x248BFA47),
    (b"hello, world", 0, 0x149BBB7F),
    (b"The quick brown fox jumps over the lazy dog", 0, 0x2E4FF723),
]


def test_public_vectors():
    for data, seed, want in VECTORS:
        assert murmurhash3_32(data, seed) == want


def test_batch_matches_scalar_edge_lengths():
    toks = ["", "a", "ab", "abc", "abcd", "abcde", "é", "ﬁ", "漢字",
            "x" * 63, "x" * 64, "x" * 65, "hello world bigram"]
    got = murmurhash3_batch(toks)
    want = np.array([murmurhash3_32(t) for t in toks], dtype=np.uint64)
    assert np.array_equal(got, want)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=30))
def test_batch_matches_scalar_property(tokens):
    got = murmurhash3_batch(tokens)
    want = np.array([murmurhash3_32(t) for t in tokens], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_cache_consistency():
    cache = TermHashCache(hash_size=2 ** 18)
    toks = ["alpha", "beta", "alpha", "gamma", "beta"]
    first = cache.lookup(toks)
    second = cache.lookup(toks)  # now fully cached
    assert np.array_equal(first, second)
    want = np.array([murmurhash3_32(t) % 2 ** 18 for t in toks])
    assert np.array_equal(first, want)
