"""Postings codec: round-trip, block directory, merge, property tests."""

import numpy as np
from hypothesis import given, settings, strategies as st

from word2doc_spark.index.postings import (
    block_directory, decode_block, decode_postings, encode_postings,
    merge_encoded, varint_decode, varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2 ** 32 - 1,
                     2 ** 40, 2 ** 63, 2 ** 64 - 1], dtype=np.uint64)
    enc = varint_encode(vals)
    assert np.array_equal(varint_decode(enc, len(vals)), vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2 ** 64 - 1), max_size=200))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals) or len(xs) == 0


def _random_postings(rng, n, max_doc=10 ** 7):
    docs = np.sort(rng.choice(max_doc, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 500, size=n).astype(np.uint64)
    return docs, tfs


def test_postings_roundtrip():
    rng = np.random.default_rng(7)
    for n in [1, 2, 127, 128, 129, 1000, 5000]:
        docs, tfs = _random_postings(rng, n)
        payload = encode_postings(docs, tfs, block_size=128)
        d2, t2 = decode_postings(payload)
        assert np.array_equal(d2, docs)
        assert np.array_equal(t2, tfs)


def test_huge_doc_ids():
    # 10^12-doc scale ids must survive (u64 + varint)
    docs = np.array([10 ** 12, 10 ** 12 + 5, 2 * 10 ** 12], dtype=np.uint64)
    tfs = np.array([1, 2, 3], dtype=np.uint64)
    d2, t2 = decode_postings(encode_postings(docs, tfs))
    assert np.array_equal(d2, docs) and np.array_equal(t2, tfs)


def test_block_directory_and_single_block_decode():
    rng = np.random.default_rng(11)
    docs, tfs = _random_postings(rng, 1000)
    payload = encode_postings(docs, tfs, block_size=128)
    offs, counts, lasts, maxtfs = block_directory(payload)
    assert counts.sum() == 1000
    assert len(offs) == 8  # ceil(1000/128)
    # per-block invariants
    pos = 0
    prev_last = 0
    for i in range(len(offs)):
        blk_docs, blk_tfs = decode_block(payload, int(offs[i]), prev_last)
        want_docs = docs[pos:pos + counts[i]]
        want_tfs = tfs[pos:pos + counts[i]]
        assert np.array_equal(blk_docs, want_docs)
        assert np.array_equal(blk_tfs, want_tfs)
        assert lasts[i] == want_docs[-1]
        assert maxtfs[i] == want_tfs.max()
        prev_last = int(lasts[i])
        pos += int(counts[i])


def test_merge_disjoint_runs():
    rng = np.random.default_rng(3)
    docs, tfs = _random_postings(rng, 600)
    # split into 3 doc_id-range buckets (salted-build shape)
    cuts = [0, 200, 400, 600]
    parts = [encode_postings(docs[a:b], tfs[a:b]) for a, b in zip(cuts, cuts[1:])]
    merged = merge_encoded(parts)
    d2, t2 = decode_postings(merged)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)


def test_merge_sums_duplicate_docs():
    a = encode_postings(np.array([1, 5, 9], np.uint64), np.array([2, 3, 4], np.uint64))
    b = encode_postings(np.array([5, 9, 12], np.uint64), np.array([10, 1, 7], np.uint64))
    d, t = decode_postings(merge_encoded([a, b]))
    assert d.tolist() == [1, 5, 9, 12]
    assert t.tolist() == [2, 13, 5, 7]


def test_compression_ratio_dense():
    # dense consecutive ids compress to ~2 bytes/posting (1B delta + 1B tf)
    docs = np.arange(0, 100_000, dtype=np.uint64)
    tfs = np.ones(100_000, dtype=np.uint64)
    payload = encode_postings(docs, tfs)
    assert len(payload) < 100_000 * 2.5


def test_encode_postings_batch_byte_identity():
    """encode_postings_batch produces BYTE-IDENTICAL payloads to the
    per-segment encoder over randomized segment shapes and block sizes."""
    import numpy as np
    from word2doc_spark.index.postings import (
        decode_postings, encode_postings, encode_postings_batch)

    rng = np.random.default_rng(11)
    for _ in range(30):
        segs = []
        for _ in range(int(rng.integers(1, 50))):
            ln = int(rng.integers(1, 600))
            docs = np.sort(rng.choice(10 ** 12, size=ln,
                                      replace=False)).astype(np.uint64)
            tfs = rng.integers(1, 70000, size=ln).astype(np.uint64)
            segs.append((docs, tfs))
        doc_ids = np.concatenate([d for d, _ in segs])
        tfs = np.concatenate([t for _, t in segs])
        starts = np.concatenate(
            ([0], np.cumsum([d.size for d, _ in segs])[:-1]))
        bs = int(rng.choice([4, 32, 128, 512]))
        got = encode_postings_batch(doc_ids, tfs, starts, bs)
        for (d, t), g in zip(segs, got):
            assert g == encode_postings(d, t, bs)
            dd, tt = decode_postings(g)
            assert np.array_equal(dd, d) and np.array_equal(tt, t)
    assert encode_postings_batch(np.empty(0, np.uint64),
                                 np.empty(0, np.uint64),
                                 np.empty(0, np.int64)) == []


def test_pack_triples_roundtrip_property():
    """pack_triples/unpack_triples round-trip on randomized (term, doc)
    sorted triples, including multi-run doc-delta restarts and huge ids."""
    import numpy as np
    from word2doc_spark.index.postings import pack_triples, unpack_triples

    rng = np.random.default_rng(23)
    for _ in range(30):
        n_terms = int(rng.integers(1, 40))
        terms, docs, tfs = [], [], []
        for _ in range(n_terms):
            t = int(rng.integers(0, 2 ** 24))
            ln = int(rng.integers(1, 200))
            d = np.sort(rng.choice(10 ** 12, size=ln, replace=False))
            terms.append(np.full(ln, t, dtype=np.int64))
            docs.append(d.astype(np.int64))
            tfs.append(rng.integers(1, 70000, size=ln).astype(np.int64))
        t = np.concatenate(terms)
        d = np.concatenate(docs)
        f = np.concatenate(tfs)
        order = np.lexsort((d, t))
        t, d, f = t[order], d[order], f[order]
        # duplicate (term, doc) pairs can't occur in analyze output, but
        # sorting must still be the only precondition — drop dups
        keep = np.concatenate(([True], (t[1:] != t[:-1]) | (d[1:] != d[:-1])))
        t, d, f = t[keep], d[keep], f[keep]
        blob = pack_triples(t, d, f)
        tt, dd, ff = unpack_triples(blob)
        assert np.array_equal(tt, t)
        assert np.array_equal(dd, d)
        assert np.array_equal(ff, f)
        # compression sanity: well under raw int64 triples
        assert len(blob) < t.size * 24

    tt, dd, ff = unpack_triples(pack_triples(
        np.empty(0, np.int64), np.empty(0, np.int64),
        np.empty(0, np.int64)))
    assert tt.size == dd.size == ff.size == 0


def test_pack_pairs_roundtrip():
    import numpy as np
    from word2doc_spark.index.postings import pack_pairs, unpack_pairs

    rng = np.random.default_rng(5)
    for _ in range(10):
        ln = int(rng.integers(1, 5000))
        k = np.sort(rng.choice(10 ** 12, size=ln, replace=False)).astype(
            np.int64)
        v = rng.integers(1, 10 ** 6, size=ln).astype(np.int64)
        kk, vv = unpack_pairs(pack_pairs(k, v))
        assert np.array_equal(kk, k) and np.array_equal(vv, v)
    kk, vv = unpack_pairs(pack_pairs(np.empty(0, np.int64),
                                     np.empty(0, np.int64)))
    assert kk.size == vv.size == 0
