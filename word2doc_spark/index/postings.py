"""Posting-list binary codec: sorted doc_ids, delta + varint, block-max.

The reference keeps postings as scipy-CSR column slices
(/root/reference/src/word2doc/retriever/utils.py:52-67,
build_tfidf.py:138-142). Our on-disk unit is one compressed posting list per
term_id, stored in a BinaryType parquet column:

    header : u8 version | u8 flags | u16 block_size | u32 n_postings
    blocks : per block of ≤block_size postings —
             u32 n_bytes_docs | u32 n_bytes_tfs | u64 last_doc_id | u32 max_tf
             then varint(delta(doc_ids)) ++ varint(tfs)

``last_doc_id`` + ``max_tf`` per block give block-max WAND its skip
pointers and impact upper bounds without decoding the block. doc_ids are
u64 (10^12-doc scale); all encode/decode paths are numpy-vectorized (no
per-value Python in the hot path).
"""

from __future__ import annotations

import struct

import numpy as np

_VERSION = 1
_HEADER = struct.Struct("<BBHI")        # version, flags, block_size, n_postings
_BLOCK_HDR = struct.Struct("<IIQI")     # nbytes_docs, nbytes_tfs, last_doc, max_tf


def varint_encode(values: np.ndarray) -> np.ndarray:
    """LEB128-style varint encode of a uint64 array → uint8 array."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0)
        tmp >>= np.uint64(7)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nb, out=offs[1:])
    out = np.zeros(offs[-1], dtype=np.uint8)
    cur = v.copy()
    starts = offs[:-1]
    for k in range(int(nb.max())):
        mask = nb > k
        idx = starts[mask] + k
        byte = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = ((k + 1) < nb[mask]).astype(np.uint8) << 7
        out[idx] = byte | cont
        cur >>= np.uint64(7)
    return out


def varint_decode(buf: np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a uint8 varint stream → uint64 array."""
    b = np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0
    starts = np.flatnonzero(np.concatenate(([True], ends[:-1])))
    pos_in_val = np.arange(b.size, dtype=np.int64)
    pos_in_val -= np.repeat(starts, np.diff(np.concatenate((starts, [b.size]))))
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_val.astype(np.uint64)
    )
    vals = np.add.reduceat(contrib, starts)
    if count is not None:
        assert vals.size == count, f"varint count mismatch {vals.size} != {count}"
    return vals


_TRIPLE_HDR = struct.Struct("<III")     # n, nbytes_terms, nbytes_docs
_PAIR_HDR = struct.Struct("<II")        # n, nbytes_keys


def pack_triples(terms: np.ndarray, docs: np.ndarray,
                 tfs: np.ndarray) -> bytes:
    """Delta+varint pack of (term, doc, tf) triples sorted by (term, doc).

    Stream: header | varint(delta(term)) | varint(doc_enc) | varint(tf)
    where doc_enc is the in-run doc delta, restarting at the absolute doc
    id on each term change. ~4x smaller than raw int64 triples — the
    staged-blob shuffle and parquet IO are bus-bound, so fewer bytes buy
    wall time the extra (core-scaling) varint CPU does not cost back.
    """
    terms = np.asarray(terms, dtype=np.uint64)
    docs = np.asarray(docs, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    n = terms.size
    if n == 0:
        return _TRIPLE_HDR.pack(0, 0, 0)
    tdelta = np.empty(n, dtype=np.uint64)
    tdelta[0] = terms[0]
    np.subtract(terms[1:], terms[:-1], out=tdelta[1:])
    denc = np.empty(n, dtype=np.uint64)
    denc[0] = docs[0]
    same = terms[1:] == terms[:-1]
    denc[1:] = np.where(same, docs[1:] - docs[:-1], docs[1:])
    tb = varint_encode(tdelta)
    db = varint_encode(denc)
    fb = varint_encode(tfs)
    return b"".join((_TRIPLE_HDR.pack(n, tb.size, db.size),
                     tb.tobytes(), db.tobytes(), fb.tobytes()))


def unpack_triples(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`pack_triples` → (terms, docs, tfs) int64 arrays
    in the packed (term, doc)-sorted order."""
    n, nbt, nbd = _TRIPLE_HDR.unpack_from(blob, 0)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    buf = np.frombuffer(blob, dtype=np.uint8)[_TRIPLE_HDR.size:]
    terms = np.cumsum(varint_decode(buf[:nbt], n), dtype=np.uint64)
    denc = varint_decode(buf[nbt:nbt + nbd], n)
    tfs = varint_decode(buf[nbt + nbd:], n)
    starts = np.flatnonzero(
        np.concatenate(([True], terms[1:] != terms[:-1])))
    c = np.cumsum(denc, dtype=np.uint64)
    base = c[starts] - denc[starts]
    run_lens = np.diff(np.concatenate((starts, [n])))
    docs = c - np.repeat(base, run_lens)
    return (terms.astype(np.int64), docs.astype(np.int64),
            tfs.astype(np.int64))


def pack_pairs(keys: np.ndarray, vals: np.ndarray) -> bytes:
    """Delta+varint pack of (key, val) pairs sorted by key ascending
    (the staged per-doc (doc_id, dl) blobs)."""
    keys = np.asarray(keys, dtype=np.uint64)
    vals = np.asarray(vals, dtype=np.uint64)
    n = keys.size
    if n == 0:
        return _PAIR_HDR.pack(0, 0)
    kdelta = np.empty(n, dtype=np.uint64)
    kdelta[0] = keys[0]
    np.subtract(keys[1:], keys[:-1], out=kdelta[1:])
    kb = varint_encode(kdelta)
    vb = varint_encode(vals)
    return b"".join((_PAIR_HDR.pack(n, kb.size), kb.tobytes(),
                     vb.tobytes()))


def unpack_pairs(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    n, nbk = _PAIR_HDR.unpack_from(blob, 0)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    buf = np.frombuffer(blob, dtype=np.uint8)[_PAIR_HDR.size:]
    keys = np.cumsum(varint_decode(buf[:nbk], n), dtype=np.uint64)
    vals = varint_decode(buf[nbk:], n)
    return keys.astype(np.int64), vals.astype(np.int64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray,
                    block_size: int = 128) -> bytes:
    """Encode one term's postings. doc_ids must be sorted unique ascending."""
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    n = doc_ids.size
    parts = [_HEADER.pack(_VERSION, 0, block_size, n)]
    prev_last = np.uint64(0)
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        blk_docs = doc_ids[s:e]
        blk_tfs = tfs[s:e]
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = blk_docs[0] - prev_last  # first block: delta from 0
        np.subtract(blk_docs[1:], blk_docs[:-1], out=deltas[1:])
        db = varint_encode(deltas)
        tb = varint_encode(blk_tfs)
        parts.append(_BLOCK_HDR.pack(db.size, tb.size, int(blk_docs[-1]),
                                     int(blk_tfs.max())))
        parts.append(db.tobytes())
        parts.append(tb.tobytes())
        prev_last = blk_docs[-1]
    return b"".join(parts)


def encode_postings_batch(doc_ids: np.ndarray, tfs: np.ndarray,
                          seg_starts: np.ndarray,
                          block_size: int = 128) -> list[bytes]:
    """Encode MANY segments in one vectorized pass; byte-identical to
    calling :func:`encode_postings` per segment (property-tested).

    doc_ids/tfs: the concatenated postings of all segments, doc-ascending
    within each segment; seg_starts: start index of each segment
    (ascending, seg_starts[0] == 0). Returns one payload per segment.

    Why: the build's encode stage emits millions of small segments
    (term × doc-range runs); per-segment python encoding pays ~30 numpy
    calls per 5-posting run. Here the varint streams for the WHOLE batch
    are computed once and the payload images are assembled with numpy
    scatters — per-segment python shrinks to one buffer slice."""
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    n = doc_ids.size
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    n_segs = seg_starts.size
    if n == 0 or n_segs == 0:
        return []
    seg_ends = np.concatenate((seg_starts[1:], [n]))
    seg_lens = seg_ends - seg_starts

    # deltas: doc[i] - doc[i-1], reset to the ABSOLUTE doc id at each
    # segment start (encode_postings starts every payload's chain at 0)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    deltas[seg_starts] = doc_ids[seg_starts]

    d_bytes = varint_encode(deltas)
    t_bytes = varint_encode(tfs)
    # per-value byte counts (recompute cheaply: LEB128 length)
    nb_d = np.ones(n, dtype=np.int64)
    tmp = deltas >> np.uint64(7)
    while tmp.any():
        nb_d += (tmp > 0)
        tmp >>= np.uint64(7)
    nb_t = np.ones(n, dtype=np.int64)
    tmp = tfs >> np.uint64(7)
    while tmp.any():
        nb_t += (tmp > 0)
        tmp >>= np.uint64(7)

    # block structure: ≤block_size postings per block, per segment
    n_blocks_per_seg = (seg_lens + block_size - 1) // block_size
    total_blocks = int(n_blocks_per_seg.sum())
    seg_of_block = np.repeat(np.arange(n_segs), n_blocks_per_seg)
    # index of each block within its segment
    blk_in_seg = np.arange(total_blocks) - np.repeat(
        np.concatenate(([0], np.cumsum(n_blocks_per_seg)[:-1])),
        n_blocks_per_seg)
    blk_starts = seg_starts[seg_of_block] + blk_in_seg * block_size
    blk_ends = np.minimum(blk_starts + block_size, seg_ends[seg_of_block])

    csum_d = np.concatenate(([0], np.cumsum(nb_d)))
    csum_t = np.concatenate(([0], np.cumsum(nb_t)))
    blk_dsize = csum_d[blk_ends] - csum_d[blk_starts]
    blk_tsize = csum_t[blk_ends] - csum_t[blk_starts]
    blk_last = doc_ids[blk_ends - 1]
    blk_max = np.maximum.reduceat(tfs, blk_starts)

    hdr = _HEADER.size
    bhdr = _BLOCK_HDR.size
    blk_total = bhdr + blk_dsize + blk_tsize
    seg_sizes = hdr + np.add.reduceat(blk_total,
                                      np.concatenate(([0],
                                       np.cumsum(n_blocks_per_seg)[:-1])))
    seg_offs = np.concatenate(([0], np.cumsum(seg_sizes)))
    out = np.zeros(int(seg_offs[-1]), dtype=np.uint8)

    # ---- segment headers: <BBHI> version, flags, block_size, n ----
    so = seg_offs[:-1]
    out[so] = _VERSION
    out[so + 1] = 0
    out[so + 2] = block_size & 0xFF
    out[so + 3] = (block_size >> 8) & 0xFF
    for k in range(4):
        out[so + 4 + k] = (seg_lens >> (8 * k)) & 0xFF

    # ---- block offsets within the output ----
    css = np.cumsum(blk_total)
    seg_first_blk = np.concatenate(([0], np.cumsum(n_blocks_per_seg)[:-1]))
    prior = css - blk_total  # total block bytes before this block, global
    base = prior[seg_first_blk]  # per segment
    blk_off = so[seg_of_block] + hdr + (prior - base[seg_of_block])

    # ---- block headers: <IIQI> nbytes_docs, nbytes_tfs, last_doc, max_tf
    for k in range(4):
        out[blk_off + k] = (blk_dsize >> (8 * k)) & 0xFF
        out[blk_off + 4 + k] = (blk_tsize >> (8 * k)) & 0xFF
        out[blk_off + 16 + k] = (blk_max.astype(np.int64) >> (8 * k)) & 0xFF
    for k in range(8):
        out[blk_off + 8 + k] = \
            ((blk_last >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(
                np.uint8)

    # ---- varint payload copies (contiguous source, scattered dest) ----
    # doc bytes of block b live at src [csum_d[blk_starts], csum_d[blk_ends])
    # and go to dst blk_off + bhdr; source order == block order, so
    # dst = src + shift(block), shift repeated per byte
    shift_d = (blk_off + bhdr) - csum_d[blk_starts]
    dst_d = np.repeat(shift_d, blk_dsize) + np.arange(d_bytes.size)
    out[dst_d] = d_bytes
    shift_t = (blk_off + bhdr + blk_dsize) - csum_t[blk_starts]
    dst_t = np.repeat(shift_t, blk_tsize) + np.arange(t_bytes.size)
    out[dst_t] = t_bytes

    buf = out.tobytes()
    return [buf[seg_offs[i]:seg_offs[i + 1]] for i in range(n_segs)]


def decode_postings(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Full decode → (doc_ids uint64 ascending, tfs uint64)."""
    version, _flags, block_size, n = _HEADER.unpack_from(payload, 0)
    assert version == _VERSION
    buf = np.frombuffer(payload, dtype=np.uint8)
    off = _HEADER.size
    doc_chunks, tf_chunks = [], []
    prev_last = np.uint64(0)
    got = 0
    while got < n:
        nb_d, nb_t, _last, _mx = _BLOCK_HDR.unpack_from(payload, off)
        off += _BLOCK_HDR.size
        deltas = varint_decode(buf[off:off + nb_d])
        off += nb_d
        btfs = varint_decode(buf[off:off + nb_t])
        off += nb_t
        docs = np.cumsum(deltas, dtype=np.uint64) + prev_last
        prev_last = docs[-1]
        doc_chunks.append(docs)
        tf_chunks.append(btfs)
        got += docs.size
    if not doc_chunks:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    return np.concatenate(doc_chunks), np.concatenate(tf_chunks)


def block_directory(payload: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Skip-list view without decoding blocks:
    (block_byte_offsets, block_counts, last_doc_ids, max_tfs)."""
    _v, _f, block_size, n = _HEADER.unpack_from(payload, 0)
    off = _HEADER.size
    offsets, counts, lasts, maxtfs = [], [], [], []
    got = 0
    while got < n:
        nb_d, nb_t, last, mx = _BLOCK_HDR.unpack_from(payload, off)
        cnt = min(block_size, n - got)
        offsets.append(off)
        counts.append(cnt)
        lasts.append(last)
        maxtfs.append(mx)
        off += _BLOCK_HDR.size + nb_d + nb_t
        got += cnt
    return (np.asarray(offsets, dtype=np.int64),
            np.asarray(counts, dtype=np.int64),
            np.asarray(lasts, dtype=np.uint64),
            np.asarray(maxtfs, dtype=np.uint64))


def decode_block(payload: bytes, block_offset: int,
                 prev_last_doc: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single block given its byte offset and the previous block's
    last doc_id (0 for the first block)."""
    nb_d, nb_t, _last, _mx = _BLOCK_HDR.unpack_from(payload, block_offset)
    buf = np.frombuffer(payload, dtype=np.uint8)
    s = block_offset + _BLOCK_HDR.size
    deltas = varint_decode(buf[s:s + nb_d])
    btfs = varint_decode(buf[s + nb_d:s + nb_d + nb_t])
    docs = np.cumsum(deltas, dtype=np.uint64) + np.uint64(prev_last_doc)
    return docs, btfs


def merge_encoded(payloads: list[bytes], block_size: int = 128) -> bytes:
    """Merge several encoded posting runs of the SAME term into one list.

    Compaction helper (e.g. merging doc-range segments into fewer cells):
    runs over disjoint doc ranges concatenate; a doc_id appearing in
    several runs (merge across partial builds) gets its tfs summed —
    reference sum_duplicates semantics (build_tfidf.py:142).
    """
    docs_all, tfs_all = [], []
    for p in payloads:
        d, t = decode_postings(p)
        docs_all.append(d)
        tfs_all.append(t)
    docs = np.concatenate(docs_all)
    tfs = np.concatenate(tfs_all)
    order = np.argsort(docs, kind="stable")
    docs, tfs = docs[order], tfs[order]
    if docs.size:
        uniq_mask = np.concatenate(([True], docs[1:] != docs[:-1]))
        idx = np.flatnonzero(uniq_mask)
        summed = np.add.reduceat(tfs, idx)
        docs = docs[idx]
        tfs = summed
    return encode_postings(docs, tfs, block_size)
