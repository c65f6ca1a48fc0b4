"""MurmurHash3 x86_32 — pure-numpy, vectorized over many tokens at once.

Feature hashing contract of the reference
(/root/reference/src/word2doc/retriever/utils.py:75-77):
``hash(token) = murmurhash3_32(token, positive=True) % num_buckets`` where
murmurhash3_32 is sklearn's binding of Austin Appleby's public-domain
MurmurHash3_x86_32 over the token's UTF-8 bytes with seed 0, returned as an
unsigned 32-bit value.  sklearn/mmh3 are not available here, so we implement
the public algorithm directly; ``murmurhash3_32`` is the scalar reference and
``murmurhash3_batch`` a vectorized form used inside Arrow UDFs (no per-row
Python hashing in the hot path — all block mixing is numpy array ops).
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xCC9E2D51)
_C2 = np.uint64(0x1B873593)
_M32 = np.uint64(0xFFFFFFFF)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return ((x << np.uint64(r)) | (x >> np.uint64(32 - r))) & _M32


def murmurhash3_32(data: bytes | str, seed: int = 0) -> int:
    """Scalar MurmurHash3_x86_32, unsigned. Bit-identical to the public
    reference implementation (and hence sklearn's positive=True)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    h = seed & 0xFFFFFFFF
    c1, c2 = 0xCC9E2D51, 0x1B873593
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4:i * 4 + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[nblocks * 4:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def murmurhash3_batch(tokens: list[str] | list[bytes], seed: int = 0) -> np.ndarray:
    """Vectorized MurmurHash3_x86_32 over a batch of tokens.

    Returns uint64 array of unsigned 32-bit hashes. The loop runs over the
    max *block count* (~len/4), not over tokens: each iteration mixes one
    4-byte block for every token simultaneously.
    """
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = [t.encode("utf-8") if isinstance(t, str) else t for t in tokens]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    width = ((maxlen + 3) // 4 + 1) * 4  # ≥1 spare uint32 for tail reads
    flat = np.zeros(n * width, dtype=np.uint8)
    # single pass to fill the padded matrix (bytes-level, not per-byte python)
    mat = flat.reshape(n, width)
    for i, b in enumerate(bufs):
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    blocks = mat.view("<u4").astype(np.uint64)  # (n, width//4)

    h = np.full(n, seed & 0xFFFFFFFF, dtype=np.uint64)
    nblocks = (lens // 4).astype(np.int64)
    max_blocks = int(nblocks.max())
    for j in range(max_blocks):
        active = nblocks > j
        k = blocks[:, j]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        hj = h ^ k
        hj = _rotl32(hj, 13)
        hj = (hj * np.uint64(5) + np.uint64(0xE6546B64)) & _M32
        h = np.where(active, hj, h)

    tail_len = (lens % 4).astype(np.uint64)
    tail_block = np.take_along_axis(blocks, nblocks[:, None], axis=1)[:, 0]
    # keep only the tail bytes (padding is zeros, but mask anyway for safety)
    tail_mask = (np.uint64(1) << (tail_len * np.uint64(8))) - np.uint64(1)
    k = tail_block & tail_mask
    k = (k * _C1) & _M32
    k = _rotl32(k, 15)
    k = (k * _C2) & _M32
    h = np.where(tail_len > 0, h ^ k, h)

    h ^= lens.astype(np.uint64)
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & _M32
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & _M32
    h ^= h >> np.uint64(16)
    return h


class TermHashCache:
    """Executor-lifetime gram→term_id cache. Web text is Zipfian, so most
    grams repeat; hashing only cache misses (in one vectorized batch) keeps
    the Python-side cost per Arrow batch near the dict-lookup floor."""

    def __init__(self, hash_size: int, max_entries: int = 2_000_000):
        self.hash_size = hash_size
        self.max_entries = max_entries
        self._cache: dict[str, int] = {}

    def lookup(self, grams: list[str]) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(grams), dtype=np.int64)
        misses: list[str] = []
        miss_idx: list[int] = []
        for i, g in enumerate(grams):
            v = cache.get(g, -1)
            if v < 0:
                misses.append(g)
                miss_idx.append(i)
            else:
                out[i] = v
        if misses:
            if len(misses) < 32:
                # tiny miss batches: scalar loop beats numpy setup overhead
                hashed = np.fromiter(
                    (murmurhash3_32(m) % self.hash_size for m in misses),
                    dtype=np.int64, count=len(misses))
            else:
                hashed = (murmurhash3_batch(misses)
                          % np.uint64(self.hash_size)).astype(np.int64)
            out[np.asarray(miss_idx, dtype=np.int64)] = hashed
            if len(cache) < self.max_entries:
                for g, v in zip(misses, hashed.tolist()):
                    cache[g] = v
        return out
