"""Engine configuration.

Defaults mirror the reference CLI defaults
(/root/reference/src/build-doc-retriever-model.py:30-37): ngram=2,
hash_size=2^24, SimpleTokenizer analyzer.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class IndexConfig:
    # --- analysis (reference parity; changing these changes term_ids) ---
    ngram: int = 2              # all n-grams of length 1..ngram
    hash_size: int = 2 ** 24    # feature-hash buckets (murmur3_32 % hash_size)
    analyzer: str = "simple"    # only 'simple' implemented (reference default)

    # --- scoring ---
    score_mode: str = "drqa"    # 'drqa' (reference formula) | 'bm25'
    k1: float = 1.2             # bm25 only
    b: float = 0.75             # bm25 only

    # --- physical layout ---
    block_size: int = 128       # postings per block (block-max WAND skip unit)
    num_shards: int = 32        # posting shards = hash partitions of term_id
    # head-term salting: terms with df >= salt_df_threshold are built in
    # salt_factor range-buckets of doc_id and concatenated in a 2nd phase.
    salt_df_threshold: int = 100_000
    salt_factor: int = 16

    # bookkeeping (bump on any stats/layout semantic change — the build
    # fingerprint includes it, so stale indexes rebuild; v2: avgdl over N)
    version: int = 2
    extras: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "IndexConfig":
        known = {f for f in IndexConfig.__dataclass_fields__}
        return IndexConfig(**{k: v for k, v in d.items() if k in known})
