"""word2doc_spark — a PySpark-native inverted-index + BM25 retrieval engine.

A from-scratch re-expression of the retrieval capabilities of
jundl77/word2doc (DrQA-style hashed-ngram TF-IDF retriever, see
/root/reference/src/word2doc/retriever/) as an idiomatic Spark engine:

* corpus = DataFrame of Common-Crawl-style pages
  ``(url, warc_ts, html, text, lang)``
* index build = DataFrame pipeline: extract → vectorized analyze UDF →
  (term_id, doc-range) keyed encode → delta+varint posting SEGMENTS in
  term-sharded parquet + terms/doclen stats + manifest (doc-range
  segmentation is the explicit head-term salting)
* query = exact DataFrame join/agg path (goldens twin), or
  doc-partitioned DAAT — vectorized "fast" or block-max WAND — scoring
  segments where their doc range lives, per-range heap-k, exact merge

Nothing here is a port of the reference's execution machinery; the
reference defines WHAT to compute (tokenization, hashing, scoring
semantics — see ``word2doc_spark.oracle``), Spark defines HOW.
"""

__version__ = "0.2.0"

from word2doc_spark.config import IndexConfig  # noqa: F401
