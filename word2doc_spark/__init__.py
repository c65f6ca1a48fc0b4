"""word2doc_spark — a PySpark-native inverted-index + BM25 retrieval engine.

A from-scratch re-expression of the retrieval capabilities of
jundl77/word2doc (DrQA-style hashed-ngram TF-IDF retriever, see
/root/reference/src/word2doc/retriever/) as an idiomatic Spark engine:

* corpus = DataFrame of Common-Crawl-style pages
  ``(url, warc_ts, html, text, lang)``
* index build = DataFrame pipeline: extract → vectorized analyze UDF →
  salted groupBy(term_id) → delta+varint posting shards + manifest
* query = exact DataFrame join/agg path, or block-max WAND
  document-at-a-time path

Nothing here is a port of the reference's execution machinery; the
reference defines WHAT to compute (tokenization, hashing, scoring
semantics — see ``word2doc_spark.oracle``), Spark defines HOW.
"""

__version__ = "0.1.0"

from word2doc_spark.config import IndexConfig  # noqa: F401
