"""Distributed, resumable inverted-index build.

Pipeline (SURVEY.md §7.0), all DataFrame-declarative except the two
Arrow-UDF stages (analysis, posting encode):

    pages ──extract──▶ (url, text)
          ──assign_doc_ids──▶ (doc_id, url, text)          [docs stage]
          ──analyze mapInPandas──▶ (doc_id, term_id, tf)
          ──write partitioned by shard_id=pmod(term_id,S)──▶ stage/terms
    per shard (independent, resumable job):
          read stage/terms/shard_id=K      (partition-pruned scan)
          split head/tail terms by df      (broadcast head set)
          tail: repartition(term_id) → sort → run-encode   (1 shuffle)
          head: salt by doc_id range → partial encode → merge (2-phase)
          write shards/shard_id=K (term_id, df, n_postings, payload)
          manifest/shard_K.json   (lineage fingerprint + metrics)
    publish: manifest/config.json (N, avgdl, totals)

Skew: AQE splits skewed *joins* but not skewed aggregations; head terms
(df ≥ salt_df_threshold) therefore get explicit doc_id-range salting —
partial posting runs per salt bucket are disjoint sorted ranges, so the
phase-2 merge is a cheap concat+reencode (SURVEY.md §4.1).

Resume: every stage writes an atomic manifest marker keyed by a build
fingerprint; a rerun skips completed stages/shards without recomputing
(north rule: checkpointed shards, per-partition lineage + metrics).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from word2doc_spark.config import IndexConfig
from word2doc_spark.index.analyze import extracted_docs
from word2doc_spark.index.manifest import Manifest
from word2doc_spark.index.postings import encode_postings, merge_encoded

SHARD_SCHEMA = "term_id long, df long, n_postings long, payload binary"


def _fingerprint(config: IndexConfig, input_token: str) -> str:
    blob = json.dumps({"config": config.to_dict(), "input": input_token},
                      sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


# ---------------------------------------------------------------------------
# posting-run encoding over partition-sorted term runs
# ---------------------------------------------------------------------------

def _encode_runs(key_cols: list[str], block_size: int):
    """mapInPandas generator factory: input sorted by key_cols + doc_id
    within each partition; encodes each key run into one posting payload.
    Buffers the partition-boundary run across Arrow batches."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None

        def encode_block(pdf: pd.DataFrame, flush_all: bool):
            nonlocal carry
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                return None
            keys = pdf[key_cols[0]].to_numpy()
            if len(key_cols) > 1:
                # composite key: factorize pairwise (term_id, salt)
                salt = pdf[key_cols[1]].to_numpy()
                change = np.concatenate(
                    ([True], (keys[1:] != keys[:-1]) | (salt[1:] != salt[:-1])))
            else:
                change = np.concatenate(([True], keys[1:] != keys[:-1]))
            starts = np.flatnonzero(change)
            if not flush_all:
                if len(starts) == 1:
                    carry = pdf
                    return None
                last_start = starts[-1]
                carry = pdf.iloc[last_start:]
                pdf = pdf.iloc[:last_start]
                starts = starts[:-1]
            ends = np.concatenate((starts[1:], [len(pdf)]))
            docs = pdf["doc_id"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            out_rows = {
                "term_id": pdf[key_cols[0]].to_numpy()[starts],
                "df": (ends - starts).astype(np.int64),
                "n_postings": (ends - starts).astype(np.int64),
                "payload": [
                    encode_postings(docs[s:e], tfs[s:e], block_size)
                    for s, e in zip(starts, ends)
                ],
            }
            if len(key_cols) > 1:
                out_rows["salt"] = pdf[key_cols[1]].to_numpy()[starts]
            return pd.DataFrame(out_rows)

        for pdf in it:
            out = encode_block(pdf, flush_all=False)
            if out is not None and len(out):
                yield out
        if carry is not None and len(carry):
            out = encode_block(pd.DataFrame(columns=carry.columns), flush_all=True)
            if out is not None and len(out):
                yield out

    return gen


def _encode_term_runs(terms: DataFrame, config: IndexConfig,
                      shuffle_partitions: int) -> DataFrame:
    """(doc_id, term_id, tf) → (term_id, df, n_postings, payload)."""
    sorted_terms = (
        terms.repartition(shuffle_partitions, "term_id")
        .sortWithinPartitions("term_id", "doc_id")
    )
    return sorted_terms.mapInPandas(
        _encode_runs(["term_id"], config.block_size), schema=SHARD_SCHEMA)


def _encode_salted(terms: DataFrame, config: IndexConfig, n_docs: int,
                   shuffle_partitions: int) -> DataFrame:
    """Two-phase build for head terms: salt = doc_id range bucket."""
    s = config.salt_factor
    bucket = max(1, (n_docs + s - 1) // s)
    salted = terms.withColumn("salt", (F.col("doc_id") / bucket).cast("int"))
    partial = (
        salted.repartition(shuffle_partitions, "term_id", "salt")
        .sortWithinPartitions("term_id", "salt", "doc_id")
        .mapInPandas(_encode_runs(["term_id", "salt"], config.block_size),
                     schema=SHARD_SCHEMA + ", salt int")
    )

    block_size = config.block_size

    def merge(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None

        def flush(pdf: pd.DataFrame, flush_all: bool):
            nonlocal carry
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                return None
            keys = pdf["term_id"].to_numpy()
            change = np.concatenate(([True], keys[1:] != keys[:-1]))
            starts = np.flatnonzero(change)
            if not flush_all:
                if len(starts) == 1:
                    carry = pdf
                    return None
                carry = pdf.iloc[starts[-1]:]
                pdf = pdf.iloc[:starts[-1]]
                starts = starts[:-1]
            ends = np.concatenate((starts[1:], [len(pdf)]))
            rows = []
            for s0, e0 in zip(starts, ends):
                grp = pdf.iloc[s0:e0].sort_values("salt")
                payload = merge_encoded(list(grp["payload"]), block_size)
                n_post = int(grp["n_postings"].sum())
                rows.append((int(grp["term_id"].iloc[0]), n_post, n_post, payload))
            return pd.DataFrame(rows, columns=["term_id", "df", "n_postings",
                                               "payload"])

        for pdf in it:
            out = flush(pdf, flush_all=False)
            if out is not None and len(out):
                yield out
        if carry is not None and len(carry):
            out = flush(pd.DataFrame(columns=carry.columns), flush_all=True)
            if out is not None and len(out):
                yield out

    merged = (
        partial.repartition(shuffle_partitions, "term_id")
        .sortWithinPartitions("term_id", "salt")
        .mapInPandas(merge, schema=SHARD_SCHEMA)
    )
    return merged


# ---------------------------------------------------------------------------
# build driver
# ---------------------------------------------------------------------------

def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    config: IndexConfig | None = None,
    lang_filter: str | None = None,
    input_token: str = "default",
    shuffle_partitions: int | None = None,
    preprocess=None,
) -> dict:
    """Build (or resume) an index at ``index_dir``. Returns build metrics."""
    config = config or IndexConfig()
    manifest = Manifest(index_dir)
    fp = _fingerprint(config, input_token)
    sp = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    metrics: dict = {"fingerprint": fp, "resumed_stages": []}
    t_start = time.time()

    docs_path = os.path.join(index_dir, "docs")
    stage_path = os.path.join(index_dir, "stage", "terms")
    doclen_path = os.path.join(index_dir, "doclen")
    shards_path = os.path.join(index_dir, "shards")

    # -- stage 1+2: docs + staged terms ---------------------------------
    # One python stage per action: the url-sorted cached corpus feeds
    # (a) a narrow ids-only pass → docs(doc_id, url) and (b) a combined
    # ids+analyze pass → (doc_id, term_id, tf). Chaining separate
    # id-assignment and analysis UDF stages in one task doubles the
    # concurrent python-worker count per core — measurably anti-scales.
    n_docs = None
    if manifest.has_marker("stage", fp):
        metrics["resumed_stages"].append("stage")
        n_docs = manifest.read_marker("stage").get("n_docs")
    else:
        from pyspark import StorageLevel
        t0 = time.time()
        ext = extracted_docs(pages, lang_filter, preprocess=preprocess)
        ranged = (ext.repartitionByRange(sp, "url")
                     .sortWithinPartitions("url")
                     .withColumn("_pid", F.spark_partition_id())
                     .persist(StorageLevel.MEMORY_AND_DISK))
        counts = {r["_pid"]: r["cnt"] for r in
                  ranged.groupBy("_pid").agg(F.count("*").alias("cnt"))
                        .collect()}
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        n_docs = acc

        def ids_only(it):
            import pandas as pd  # noqa: F811
            pos = None
            for pdf in it:
                if len(pdf) == 0:
                    continue
                if pos is None:
                    pos = offsets[int(pdf["_pid"].iloc[0])]
                yield pd.DataFrame({
                    "doc_id": range(pos, pos + len(pdf)),
                    "url": pdf["url"],
                })
                pos += len(pdf)

        (ranged.select("url", "_pid")
               .mapInPandas(ids_only, "doc_id long, url string")
               .write.mode("overwrite").parquet(docs_path))

        ngram, hash_size = config.ngram, config.hash_size

        def ids_and_analyze(it):
            import numpy as np  # noqa: F811
            import pandas as pd  # noqa: F811
            from word2doc_spark.functions.tokenize import Analyzer
            analyzer = Analyzer(ngram=ngram, hash_size=hash_size)
            pos = None
            for pdf in it:
                if len(pdf) == 0:
                    continue
                if pos is None:
                    pos = offsets[int(pdf["_pid"].iloc[0])]
                texts = pdf["text"].fillna("").tolist()
                term_lists, tf_lists = analyzer.analyze_batch(texts)
                lens = np.fromiter((t.size for t in term_lists),
                                   dtype=np.int64, count=len(term_lists))
                doc_ids = np.repeat(
                    np.arange(pos, pos + len(pdf), dtype=np.int64), lens)
                pos += len(pdf)
                if lens.sum() == 0:
                    continue
                yield pd.DataFrame({
                    "doc_id": doc_ids,
                    "term_id": np.concatenate(term_lists),
                    "tf": np.concatenate(tf_lists).astype(np.int32),
                })

        terms = (ranged.select("text", "_pid")
                 .mapInPandas(ids_and_analyze, "doc_id long, term_id long, tf int")
                 .withColumn("shard_id",
                             F.pmod(F.col("term_id"), F.lit(config.num_shards))))
        (terms.write.mode("overwrite")
              .partitionBy("shard_id").parquet(stage_path))
        # doc lengths (bm25 dl): one cheap agg over the staged terms
        staged = spark.read.parquet(stage_path)
        (staged.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
               .write.mode("overwrite").parquet(doclen_path))
        ranged.unpersist()
        manifest.write_marker("stage", fp, wall_s=time.time() - t0,
                              n_docs=n_docs)

    if n_docs is None:
        n_docs = spark.read.parquet(docs_path).count()

    # -- stage 3: per-shard encode (independent, resumable) --------------
    done = manifest.completed_shards(fp)
    staged_all = spark.read.parquet(stage_path)
    todo = [s for s in range(config.num_shards) if s not in done]
    metrics["resumed_stages"].extend(
        f"shard_{s}" for s in range(config.num_shards) if s in done)

    # head terms (df ≥ threshold) detected ONCE over all pending shards —
    # a single partial-aggregated count job; the head set is tiny by
    # construction (only degenerate corpora have many ultra-common terms)
    head_by_shard: dict[int, list[int]] = {s: [] for s in todo}
    if todo:
        head_rows = (
            staged_all.filter(F.col("shard_id").isin(todo))
            .groupBy("shard_id", "term_id")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") >= config.salt_df_threshold)
            .select("shard_id", "term_id").collect())
        for r in head_rows:
            head_by_shard[r["shard_id"]].append(r["term_id"])

    for shard_id in todo:
        t0 = time.time()
        shard_terms = staged_all.filter(F.col("shard_id") == shard_id) \
                                .select("doc_id", "term_id", "tf")
        head_ids = head_by_shard[shard_id]
        if head_ids:
            tail = shard_terms.filter(~F.col("term_id").isin(head_ids))
            head = shard_terms.filter(F.col("term_id").isin(head_ids))
            encoded = _encode_term_runs(tail, config, sp).unionByName(
                _encode_salted(head, config, n_docs, sp))
        else:
            encoded = _encode_term_runs(shard_terms, config, sp)
        encoded = encoded.persist()
        out = os.path.join(shards_path, f"shard_id={shard_id}")
        encoded.write.mode("overwrite").parquet(out)
        srows = encoded.agg(
            F.count("*").alias("terms"), F.sum("n_postings").alias("postings"),
            F.sum(F.length("payload")).alias("bytes")).collect()[0]
        encoded.unpersist()
        manifest.write_shard(
            shard_id, fp,
            n_terms=srows["terms"], n_postings=int(srows["postings"] or 0),
            bytes=int(srows["bytes"] or 0), n_head_terms=len(head_ids),
            wall_s=time.time() - t0,
        )

    # -- stage 4: publish -------------------------------------------------
    shard_rows = manifest.shard_metrics()
    doclen = spark.read.parquet(doclen_path)
    # avgdl over ALL N docs — docs whose text yields zero kept terms have
    # dl = 0 and are absent from doclen rows but still count in the mean
    agg = doclen.agg(F.sum("dl").alias("total_dl")).collect()[0]
    stats = {
        "n_docs": n_docs,
        "avgdl": (float(agg["total_dl"] or 0) / n_docs) if n_docs else 0.0,
        "n_terms": sum(r["n_terms"] for r in shard_rows),
        "n_postings": sum(r["n_postings"] for r in shard_rows),
        "index_bytes": sum(r["bytes"] for r in shard_rows),
        "input_token": input_token,
        "fingerprint": fp,
    }
    manifest.publish(config, **stats)
    metrics.update(stats)
    metrics["wall_s"] = time.time() - t_start
    return metrics
