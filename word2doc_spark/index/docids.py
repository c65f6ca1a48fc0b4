"""Deterministic, scalable doc_id assignment.

Contract: doc_id = position of the url in the globally url-sorted corpus
(the reference enumerates ids in DB order once —
/root/reference/src/word2doc/retriever/build_tfidf.py:83-88; we pin the
order to sorted(url) so ids are reproducible across runs and match the
numpy oracle).

A global ``row_number() OVER (ORDER BY url)`` would serialize through one
partition. Instead: range-repartition by url → sort within partitions →
count per partition (tiny driver-side collect of P longs) → broadcast the
cumulative offsets → per-partition ``offset + arange``. This is the one
intentional total-order barrier in the engine (SURVEY.md §7.2) and scales
as a normal shuffle + O(P) driver state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def assign_doc_ids(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Input: any DataFrame with a unique ``url`` column.
    Output: same columns + ``doc_id`` (long), sorted-by-url dense ids,
    range-partitioned by url (ascending partitions)."""
    n_part = num_partitions or pages.sparkSession.sparkContext.defaultParallelism
    # cache the input so the range-boundary sampling pass doesn't re-run
    # the upstream pipeline (e.g. HTML extraction) a second time
    pages = pages.persist(StorageLevel.MEMORY_AND_DISK)
    ranged = (
        pages.repartitionByRange(n_part, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
    )
    # persist so the count pass and the assignment pass see identical
    # range boundaries (repartitionByRange samples its bounds)
    ranged.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = ranged.schema.fieldNames()
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in ranged.schema.fields if f.name != "_pid"
    ) + ", doc_id long"

    def add_ids(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out["doc_id"] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield out

    result = ranged.mapInPandas(add_ids, schema=out_schema)
    # expose the persisted parents (for caller unpersist) and the already-
    # computed corpus cardinality (saves callers a count job)
    result._w2d_persisted_parent = ranged
    result._w2d_persisted_input = pages
    result._w2d_n_docs = acc
    del fields
    return result
