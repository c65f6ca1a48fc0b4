"""Evaluation ops (D7/D8 parity), SQuAD source (A10), label extractor (C10)."""

import json

import pytest
import pyspark.sql.functions as F

from word2doc_spark.ops.evaluation import (
    first_paragraph_label, mean_average_precision, topk_accuracy,
)
from word2doc_spark.sources.squad import dedup_substring_questions, squad_queries


def test_topk_accuracy(spark):
    results = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"),      # label a → hit@1
         (2, 1, "x"), (2, 2, "y"), (2, 6, "z"),  # label z → hit@6
         (3, 1, "q")],                  # label m → never hit
        "query_id long, rank int, url string")
    labels = spark.createDataFrame(
        [(1, "a"), (2, "z"), (3, "m"), (4, "n")],  # q4 has no results
        "query_id long, label_url string")
    row = topk_accuracy(results, labels, ks=(1, 5, 10)).collect()[0]
    assert row["n_queries"] == 4
    assert row["acc_at_1"] == 0.25       # only q1
    assert row["acc_at_5"] == 0.25       # q2 hits at rank 6
    assert row["acc_at_10"] == 0.5       # q1 + q2


def test_map(spark):
    # q1: relevant docs at ranks 1 and 3 → AP = (1/1 + 2/3)/2 = 0.8333
    # q2: relevant doc at rank 2 → AP = 0.5 ; MAP = 0.666667
    results = spark.createDataFrame(
        [(1, 1, "r1"), (1, 2, "x"), (1, 3, "r2"),
         (2, 1, "y"), (2, 2, "r3")],
        "query_id long, rank int, url string")
    relevant = spark.createDataFrame(
        [(1, "r1"), (1, "r2"), (2, "r3")], "query_id long, url string")
    row = mean_average_precision(results, relevant).collect()[0]
    assert row["n_queries"] == 2
    assert abs(row["map"] - round((0.833333 + 0.5) / 2, 6)) < 1e-5


def test_first_paragraph_label(spark):
    long_p = "x" * 120
    docs = spark.createDataFrame(
        [(0, f"short\n\n{long_p}\n\ntail"),
         (1, "only\n\nshort\n\nparagraphs"),
         (2, long_p)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["label"]
           for r in first_paragraph_label(docs).collect()}
    assert got[0] == long_p          # first ≥100-char paragraph
    assert got[1] == "only"          # fallback: first non-empty
    assert got[2] == long_p


@pytest.fixture()
def squad_file(tmp_path):
    doc = {"version": "1.1", "data": [
        {"title": "Spark", "paragraphs": [
            {"context": "ctx", "qas": [
                {"id": "q1", "question": "what is a shuffle?", "answers": []},
                {"id": "q2", "question": "what is a shuffle? exactly",
                 "answers": []},
            ]},
        ]},
        {"title": "Crawl", "paragraphs": [
            {"context": "ctx2", "qas": [
                {"id": "q3", "question": "how does fetch work?",
                 "answers": []},
            ]},
        ]},
    ]}
    p = tmp_path / "squad.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_squad_scan(spark, squad_file):
    q = squad_queries(spark, squad_file)
    rows = {r["squad_id"]: r for r in q.collect()}
    assert len(rows) == 3
    assert rows["q1"]["label"] == "Spark"
    assert rows["q3"]["label"] == "Crawl"
    ids = sorted(r["query_id"] for r in rows.values())
    assert ids == [0, 1, 2]


def test_squad_substring_dedup(spark, squad_file):
    q = squad_queries(spark, squad_file)
    kept = dedup_substring_questions(q)
    got = {r["squad_id"] for r in kept.collect()}
    # q2 contains q1's question as a substring → q2 dropped, q1 kept
    assert got == {"q1", "q3"}
