"""Driver-contract smoke: entry() runs, queries() are callable, oracle_sql()
keys ⊆ queries() keys, and a sampled SQL-twin query matches DuckDB here
(the full sweep lives in scripts/check_entry.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_contract_shape():
    qs = E.queries()
    os_ = E.oracle_sql()
    assert len(qs) >= 15
    assert set(os_).issubset(set(qs))
    # every oracle is non-trivial SQL
    for name, sql in os_.items():
        assert "SELECT" in sql.upper(), name


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "rank", "url", "score"}


@pytest.mark.parametrize("name", ["tf_per_doc", "corpus_stats", "lang_id"])
def test_sql_twin_sample(spark, name):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    sdf = E.queries()[name](spark, SF)
    want = con.sql(E.oracle_sql()[name])
    scols = [c.lower() for c in sdf.columns]
    ocols = [c.lower() for c in want.columns]
    assert sorted(scols) == sorted(ocols)

    def norm(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = []
            for i in order:
                v = r[i]
                vals.append(f"{v:.9g}" if isinstance(v, float) else str(v))
            out.append("|".join(vals))
        return sorted(out)

    a = norm(scols, [tuple(r) for r in sdf.collect()])
    b = norm(ocols, want.fetchall())
    assert a == b
