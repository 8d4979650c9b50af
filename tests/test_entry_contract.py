"""Replicates the driver's CORRECTNESS gate: every queries() entry with an
oracle_sql() entry must match DuckDB on row count, column names, and
order-insensitive values at sf=0.01; rows-only entries must run and return
a stable schema."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(rows, cols):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


@pytest.fixture(scope="module")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = _duck(sf_dir)
    yield con
    con.close()


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(ALL_QUERIES)


def test_every_entry_oracle_gated_or_explicitly_rows_only():
    """Lockstep: a queries() entry must have an oracle_sql() row OR be
    named in rows_only() — never silently unverified (an entry that is
    in neither would reach the driver's correctness run unchecked)."""
    marked = entrymod.rows_only()
    assert marked.isdisjoint(ORACLES), marked & set(ORACLES)
    uncovered = set(ALL_QUERIES) - set(ORACLES) - marked
    assert not uncovered, f"entries with no oracle and no rows_only marker: {sorted(uncovered)}"
    stale = marked - set(ALL_QUERIES)
    assert not stale, f"rows_only names without a queries() entry: {sorted(stale)}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = ALL_QUERIES[name](spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    _, s_norm = _normalize(spark_rows, spark_cols)
    _, d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:5]
    assert s_norm == d_norm, f"{name}: first mismatches {mismatches}"


@pytest.mark.parametrize(
    "name", sorted(set(ALL_QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
