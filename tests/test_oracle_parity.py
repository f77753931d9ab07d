"""Mimics the driver's correctness gate: run every oracle-checked
query on Spark AND its DuckDB oracle SQL at sf0.01, compare row count,
column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


CHECKED = sorted(entry.oracle_sql().keys())


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, duck, name):
    q = entry.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    a = _canon(spark_cols, spark_rows)
    b = _canon(duck_cols, duck_rows)
    mismatches = sum(1 for x, y in zip(a, b) if x != y)
    assert mismatches == 0, f"{name}: {mismatches}/{len(a)} rows differ; first: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None)
    )


def test_every_query_has_oracle_or_is_extraction():
    qs = entry.queries()
    unchecked = set(qs) - set(entry.oracle_sql())
    assert all(k.startswith("ocr_") for k in unchecked), unchecked


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
