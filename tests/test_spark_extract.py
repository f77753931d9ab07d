"""End-to-end Spark extraction vs frozen fixtures, plus light/heavy
path equivalence through the real plan (mapInPandas + window)."""

import os

import pyarrow.parquet as pq
import pytest

from ocr_spark.plans.extract import corpus_df, extract

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "expected_spans.parquet")

KEY = ["doc_id", "order"]
COLS = ["doc_id", "order", "kind", "text", "media_ref"]


@pytest.fixture(scope="module")
def expected():
    return (
        pq.read_table(FIXTURES)
        .to_pandas()
        .sort_values(KEY, ignore_index=True)
        .astype({"order": "int32"})
    )


def _run(spark, threshold):
    docs = corpus_df(spark, 400, partitions=8)
    out = extract(docs, heavy_threshold=threshold).toPandas()
    return out.sort_values(KEY, ignore_index=True)[COLS].astype({"order": "int32"})


def test_spark_extract_matches_fixtures(spark, expected):
    out = _run(spark, threshold=16)
    assert len(out) == len(expected)
    for col in COLS:
        assert (out[col] == expected[col]).all(), f"mismatch in {col}"


def test_heavy_path_equivalence(spark, expected):
    """Force most documents through the span-exploded heavy path —
    results must be identical to the fixtures."""
    out = _run(spark, threshold=2)
    assert len(out) == len(expected)
    for col in COLS:
        assert (out[col] == expected[col]).all(), f"mismatch in {col}"


def test_invariants_doc_accounting_is_load_bearing(spark):
    """unaccounted_docs must be 0 on the real output, and must flag a
    silently dropped document (the round-3 gap: the doc count was a
    pass-through literal the oracle reproduced by construction)."""
    from pyspark.sql import functions as F

    from ocr_spark.plans.extract import extract_invariants

    docs = corpus_df(spark, 200, partitions=8)
    out = extract(docs)
    good = extract_invariants(out, docs).first()
    assert good["n_docs_in"] == 200
    assert good["unaccounted_docs"] == 0

    # drop one doc that we know emits output (doc 0 has media spans)
    broken = out.where(F.col("doc_id") != "doc-00000000")
    bad = extract_invariants(broken, docs).first()
    assert bad["unaccounted_docs"] == 1


def test_corpus_schema(spark):
    docs = corpus_df(spark, 10, partitions=2)
    schema = docs.schema.simpleString()
    assert (
        schema
        == "struct<doc_id:string,spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>>"
    )
