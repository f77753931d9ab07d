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


def test_corpus_schema(spark):
    docs = corpus_df(spark, 10, partitions=2)
    schema = docs.schema.simpleString()
    assert (
        schema
        == "struct<doc_id:string,spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>>"
    )
