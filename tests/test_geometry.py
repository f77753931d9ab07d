"""F12 segment-intersection straddle test: hand-computed boundary
cases, a hypothesis gate against the transcribed reference kernel
(tools/oracle.py is_intersec <- layout_analysis_bottom_to_top.py:22-38),
and the table-level prune join."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_spark.operators.geometry import (
    prune_crossing_links,
    seg_intersects,
    synthetic_links,
)
from tools.oracle import is_intersec

_COORD = st.integers(min_value=-50, max_value=50)


def _eval_intersects(spark, cases):
    """cases: list of 8-tuples -> list of bool via the Spark expression."""
    df = spark.createDataFrame(
        [(i, *[int(v) for v in c]) for i, c in enumerate(cases)],
        "id int, x1 long, y1 long, x2 long, y2 long, "
        "x3 long, y3 long, x4 long, y4 long",
    )
    out = df.select(
        "id",
        seg_intersects(
            *[F.col(c) for c in ["x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4"]]
        ).alias("hit"),
    ).collect()
    return [r["hit"] for r in sorted(out, key=lambda r: r["id"])]


def test_straddle_hand_cases(spark):
    cases = [
        (0, 0, 10, 10, 0, 10, 10, 0),      # proper X crossing -> True
        (0, 0, 10, 0, 0, 5, 10, 5),        # parallel horizontals -> False
        (0, 0, 10, 0, 5, 0, 15, 0),        # collinear overlap -> True (<=0)
        (0, 0, 5, 5, 5, 5, 10, 0),         # shared endpoint -> True (<=0)
        (0, 0, 1, 1, 3, 3, 4, 4),          # collinear, disjoint -> False (bbox)
        (0, 0, 0, 10, 1, 5, 9, 5),         # vertical misses edge -> False
        (5, 0, 5, 10, 0, 10, 10, 10),      # endpoint touches edge -> True
    ]
    assert _eval_intersects(spark, cases) == [
        True, False, True, True, False, False, True,
    ]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(*[_COORD] * 8), min_size=1, max_size=24))
def test_straddle_matches_reference_transcription(spark, cases):
    want = [
        bool(is_intersec((c[0], c[1]), (c[2], c[3]), (c[4], c[5]), (c[6], c[7])))
        for c in cases
    ]
    assert _eval_intersects(spark, cases) == want


def test_prune_drops_crossing_links(spark):
    links = spark.createDataFrame(
        [
            ("d1", 0, 5, 0, 5, 100),    # vertical through the box -> pruned
            ("d1", 1, 50, 0, 50, 100),  # vertical right of the box -> kept
            ("d2", 0, 5, 0, 5, 100),    # same segment, boxless doc -> kept
        ],
        "doc_id string, link_id int, x1 long, y1 long, x2 long, y2 long",
    )
    boxes = spark.createDataFrame(
        [("d1", 0, 40, 20, 60)],
        "doc_id string, left long, top long, right long, bottom long",
    )
    out = prune_crossing_links(links, boxes)
    kept = {(r["doc_id"], r["link_id"]) for r in out.collect()}
    assert kept == {("d1", 1), ("d2", 0)}


def test_synthetic_corpus_split_is_nontrivial(spark):
    """On the synthetic geometry both outcomes occur, so the oracle
    hash actually exercises the predicate."""
    from ocr_spark.operators.evaluate import gold_boxes

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    links = synthetic_links(docs)
    kept = prune_crossing_links(
        links, gold_boxes(docs).select("doc_id", "left", "top", "right", "bottom")
    )
    n_links, n_kept = links.count(), kept.count()
    assert 0 < n_kept < n_links
