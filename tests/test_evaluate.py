"""EP2 evaluation job (operators/evaluate.py): the IoU-argmax pairing
rule against hand-computed cases, and the rollup invariants. The
numeric parity vs DuckDB is in test_oracle_parity.py (eval_iou_pairs /
eval_metrics); these tests pin the reference semantics directly:
strict-first-max pairing, the >0.5 accept boundary, the residual
'*'-strip equivalence, matched-only denominators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import evaluate as ev

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


GOLD_SCHEMA = (
    "doc_id long, box_id int, left int, top int, right int, bottom int, "
    "classes string, label string, state string"
)
PRED_SCHEMA = (
    "doc_id long, pred_id int, left int, top int, right int, bottom int, "
    "output string, state string"
)


def test_iou_argmax_hand_case(spark):
    """One gold box, three predictions: exact overlap wins; a tie on
    rounded IoU resolves to the LOWEST pred_id (the reference's
    strictly-greater scan keeps the first maximum,
    evaluate_data.py:126-131)."""
    gold = _df(spark, [(1, 0, 0, 0, 100, 40, "=", "1+1=2", "right")], GOLD_SCHEMA)
    pred = _df(
        spark,
        [
            (1, 7, 0, 0, 100, 40, "1+1=2", "right"),   # iou 1.0
            (1, 3, 0, 0, 100, 40, "1+1=3", "error"),   # iou 1.0 tie, lower id
            (1, 9, 500, 500, 600, 540, "x", "right"),  # iou 0
        ],
        PRED_SCHEMA,
    )
    rows = ev.iou_argmax_pairs(gold, pred).collect()
    assert len(rows) == 1
    assert rows[0]["pair_id"] == 3
    assert rows[0]["iou"] == 1.0


def test_iou_accept_boundary_is_strict(spark):
    """IoU exactly 0.5 is REJECTED (reference: max_iou > 0.5). Boxes of
    equal size offset by exactly 1/3 of their width give IoU = 1/3;
    nested boxes give intersection/union = a1/a2 — construct IoU=0.5
    via a half-area sub-box."""
    gold = _df(spark, [(1, 0, 0, 0, 100, 40, "=", "x", "right")], GOLD_SCHEMA)
    # pred is the left half: inter = 50*40, union = 100*40 -> iou 0.5
    pred = _df(spark, [(1, 0, 0, 0, 50, 40, "x", "right")], PRED_SCHEMA)
    row = ev.iou_argmax_pairs(gold, pred).first()
    assert row["iou"] == 0.5
    assert row["pair_id"] == -1


def test_residual_star_strip_equivalence(spark):
    """'...'-class sequences count as right when they differ only by
    '*' (reference evaluate_data.py:168); other classes do not."""
    gold = _df(
        spark,
        [
            (1, 0, 0, 0, 100, 40, "...", "7÷2=3*1", "right"),
            (2, 0, 0, 0, 100, 40, "=", "1*1=1", "right"),
        ],
        GOLD_SCHEMA,
    )
    pred = _df(
        spark,
        [
            (1, 0, 0, 0, 100, 40, "7÷2=31", "right"),  # '*' stripped: right
            (2, 0, 0, 0, 100, 40, "11=1", "right"),    # '=' class: wrong
        ],
        PRED_SCHEMA,
    )
    m = ev.evaluate_tables(gold, pred).first()
    assert m["residual_acc"] == 1.0
    assert m["equation_acc"] == 0.0
    assert m["seq_acc"] == 0.5


def test_matched_only_denominators(spark):
    """Per-class and state denominators count only MATCHED boxes; the
    recall denominator counts ALL gold boxes (evaluate_data.py:142-186:
    *_all incremented only inside the pair != -1 branch)."""
    gold = _df(
        spark,
        [
            (1, 0, 0, 0, 100, 40, "=", "1+1=2", "right"),
            (1, 1, 200, 0, 300, 40, "=", "2+2=4", "right"),  # no pred near
        ],
        GOLD_SCHEMA,
    )
    pred = _df(spark, [(1, 0, 0, 0, 100, 40, "1+1=2", "right")], PRED_SCHEMA)
    m = ev.evaluate_tables(gold, pred).first()
    assert m["n_boxes"] == 2 and m["n_matched"] == 1
    assert m["equation_acc"] == 1.0  # 1/1 matched, not 1/2
    assert m["recall"] == 0.5
    assert m["char_acc"] == 1.0


def test_predless_doc_counts_in_recall(spark):
    """A document with ZERO prediction rows (total detection failure on
    a page) must still contribute its gold boxes as unmatched — gold is
    LEFT-joined to pred (ADVICE r2: the old inner join silently shrank
    n_boxes and inflated recall). Reference evaluate_data.py
    get_pair/statistic_data counts every gold box in all_num."""
    gold = _df(
        spark,
        [
            (1, 0, 0, 0, 100, 40, "=", "1+1=2", "right"),
            (2, 0, 0, 0, 100, 40, "=", "2+2=4", "right"),   # doc 2: no preds
            (2, 1, 200, 0, 300, 40, "()", "1+()=3", "right"),
        ],
        GOLD_SCHEMA,
    )
    pred = _df(spark, [(1, 0, 0, 0, 100, 40, "1+1=2", "right")], PRED_SCHEMA)
    pairs = {(r["doc_id"], r["box_id"]): r for r in
             ev.iou_argmax_pairs(gold, pred).collect()}
    assert len(pairs) == 3
    assert pairs[(2, 0)]["pair_id"] == -1 and pairs[(2, 0)]["iou"] == 0.0
    assert pairs[(2, 1)]["pair_id"] == -1 and pairs[(2, 1)]["iou"] == 0.0
    m = ev.evaluate_tables(gold, pred).first()
    assert m["n_boxes"] == 3 and m["n_matched"] == 1
    assert m["recall"] == pytest.approx(1 / 3, abs=1e-6)
    assert m["equation_acc"] == 1.0  # matched-only denominator unchanged


def test_synthesized_benchmark_shape(spark, docs):
    """The derived benchmark exercises all three classes, both accept
    outcomes, and the spurious-box path; metrics stay in [0, 1]."""
    pairs = ev.eval_iou_pairs(docs)
    assert pairs.where("pair_id = -1").count() > 0
    assert pairs.where("pair_id >= 0").count() > 0
    # spurious far-away detections never win a pairing
    assert pairs.where("pair_id = 99").count() == 0
    g = ev.gold_boxes(docs)
    assert {r["classes"] for r in g.select("classes").distinct().collect()} == {
        "=", "()", "...",
    }
    m = ev.eval_metrics(docs).first()
    for c in ("seq_acc", "equation_acc", "bracket_acc", "residual_acc",
              "state_acc", "char_acc", "recall"):
        assert 0.0 <= m[c] <= 1.0, c
    assert m["n_matched"] == pairs.where("pair_id >= 0").count()


def test_unmatched_rows_keep_best_iou(spark, docs):
    """Rejected pairings still report the best IoU (< 0.5 by
    construction of the dx=160 case)."""
    bad = ev.eval_iou_pairs(docs).where("pair_id = -1")
    assert bad.where(F.col("iou") > 0.5).count() == 0
