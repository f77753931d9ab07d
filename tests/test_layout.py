"""Layout operators vs hand-written box sets, plus a property check:
on random pages the vectorized engine must agree with the sequential
oracle transcription for pairing / forests / fraction retyping."""

import numpy as np
import pytest

from ocr_spark.operators import layout as L

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402


def boxes(*rects):
    return np.array(rects, dtype=np.float64)


def nodes(arr, typ):
    return [L.Node(bbox=arr[i], typ=typ) for i in range(len(arr))]


def test_row_pairs_basic():
    prints = boxes([0, 0, 100, 40])
    hands = boxes([110, 0, 150, 40])  # gap 10 < 100/3.5
    assert L.row_pairs(prints, hands) == {0: 0}


def test_row_pairs_gap_too_wide():
    prints = boxes([0, 0, 100, 40])
    hands = boxes([200, 0, 240, 40])  # gap 100 > 100/3.5
    assert L.row_pairs(prints, hands) == {}


def test_row_pairs_mutual_nearest_dedup():
    # two prints both nearest to one hand -> closer print keeps it
    prints = boxes([0, 0, 100, 40], [0, 50, 110, 90])
    hands = boxes([118, 0, 160, 95])  # vertically contains both prints
    pairs = L.row_pairs(prints, hands)
    assert pairs == {1: 0}  # print 1's right edge is closer


def test_row_pairs_best_pair_shortcircuit():
    # a partially-overlapping box (row-IoU > 0.9, 0.3 < col-IoU < 0.9)
    # wins over a candidate that is nearer by edge distance
    prints = boxes([0, 0, 60, 40])
    hands = boxes(
        [40, 0, 90, 40],  # overlap -> best_pair shortcircuit
        [61, 0, 100, 40],  # nearer by edge distance (1px gap)
    )
    pairs = L.row_pairs(prints, hands)
    assert pairs == {0: 0}


def test_column_pairs_vertical_stack():
    ns = nodes(boxes([0, 0, 100, 40], [5, 60, 95, 100], [300, 300, 400, 340]), "print")
    cp = L.column_pairs(ns)
    assert cp[0] == 1
    assert cp[2] == -1


def test_forests_and_positions():
    ns = nodes(boxes([0, 0, 10, 10], [0, 20, 10, 30], [100, 0, 110, 10]), "print")
    forests = L.build_forests({0: 1, 1: -1, 2: -1}, ns)
    assert len(forests) == 2
    assert forests[0][0].position == (0, 0)
    assert forests[0][1].position == (0, 1)
    assert forests[1][0].position == (1, 0)


def test_judge_fraction():
    top = L.Node(bbox=np.array([0.0, 0, 100, 40]), typ="print")
    mid = L.Node(bbox=np.array([10.0, 50, 90, 80]), typ="hand")  # col-IoU(max) 0.8
    top.position = (0, 0)
    mid.position = (0, 1)
    L.judge_fraction([[top, mid]])
    assert top.typ == "fraction"


# --- property: engine == oracle on random layouts --------------------------

@st.composite
def random_boxes(draw):
    n = draw(st.integers(1, 8))
    out = []
    for _ in range(n):
        left = draw(st.integers(0, 500))
        top = draw(st.integers(0, 500))
        w = draw(st.integers(20, 160))
        h = draw(st.integers(20, 60))
        out.append([left, top, left + w, top + h])
    return np.array(out, dtype=np.float64)


@settings(max_examples=120, deadline=None)
@given(random_boxes(), random_boxes())
def test_row_pairs_matches_oracle(parr, harr):
    from tools.oracle import OBox, row_get_pair

    engine = L.row_pairs(parr, harr)
    oracle = row_get_pair(
        [OBox(b, "print") for b in parr], [OBox(b, "hand") for b in harr]
    )
    assert engine == oracle


@settings(max_examples=120, deadline=None)
@given(random_boxes())
def test_column_pairs_matches_oracle(arr):
    from tools.oracle import OBox, column_get_pair

    engine = L.column_pairs(nodes(arr, "print"))
    oracle = column_get_pair([OBox(b, "print") for b in arr])
    assert engine == oracle


@settings(max_examples=80, deadline=None)
@given(random_boxes())
def test_forests_match_oracle(arr):
    from tools.oracle import OBox, column_get_pair, graph_to_forest

    ns = nodes(arr, "print")
    engine = L.build_forests(L.column_pairs(ns), ns)
    obs = [OBox(b, "print") for b in arr]
    oracle = graph_to_forest(column_get_pair(obs), obs)
    eng_shape = [[tuple(n.bbox) for n in f] for f in engine]
    orc_shape = [[tuple(n.bbox) for n in f] for f in oracle]
    assert eng_shape == orc_shape
