"""Property-based tests (SURVEY.md §5 item 5) — invariants of the
pairing/forest kernels, the beam decoder, and the safe evaluator,
under randomized inputs via hypothesis.

These never touch Spark: kernels are pure numpy/python, so hundreds of
examples run in seconds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.config import ALPHABET, N_CLASSES
from ocr_spark.functions.arith import eval_verdict, safe_eval
from ocr_spark.functions.ctc import beam_decode, greedy_decode
from ocr_spark.operators.layout import Node, build_forests, column_pairs, row_pairs

# -- box strategies ---------------------------------------------------------

boxes = st.lists(
    st.tuples(
        st.floats(0, 1000, allow_nan=False),
        st.floats(0, 1400, allow_nan=False),
        st.floats(5, 300, allow_nan=False),
        st.floats(5, 60, allow_nan=False),
    ),
    min_size=0,
    max_size=12,
)


def _arr(bs):
    return np.array(
        [[x, y, x + w, y + h] for x, y, w, h in bs], dtype=np.float64
    ).reshape(len(bs), 4)


@settings(max_examples=200, deadline=None)
@given(boxes, boxes)
def test_row_pairs_is_injective_partial_matching(pb, hb):
    """Each print maps to at most one hand, and no hand is claimed by
    two prints (the two-pass mutual-nearest dedup invariant,
    reference layout_utils.py:174-214)."""
    prints, hands = _arr(pb), _arr(hb)
    pairs = row_pairs(prints, hands)
    assert all(0 <= p < len(prints) and 0 <= h < len(hands) for p, h in pairs.items())
    matched_hands = list(pairs.values())
    assert len(matched_hands) == len(set(matched_hands))


@settings(max_examples=200, deadline=None)
@given(boxes)
def test_forests_cover_the_nodes(bs):
    """Forests cover every node, no node spans two trees, and trees
    are top-sorted. NOT asserted: uniqueness within a tree — the
    reference re-appends a node whose pair-partner already shares its
    forest (duplicate member, pipline.py:256-258), a quirk
    build_forests deliberately preserves.
    (reference pipline.py:224-287 graph_to_forest)."""
    nodes = [Node(bbox=b, typ="print") for b in _arr(bs)]
    pairs = column_pairs(nodes)
    forests = build_forests(pairs, nodes)
    seen = [id(n) for f in forests for n in f]
    assert set(seen) == {id(n) for n in nodes}
    tree_of = {}
    for ti, tree in enumerate(forests):
        tops = [n.top for n in tree]
        assert tops == sorted(tops)  # rank order = top order
        occupied = {(ti, ri) for ri in range(len(tree))}
        for ri, n in enumerate(tree):
            assert tree_of.setdefault(id(n), ti) == ti  # never in two trees
            assert n.position in occupied


# -- decoder properties -----------------------------------------------------

prob_matrices = st.integers(0, 14).flatmap(
    lambda t: st.lists(
        st.lists(
            st.floats(0.001, 1.0, allow_nan=False), min_size=N_CLASSES, max_size=N_CLASSES
        ),
        min_size=t,
        max_size=t,
    )
)


@settings(max_examples=100, deadline=None)
@given(prob_matrices)
def test_beam_contains_greedy_quality(rows):
    """Beam results are unique sequences, sorted by score; the best
    beam's score is <= the greedy path's cumulative score (beam k=10
    explores a superset of the greedy path's prefix space)."""
    probs = np.array(rows, dtype=np.float64).reshape(len(rows), N_CLASSES)
    probs /= probs.sum(axis=1, keepdims=True)
    beams = beam_decode(probs)
    seqs = [s for s, _ in beams]
    assert len(seqs) == len(set(seqs))
    scores = [sc for _, sc in beams]
    assert scores == sorted(scores)
    if len(rows):
        greedy_cost = float(-np.log(probs.max(axis=1)).sum())
        assert scores[0] <= greedy_cost + 1e-9


@settings(max_examples=100, deadline=None)
@given(prob_matrices)
def test_greedy_decode_alphabet_closed(rows):
    probs = np.array(rows, dtype=np.float64).reshape(len(rows), N_CLASSES)
    out = greedy_decode(probs)
    assert all(ch in ALPHABET for ch in out)


# -- arithmetic evaluator ---------------------------------------------------

small_int = st.integers(0, 999)


@settings(max_examples=200, deadline=None)
@given(small_int, small_int, st.sampled_from(["+", "-", "×"]))
def test_eval_verdict_matches_ground_truth(a, b, op):
    val = {"+": a + b, "-": a - b, "×": a * b}[op]
    assert eval_verdict(f"{a}{op}{b}={val}") == "right"
    assert eval_verdict(f"{a}{op}{b}={val + 1}") == "error"


@settings(max_examples=200, deadline=None)
@given(small_int, st.integers(1, 99))
def test_divrem_notation(num, d):
    q, r = divmod(num, d)
    assert eval_verdict(f"{num}÷{d}={q}*{r}") == "right"
    assert eval_verdict(f"{num}÷{d}={q}~{r}") == "right"
    wrong_r = r + 1
    assert eval_verdict(f"{num}÷{d}={q}*{wrong_r}") in ("error", "problem")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789+-×÷=()*~@. ", max_size=12))
def test_eval_verdict_total_and_safe(s):
    """The verdict function never raises and never escapes the enum —
    the reference's bare `except -> 'problem'` contract
    (utils.py:116-117), minus its eval() injection hazard."""
    assert eval_verdict(s) in ("right", "error", "problem")


@settings(max_examples=200, deadline=None)
@given(st.integers(-999, 999), st.integers(-999, 999), st.sampled_from("+-*"))
def test_safe_eval_matches_python(a, b, op):
    expr = f"{a}{op}{b}"
    assert safe_eval(expr) == eval(expr)  # noqa: S307 — test-only ground truth
