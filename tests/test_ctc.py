"""CTC decode kernels vs explicit logit matrices, including the
reference beam's blank-handling quirks (pipline.py:31-84)."""

import numpy as np

from ocr_spark.config import ALPHABET, BLANK_ID, CHAR_TO_ID
from ocr_spark.functions.ctc import (
    beam_decode,
    beam_decode_texts,
    greedy_decode,
    greedy_decode_batch,
)


def probs_for(ids, t_extra=0):
    """One confident frame per id (+ optional trailing blanks)."""
    t = len(ids) + t_extra
    p = np.full((t, len(ALPHABET)), 0.001)
    for i, cid in enumerate(ids):
        p[i, cid] = 0.9
    for i in range(len(ids), t):
        p[i, BLANK_ID] = 0.9
    return p / p.sum(axis=1, keepdims=True)


def ids_of(s):
    return [CHAR_TO_ID[c] for c in s]


def test_greedy_collapse_and_blank():
    # "1" "1" blank "1" -> "11" (repeat collapses, blank separates)
    seq = [CHAR_TO_ID["1"], CHAR_TO_ID["1"], BLANK_ID, CHAR_TO_ID["1"]]
    assert greedy_decode(probs_for(seq)) == "11"


def test_greedy_simple():
    assert greedy_decode(probs_for(ids_of("3+4=7"))) == "3+4=7"


def test_greedy_batch_matches_single():
    mats = [probs_for(ids_of(s), 2) for s in ["12+3=15", "9", ""]]
    lengths = np.array([m.shape[0] for m in mats])
    tmax = lengths.max()
    batch = np.zeros((len(mats), tmax, len(ALPHABET)))
    for i, m in enumerate(mats):
        batch[i, : m.shape[0]] = m
    outs = greedy_decode_batch(batch, lengths)
    assert outs == [greedy_decode(m) for m in mats]


def test_beam_top1_agrees_with_greedy_when_confident():
    p = probs_for(ids_of("7×8=56"), 1)
    texts = beam_decode_texts(p)
    assert texts[0].rstrip(" ") == "7×8=56"
    # candidates are unique sequences
    assert len(set(texts)) == len(texts)


def test_beam_recovers_second_best():
    # one ambiguous frame: '5' (0.44) vs '6' (0.36) -> greedy says 5,
    # beam's candidate set must contain the 6-variant
    p = probs_for(ids_of("16"), 0)
    amb = np.full(len(ALPHABET), 0.001)
    amb[CHAR_TO_ID["5"]] = 0.44
    amb[CHAR_TO_ID["6"]] = 0.36
    p[1] = amb / amb.sum()
    assert greedy_decode(p) == "15"
    texts = beam_decode_texts(p)
    assert "15" in [t.rstrip(" ") for t in texts]
    assert "16" in [t.rstrip(" ") for t in texts]


def test_beam_scores_sorted():
    p = probs_for(ids_of("2+2=4"), 2)
    beams = beam_decode(p)
    scores = [s for _, s in beams]
    assert scores == sorted(scores)
