"""Hand-computed cases for the production corpus-quality filters
(stopword fraction, duplicate-n-gram repetition ratio). The DuckDB
oracle parity suite gates these on the synthetic corpus; here the
expected numbers are worked out by hand so a simultaneous bug in both
SQL dialects can't hide."""

import pytest

from ocr_spark.operators.textstats import repetition_ratios, stopword_fractions


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_stopword_fraction_hand_computed(spark):
    rows = [
        ("d1", "the cat sat on the mat"),       # 6 tokens, 2 stopwords
        ("d2", "lorem ipsum dolor"),            # 3 tokens, 0 stopwords
        ("d3", ""),                             # empty: 0 tokens, frac 0
        ("d4", "a  a   the"),                   # runs of spaces collapse
    ]
    out = {
        r["doc_id"]: r
        for r in stopword_fractions(_docs(spark, rows)).collect()
    }
    assert out["d1"]["n_tokens"] == 6
    assert out["d1"]["stop_frac"] == pytest.approx(2 / 6, abs=1e-6)
    assert out["d2"]["stop_frac"] == 0.0
    assert out["d3"]["n_tokens"] == 0
    assert out["d3"]["stop_frac"] == 0.0
    assert out["d4"]["n_tokens"] == 3
    assert out["d4"]["stop_frac"] == 1.0


def test_repetition_ratio_hand_computed(spark):
    looped = " ".join(["alpha beta gamma delta epsilon"] * 6)  # 30 tokens
    # 30 tokens -> 21 10-grams; the text has period 5, so every 10-gram
    # repeats one of 5 rotations -> 5 distinct -> ratio 16/21.
    unique = " ".join(f"w{i}" for i in range(30))  # all distinct grams
    rows = [("loop", looped), ("uniq", unique), ("short", "only nine words " * 3)]
    out = {
        r["doc_id"]: r
        for r in repetition_ratios(_docs(spark, rows), n=10).collect()
    }
    assert out["loop"]["n_grams"] == 21
    assert out["loop"]["rep_ratio"] == pytest.approx(1 - 5 / 21, abs=1e-6)
    assert out["uniq"]["n_grams"] == 21
    assert out["uniq"]["rep_ratio"] == 0.0
    assert out["short"]["n_grams"] == 0  # 9 tokens < n
    assert out["short"]["rep_ratio"] == 0.0


def test_repetition_ratio_exact_boundary(spark):
    # exactly n tokens -> one gram, trivially distinct -> ratio 0
    rows = [("b", " ".join(f"t{i}" for i in range(10)))]
    (r,) = repetition_ratios(_docs(spark, rows), n=10).collect()
    assert r["n_grams"] == 1 and r["rep_ratio"] == 0.0


def test_bigram_lm_scores_hand_computed(spark):
    from math import log

    from ocr_spark.operators.textstats import bigram_lm_scores

    # corpus: "a b" x2 and "a c" -> U(a)=3, U(b)=1, U(c)=1, V=3,
    # B(a,b)=2, B(a,c)=1, k=.5:
    #   P(b|a) = 2.5/4.5, P(c|a) = 1.5/4.5
    rows = [("d1", "a b"), ("d2", "a b"), ("d3", "a c"), ("d4", "solo"), ("d5", "")]
    out = {
        r["doc_id"]: r for r in bigram_lm_scores(_docs(spark, rows)).collect()
    }
    # d4 adds U(solo)=1 -> V=4: recompute with V=4
    p_ab = (2 + 0.5) / (3 + 0.5 * 4)
    p_ac = (1 + 0.5) / (3 + 0.5 * 4)
    assert out["d1"]["n_bigrams"] == 1
    assert out["d1"]["xent"] == pytest.approx(-log(p_ab), abs=2e-6)
    assert out["d3"]["xent"] == pytest.approx(-log(p_ac), abs=2e-6)
    # rarer continuation scores worse
    assert out["d3"]["xent"] > out["d1"]["xent"]
    # no bigram evidence -> NULL score, zero count
    assert out["d4"]["n_bigrams"] == 0 and out["d4"]["xent"] is None
    assert out["d5"]["n_bigrams"] == 0 and out["d5"]["xent"] is None


def test_bigram_lm_scores_partition_invariant(spark):
    from ocr_spark.operators.textstats import bigram_lm_scores

    rows = [
        (f"d{i}", " ".join(f"w{(i + j) % 5}" for j in range(6))) for i in range(20)
    ]
    df = _docs(spark, rows)
    base = sorted(map(tuple, bigram_lm_scores(df).collect()))
    repart = sorted(map(tuple, bigram_lm_scores(df.repartition(9)).collect()))
    assert base == repart
