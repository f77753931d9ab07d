"""Unit tests for distributed BPE training (operators/tokenizer.py):
the Spark trainer must reproduce a sequential reference implementation
with the same deterministic tie-break, and segmentation must match the
trainer's own fold semantics. The sf0.01 DuckDB parity gate for
bpe_pair_counts lives in test_oracle_parity.py."""

from collections import Counter

from ocr_spark.operators import tokenizer


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


# Sequential reference: greedy leftmost merge application, max-count
# pair with lexicographically-smallest tie-break — the exact contract
# tokenizer.py documents.


def _ref_apply(sym_seq, a, b):
    out = []
    for x in sym_seq:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _ref_train(word_counts, n_merges):
    syms = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += cnt
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        for w in syms:
            syms[w] = _ref_apply(syms[w], *best)
    return merges, syms


CLASSIC = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def test_bpe_pair_counts_hand_example(spark):
    # "ab" x2, "b" and "a" contribute no pairs; "abc" adds (a,b), (b,c)
    df = _docs(spark, [(0, "ab ab b a", "en", "s"), (1, "abc", "en", "s")])
    rows = {
        (r["sym_a"], r["sym_b"]): r["cnt"]
        for r in tokenizer.bpe_pair_counts(df).collect()
    }
    assert rows == {("a", "b"): 3, ("b", "c"): 1}


def test_bpe_train_matches_reference_on_classic_corpus(spark):
    df = _docs(spark, [(i, w, "en", "s") for i, w in enumerate(CLASSIC)])
    expect, _ = _ref_train(Counter(CLASSIC), 6)
    got = tokenizer.bpe_train_merges(df, n_merges=6)
    assert got == expect


def test_bpe_train_tie_break_is_lexicographic(spark):
    # (a,b) and (c,d) both count 2 -> the smaller pair wins round 1
    df = _docs(spark, [(0, "ab cd", "en", "s"), (1, "ab cd", "en", "s")])
    merges = tokenizer.bpe_train_merges(df, n_merges=1)
    assert merges == [("a", "b")]


def test_bpe_train_stops_when_fully_merged(spark):
    # "ab" collapses to one symbol after one merge; round 2 finds no pair
    df = _docs(spark, [(0, "ab ab", "en", "s")])
    merges = tokenizer.bpe_train_merges(df, n_merges=5)
    assert merges == [("a", "b")]


def test_bpe_train_min_count_prunes_rare_words(spark):
    # without pruning "zz" (1 occurrence) loses to "ab" (3); with
    # min_count=2 the zz word leaves the statistics entirely
    df = _docs(
        spark,
        [(0, "ab ab ab zz", "en", "s")],
    )
    assert tokenizer.bpe_train_merges(df, n_merges=2) == [
        ("a", "b"), ("z", "z")
    ]
    assert tokenizer.bpe_train_merges(df, n_merges=2, min_count=2) == [
        ("a", "b")
    ]


def test_bpe_train_partition_invariant(spark):
    rows = [(i, w, "en", "s") for i, w in enumerate(CLASSIC)]
    df = _docs(spark, rows)
    a = tokenizer.bpe_train_merges(df, n_merges=4)
    b = tokenizer.bpe_train_merges(df.repartition(7), n_merges=4)
    c = tokenizer.bpe_train_merges(df.coalesce(1), n_merges=4)
    assert a == b == c


def test_bpe_apply_merges_matches_reference(spark):
    wc = Counter(CLASSIC)
    merges, ref_syms = _ref_train(wc, 6)
    df = _docs(spark, [(i, w, "en", "s") for i, w in enumerate(CLASSIC)])
    got = {
        r["doc_id"]: r["tokens"]
        for r in tokenizer.bpe_apply_merges(df, merges).collect()
    }
    for i, w in enumerate(CLASSIC):
        assert got[i] == ref_syms[w], (w, got[i], ref_syms[w])


def test_bpe_apply_overlapping_merge_is_leftmost(spark):
    # "aaa" + merge (a,a) -> ["aa", "a"], never ["a", "aa"] or ["aaa"]
    df = _docs(spark, [(0, "aaa", "en", "s")])
    row = tokenizer.bpe_apply_merges(df, [("a", "a")]).collect()[0]
    assert row["tokens"] == ["aa", "a"]


def test_bpe_apply_no_merges_yields_chars(spark):
    df = _docs(spark, [(0, "ab c", "en", "s")])
    row = tokenizer.bpe_apply_merges(df, []).collect()[0]
    assert row["tokens"] == ["a", "b", "c"]


def test_bpe_apply_merge_chain_feeds_later_merges(spark):
    # merge 1 forms "ab"; merge 2 consumes it as a left symbol
    df = _docs(spark, [(0, "abc", "en", "s")])
    row = tokenizer.bpe_apply_merges(df, [("a", "b"), ("ab", "c")]).collect()[0]
    assert row["tokens"] == ["abc"]


def test_bpe_apply_arrow_engine_matches_expr_engine(spark):
    # the two engines behind bpe_apply_merges must be bit-identical:
    # the Arrow kernel replays the same sequential per-rank pass the
    # fold expression implements
    merges, _ = _ref_train(Counter(CLASSIC), 6)
    df = _docs(spark, [(i, w, "en", "s") for i, w in enumerate(CLASSIC)])
    expr = {
        r["doc_id"]: r["tokens"]
        for r in tokenizer.bpe_apply_merges(df, merges, engine="expr").collect()
    }
    arrow = {
        r["doc_id"]: r["tokens"]
        for r in tokenizer.bpe_apply_merges(df, merges, engine="arrow").collect()
    }
    assert expr == arrow


def test_bpe_apply_engines_agree_on_adversarial_symbols(spark):
    # quotes and backslashes in symbols exercise the expr engine's
    # SQL-literal escaping; multi-space runs exercise empty-word
    # filtering; overlap exercises the leftmost-pass contract
    rows = [(0, "a'b  a'b", "en", "s"), (1, "x\\y  aaa", "en", "s")]
    df = _docs(spark, rows)
    merges = [("a", "'"), ("a'", "b"), ("x", "\\"), ("a", "a")]
    expr = tokenizer.bpe_apply_merges(df, merges, engine="expr").collect()
    arrow = tokenizer.bpe_apply_merges(df, merges, engine="arrow").collect()
    got_e = {r["doc_id"]: r["tokens"] for r in expr}
    got_a = {r["doc_id"]: r["tokens"] for r in arrow}
    assert got_e == got_a
    assert got_e[0] == ["a'b", "a'b"]
    assert got_e[1] == ["x\\", "y", "aa", "a"]


def test_bpe_apply_auto_switches_to_arrow_above_threshold(spark):
    df = _docs(spark, [(0, "abc", "en", "s")])
    merges = [("a", "b"), ("ab", "c")]
    small = tokenizer.bpe_apply_merges(df, merges, expr_max_merges=4)
    big = tokenizer.bpe_apply_merges(df, merges, expr_max_merges=1)
    assert "MapInPandas" not in small._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in big._jdf.queryExecution().executedPlan().toString()
    assert small.collect()[0]["tokens"] == big.collect()[0]["tokens"] == ["abc"]


def test_bpe_pack_plan_matches_sequential_packing(spark):
    # pack by BPE token counts: replay with the sequential reference
    # segmenter + a plain running-total pack at a tiny capacity
    rows = [(i, w + " " + w, "en", "s") for i, w in enumerate(CLASSIC)]
    merges, _ = _ref_train(Counter([w for _, t, *_ in rows for w in t.split()]), 4)
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_bin"], r["start_offset"])
        for r in tokenizer.bpe_pack_plan(
            _docs(spark, rows), merges, capacity=7, block=4
        ).collect()
    }
    prefix = 0
    for i, text, *_ in rows:
        n = sum(len(_ref_apply_all(w, merges)) for w in text.split(" ") if w)
        assert got[i] == (n, prefix // 7, prefix % 7), (i, got[i])
        prefix += n


def _ref_apply_all(word, merges):
    syms = list(word)
    for a, b in merges:
        syms = _ref_apply(syms, a, b)
    return syms


def test_bpe_pack_plan_partition_invariant(spark):
    rows = [(i, w, "en", "s") for i, w in enumerate(CLASSIC)]
    df = _docs(spark, rows)
    base = sorted(map(tuple, tokenizer.bpe_pack_plan(df, capacity=5).collect()))
    repart = sorted(
        map(tuple, tokenizer.bpe_pack_plan(df.repartition(7), capacity=5).collect())
    )
    assert base == repart


def test_bpe_pair_counts_plan_is_map_side_partial(spark):
    df = _docs(spark, [(0, "ab ab", "en", "s")])
    plan = (
        tokenizer.bpe_pair_counts(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
