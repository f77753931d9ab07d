"""Unit tests for the corpus-construction operators (line-level exact
dedup, deterministic stratified sampling, duplicated-n-gram stats).
Their sf0.01 DuckDB parity gate lives in test_oracle_parity.py; these
pin the hand-checkable edge semantics on tiny in-memory tables."""

import pytest

from ocr_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


# ---------------------------------------------------------------- lines


def test_line_dedup_keeps_global_first_occurrence(spark):
    # width=2 chunks: doc 0 -> ["a b", "c d"], doc 1 -> ["a b", "x y"],
    # doc 2 -> ["a b"]. "a b" survives only at (doc 0, idx 0).
    df = _docs(
        spark,
        [
            (0, "a b c d", "en", "s"),
            (1, "a b x y", "en", "s"),
            (2, "a b", "en", "s"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in corpus.line_dedup_stats(df, width=2).collect()
    }
    assert out[0]["n_lines"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["kept_text"] == "a b c d"
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["kept_text"] == "x y"
    assert out[2]["n_lines"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["kept_text"] == ""


def test_line_dedup_first_occurrence_within_one_doc(spark):
    # Intra-doc repetition dedups too: keeper ordering is (doc_id, idx).
    df = _docs(spark, [(7, "a b a b a b", "en", "s")])
    row = corpus.line_dedup_stats(df, width=2).collect()[0]
    assert row["n_lines"] == 3
    assert row["n_kept"] == 1
    assert row["kept_text"] == "a b"


def test_line_dedup_ragged_tail_chunk(spark):
    # 5 words at width=2 -> chunks "a b", "c d", "e": the short tail is
    # a line of its own and dedups against an identical full doc "e".
    df = _docs(
        spark,
        [(0, "a b c d e", "en", "s"), (1, "e", "en", "s")],
    )
    out = {
        r["doc_id"]: r
        for r in corpus.line_dedup_stats(df, width=2).collect()
    }
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 3
    assert out[1]["n_lines"] == 1 and out[1]["n_kept"] == 0


def test_line_dedup_reassembles_in_document_order(spark):
    # Kept lines must re-join in idx order even when a middle line drops.
    df = _docs(
        spark,
        [(0, "x y", "en", "s"), (1, "p q x y r s", "en", "s")],
    )
    out = {
        r["doc_id"]: r["kept_text"]
        for r in corpus.line_dedup_stats(df, width=2).collect()
    }
    assert out[1] == "p q r s"


# -------------------------------------------------------------- sampling


def test_stratified_sample_is_deterministic_and_lower_rate_is_subset(spark):
    df = _docs(
        spark,
        [(i, "t", "en" if i % 2 else "zh", "s") for i in range(200)],
    )
    half = {r["doc_id"] for r in
            corpus.stratified_sample(df, {"en": 0.5}).collect()}
    half2 = {r["doc_id"] for r in
             corpus.stratified_sample(df, {"en": 0.5}).collect()}
    quarter = {r["doc_id"] for r in
               corpus.stratified_sample(df, {"en": 0.25}).collect()}
    assert half == half2  # bit-for-bit reproducible, no RNG state
    assert quarter <= half  # lower rate selects a strict subset
    # zh has no policy entry -> kept in full
    assert all(i in half for i in range(0, 200, 2))


def test_stratified_sample_rate_edges(spark):
    df = _docs(
        spark,
        [(i, "t", "en" if i % 2 else "zh", "s") for i in range(50)],
    )
    kept = corpus.stratified_sample(df, {"en": 1.0, "zh": 0.0}).collect()
    assert {r["lang"] for r in kept} == {"en"}
    assert len(kept) == 25


def test_stratified_sample_rate_is_approximately_honored(spark):
    df = _docs(spark, [(i, "t", "en", "s") for i in range(2000)])
    n = corpus.stratified_sample(df, {"en": 0.25}).count()
    assert 0.20 * 2000 < n < 0.30 * 2000


# ------------------------------------------------------------------ pii


def test_pii_scrub_counts_and_masks(spark):
    import hashlib

    df = _docs(
        spark,
        [
            (0, "contact user42@ex3.com or admin@sub.domain.org now", "en", "s"),
            (1, "server 10.1.2.34 and 192.168.0.1, call +86-138-0042 ok", "en", "s"),
            (2, "no pii here at all", "en", "s"),
        ],
    )
    out = {r["doc_id"]: r for r in corpus.pii_scrub(df).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 0, 0)
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (0, 2, 1)
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[0]["scrubbed_fp"] == hashlib.md5(
        b"contact <EMAIL> or <EMAIL> now"
    ).hexdigest()
    assert out[1]["scrubbed_fp"] == hashlib.md5(
        b"server <IP> and <IP>, call <PHONE> ok"
    ).hexdigest()
    assert out[2]["scrubbed_fp"] == hashlib.md5(
        b"no pii here at all"
    ).hexdigest()


def test_pii_scrub_counts_are_sequential(spark):
    # an IPv4-shaped host inside an email is consumed by the email mask
    # and must NOT also count as an IP; a bare dotted quad after it must
    df = _docs(spark, [(0, "x -1.2.3.4@x.com 123.45.6.7", "en", "s")])
    row = corpus.pii_scrub(df).collect()[0]
    assert (row["n_email"], row["n_ipv4"], row["n_phone"]) == (1, 1, 0)


def test_pii_scrub_plan_is_shuffle_free(spark):
    df = _docs(spark, [(i, "t", "en", "s") for i in range(10)])
    plan = corpus.pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------- dup grams


def test_dup_gram_stats_counts_cross_and_intra_doc_repeats(spark):
    # n=2 grams. doc 0: "a b","b c","c a","a b" -> "a b" repeats
    # intra-doc (2 positions dup) and "b c" also occurs in doc 1.
    df = _docs(
        spark,
        [(0, "a b c a b", "en", "s"), (1, "b c", "en", "s")],
    )
    out = {
        r["doc_id"]: r for r in corpus.dup_gram_stats(df, n=2).collect()
    }
    assert out[0]["n_grams"] == 4
    assert out[0]["n_dup_grams"] == 3  # both "a b" positions + "b c"
    assert out[1]["n_grams"] == 1 and out[1]["n_dup_grams"] == 1


def test_dup_gram_stats_short_docs_have_no_grams(spark):
    df = _docs(
        spark,
        [(0, "only seven words is not quite enough", "en", "s"),
         (1, "this document carries eight whole words in it", "en", "s")],
    )
    rows = corpus.dup_gram_stats(df, n=8).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_grams"] == 1 and rows[0]["n_dup_grams"] == 0


def test_dup_gram_stats_all_unique(spark):
    df = _docs(spark, [(0, "a b c d e", "en", "s")])
    row = corpus.dup_gram_stats(df, n=2).collect()[0]
    assert row["n_grams"] == 4 and row["n_dup_grams"] == 0


# -------------------------------------------------------------- pipeline


def test_corpus_pipeline_composes_all_four_stages(spark):
    # width=2 lines, min_tokens=4, stopword floor 10%:
    #  doc 0: quality pass ("the" = 1/4 tokens), lines ["a b","c the"]
    #  doc 1: too short -> quality-dropped, its lines claim nothing
    #  doc 2: no stopwords -> quality-dropped
    #  doc 3: cleaned text identical to doc 0 -> doc-dedup dropped
    #  doc 4: shares line "a b" with doc 0 -> kept with 1 surviving line
    df = _docs(
        spark,
        [
            (0, "a b c the", "en", "s"),
            (1, "a b", "en", "s"),
            (2, "x y z w", "en", "s"),
            (3, "a b c the", "en", "s"),
            (4, "a b q the", "en", "s"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in corpus.corpus_pipeline(
            df, min_tokens=4, min_stop_pct=10, width=2, rates={}
        ).collect()
    }
    assert set(out) == {0, 4}
    assert out[0]["n_lines"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["n_tokens_kept"] == 4
    assert out[4]["n_kept"] == 1 and out[4]["n_tokens_kept"] == 2
    # doc 2's line "x y" never entered the dedup pool (quality ran first)
    assert 2 not in out and 1 not in out and 3 not in out


def test_corpus_pipeline_drops_fully_duplicated_docs(spark):
    # doc 1 is line-for-line covered by doc 0 -> zero kept lines -> dropped
    df = _docs(
        spark,
        [(0, "the a b c", "en", "s"), (1, "the a", "en", "s")],
    )
    rows = corpus.corpus_pipeline(
        df, min_tokens=2, min_stop_pct=10, width=2, rates={}
    ).collect()
    assert [r["doc_id"] for r in rows] == [0]


def test_corpus_pipeline_sampling_runs_on_deduped_pool(spark):
    # rate 0 for en drops everything even though docs pass the gates
    df = _docs(spark, [(0, "the a b c", "en", "s")])
    assert (
        corpus.corpus_pipeline(
            df, min_tokens=2, min_stop_pct=10, width=2, rates={"en": 0.0}
        ).count()
        == 0
    )


# --------------------------------------------------------------- packing


def test_seq_pack_plan_places_docs_contiguously(spark):
    # token counts 3, 4, 5 at capacity 5: prefixes 0, 3, 7 ->
    # bins/offsets (0,0), (0,3), (1,2)
    df = _docs(
        spark,
        [(0, "a b c", "en", "s"), (1, "a b c d", "en", "s"),
         (2, "a b c d e", "en", "s")],
    )
    out = {
        r["doc_id"]: (r["start_bin"], r["start_offset"], r["n_tokens"])
        for r in corpus.seq_pack_plan(df, capacity=5).collect()
    }
    assert out == {0: (0, 0, 3), 1: (0, 3, 4), 2: (1, 2, 5)}


def test_seq_pack_plan_crosses_block_boundaries(spark):
    # block=2: docs 0,1 in block 0; docs 2,3 in block 1 — the offsets
    # join must carry block 0's total into block 1's prefixes
    df = _docs(
        spark,
        [(i, "w " * (i + 1), "en", "s") for i in range(4)],  # 1,2,3,4 toks
    )
    out = {
        r["doc_id"]: (r["start_bin"], r["start_offset"])
        for r in corpus.seq_pack_plan(df, capacity=4, block=2).collect()
    }
    # prefixes 0,1,3,6 at capacity 4
    assert out == {0: (0, 0), 1: (0, 1), 2: (0, 3), 3: (1, 2)}


def test_seq_pack_plan_is_partition_invariant(spark):
    df = _docs(
        spark,
        [(i, "w " * (i % 7 + 1), "en", "s") for i in range(100)],
    )
    a = sorted(map(tuple, corpus.seq_pack_plan(df, capacity=16, block=8).collect()))
    b = sorted(map(tuple,
        corpus.seq_pack_plan(df.repartition(13), capacity=16, block=8).collect()))
    c = sorted(map(tuple,
        corpus.seq_pack_plan(df.coalesce(1), capacity=16, block=8).collect()))
    assert a == b == c


def test_seq_pack_segments_single_and_straddling_docs(spark):
    # capacity 5, tokens 3,4,5: doc 1 straddles bins 0/1 (prefix 3),
    # doc 2 starts at bin 1 offset 2 and straddles into bin 2
    df = _docs(
        spark,
        [(0, "a b c", "en", "s"), (1, "a b c d", "en", "s"),
         (2, "a b c d e", "en", "s")],
    )
    rows = sorted(
        (r["doc_id"], r["bin"], r["pos_in_bin"], r["doc_tok_start"],
         r["seg_len"])
        for r in corpus.seq_pack_segments(df, capacity=5).collect()
    )
    assert rows == [
        (0, 0, 0, 0, 3),
        (1, 0, 3, 0, 2), (1, 1, 0, 2, 2),
        (2, 1, 2, 0, 3), (2, 2, 0, 3, 2),
    ]


def test_seq_pack_segments_tile_bins_and_docs(spark):
    # invariants at an awkward capacity: segments concatenate back to
    # each document, and every non-final bin is tiled to exactly
    # capacity with contiguous, non-overlapping slices
    df = _docs(
        spark,
        [(i, "w " * (i % 11 + 1), "en", "s") for i in range(60)],
    )
    segs = corpus.seq_pack_segments(df, capacity=7, block=8).collect()
    by_doc: dict = {}
    by_bin: dict = {}
    for r in segs:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_bin.setdefault(r["bin"], []).append(r)
    n_tok = {i: i % 11 + 1 for i in range(60)}
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["doc_tok_start"])
        assert rs[0]["doc_tok_start"] == 0
        for a, b in zip(rs, rs[1:]):
            assert a["doc_tok_start"] + a["seg_len"] == b["doc_tok_start"]
        assert sum(r["seg_len"] for r in rs) == n_tok[d]
    last_bin = max(by_bin)
    for b, rs in by_bin.items():
        rs.sort(key=lambda r: r["pos_in_bin"])
        assert rs[0]["pos_in_bin"] == 0
        for a, c in zip(rs, rs[1:]):
            assert a["pos_in_bin"] + a["seg_len"] == c["pos_in_bin"]
        total = sum(r["seg_len"] for r in rs)
        assert total == 7 or (b == last_bin and total <= 7)


def test_seq_pack_segments_skips_empty_docs(spark):
    df = _docs(
        spark,
        [(0, "a b", "en", "s"), (1, "", "en", "s"), (2, "c", "en", "s")],
    )
    segs = corpus.seq_pack_segments(df, capacity=4).collect()
    assert sorted({r["doc_id"] for r in segs}) == [0, 2]
    # the empty doc occupies no space: doc 2 packs right after doc 0
    out = {r["doc_id"]: (r["bin"], r["pos_in_bin"]) for r in segs}
    assert out == {0: (0, 0), 2: (0, 2)}


def test_seq_pack_plan_base_tokens_resumes_append_only(spark):
    # packing batch B at base_tokens = sum(A) must equal the rows a
    # from-scratch run over A union B assigns to B's documents
    rows = [(i, "w " * (i % 9 + 1), "en", "s") for i in range(40)]
    a, b = rows[:25], rows[25:]
    full = {
        r["doc_id"]: (r["start_bin"], r["start_offset"])
        for r in corpus.seq_pack_plan(
            _docs(spark, rows), capacity=16, block=8).collect()
    }
    batch_a = corpus.seq_pack_plan(
        _docs(spark, a), capacity=16, block=8).collect()
    base = sum(r["n_tokens"] for r in batch_a)
    resumed = {
        r["doc_id"]: (r["start_bin"], r["start_offset"])
        for r in corpus.seq_pack_plan(
            _docs(spark, b), capacity=16, block=8, base_tokens=base
        ).collect()
    }
    assert resumed == {d: full[d] for d in resumed}
    assert {r["doc_id"]: (r["start_bin"], r["start_offset"])
            for r in batch_a} == {d: full[d] for d, _ in
                                  ((r[0], None) for r in a)}


def test_corpus_pack_plan_packs_exactly_the_pipeline_survivors(spark):
    kw = dict(min_tokens=4, min_stop_pct=10, width=2, rates={})
    df = _docs(
        spark,
        [(0, "a b c the", "en", "s"), (1, "a b", "en", "s"),
         (2, "x y z w", "en", "s"), (3, "a b c the", "en", "s"),
         (4, "a b q the", "en", "s"),
         (5, "p q r s the of and t u v", "en", "s")],
    )
    pool = {
        r["doc_id"]: r["n_tokens_kept"]
        for r in corpus.corpus_pipeline(df, **kw).collect()
    }
    assert len(pool) >= 3  # the composition has something to pack
    packed = corpus.corpus_pack_plan(df, capacity=16, **kw).collect()
    assert {r["doc_id"] for r in packed} == set(pool)
    assert {r["doc_id"]: r["n_tokens"] for r in packed} == pool
    # bins assigned by doc_id order over the survivors' prefix sum
    prefix = 0
    for did in sorted(pool):
        row = next(r for r in packed if r["doc_id"] == did)
        assert (row["start_bin"], row["start_offset"]) == (
            prefix // 16, prefix % 16)
        prefix += pool[did]


def test_training_shuffle_is_a_permutation(spark):
    df = _docs(spark, [(i, "w", "en", "s") for i in range(137)])
    pos = [r["shuffle_pos"] for r in corpus.training_shuffle(df).collect()]
    assert sorted(pos) == list(range(137))


def test_training_shuffle_matches_global_sort(spark):
    # the two-phase block form must equal the naive global
    # row_number() over (ORDER BY md5 key, doc_id)
    import hashlib

    ids = list(range(0, 300, 7))
    df = _docs(spark, [(i, "w", "en", "s") for i in ids])
    key = lambda i: hashlib.md5(f"9:{i}".encode()).hexdigest()
    expect = {
        i: p for p, i in enumerate(sorted(ids, key=lambda i: (key(i), i)))
    }
    got = {
        r["doc_id"]: r["shuffle_pos"]
        for r in corpus.training_shuffle(df, seed=9).collect()
    }
    assert got == expect


def test_training_shuffle_partition_and_prefix_invariant(spark):
    df = _docs(spark, [(i, "w", "en", "s") for i in range(100)])
    a = sorted(map(tuple, corpus.training_shuffle(df, seed=3).collect()))
    b = sorted(map(tuple,
        corpus.training_shuffle(df.repartition(13), seed=3).collect()))
    c = sorted(map(tuple,
        corpus.training_shuffle(df.coalesce(1), seed=3, prefix_hex=1).collect()))
    assert a == b == c


def test_training_shuffle_seed_changes_order(spark):
    df = _docs(spark, [(i, "w", "en", "s") for i in range(64)])
    a = {r["doc_id"]: r["shuffle_pos"]
         for r in corpus.training_shuffle(df, seed=0).collect()}
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in corpus.training_shuffle(df, seed=1).collect()}
    assert a != b
    assert sorted(a.values()) == sorted(b.values())


def test_seq_pack_plan_sparse_doc_ids(spark):
    # doc_ids with gaps: blocks vary in membership but order is kept
    df = _docs(
        spark,
        [(5, "a b c", "en", "s"), (900, "d e", "en", "s"),
         (9001, "f", "en", "s")],
    )
    out = {
        r["doc_id"]: (r["start_bin"], r["start_offset"])
        for r in corpus.seq_pack_plan(df, capacity=4, block=10).collect()
    }
    assert out == {5: (0, 0), 900: (0, 3), 9001: (1, 1)}


# ------------------------------------------------------------ plan shape


def test_stratified_sample_plan_is_shuffle_free(spark):
    df = _docs(spark, [(i, "t", "en", "s") for i in range(10)])
    plan = corpus.stratified_sample(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.mark.parametrize("op", ["line", "gram"])
def test_dedup_plans_never_nested_loop(spark, op):
    df = _docs(spark, [(i, "a b c d e f g h i", "en", "s") for i in range(10)])
    out = (
        corpus.line_dedup_stats(df)
        if op == "line"
        else corpus.dup_gram_stats(df)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_domain_mix_weights_hand_computed(spark):
    # source A: 8 tokens, source B: 2 tokens -> p = .8/.2; at alpha=.5
    # q_A : q_B = sqrt(.8) : sqrt(.2) = .894427 : .447214 -> 2:1
    df = _docs(
        spark,
        [
            (1, "a b c d", "en", "A"),
            (2, "e f g h", "en", "A"),
            (3, "i j", "en", "B"),
        ],
    )
    out = {
        r["source"]: r
        for r in corpus.domain_mix_weights(df, alpha=0.5).collect()
    }
    assert out["A"]["n_docs"] == 2 and out["A"]["n_tokens"] == 8
    assert out["B"]["n_docs"] == 1 and out["B"]["n_tokens"] == 2
    assert out["A"]["p"] == pytest.approx(0.8, abs=1e-6)
    assert out["B"]["p"] == pytest.approx(0.2, abs=1e-6)
    assert out["A"]["q"] == pytest.approx(2 / 3, abs=1e-5)
    assert out["B"]["q"] == pytest.approx(1 / 3, abs=1e-5)
    # temperature flattens: the minority source is oversampled
    assert out["B"]["sample_rate"] > 1 > out["A"]["sample_rate"]


def test_domain_mix_weights_alpha_one_is_identity(spark):
    df = _docs(
        spark,
        [(1, "a b c", "en", "A"), (2, "d", "en", "B")],
    )
    for r in corpus.domain_mix_weights(df, alpha=1.0).collect():
        assert r["q"] == pytest.approx(r["p"], abs=1e-5)
        assert r["sample_rate"] == pytest.approx(1.0, abs=1e-4)


def test_domain_mix_weights_partition_invariant(spark):
    df = _docs(
        spark,
        [(i, f"w{i} w{i % 3}", "en", f"s{i % 4}") for i in range(40)],
    )
    base = sorted(map(tuple, corpus.domain_mix_weights(df).collect()))
    repart = sorted(
        map(tuple, corpus.domain_mix_weights(df.repartition(7)).collect())
    )
    assert base == repart


# ---------------------------------------------------------------- dsir


def _dsir_ref(rows, target_ids, buckets=corpus.DSIR_BUCKETS, k=corpus.DSIR_K):
    """Sequential reference: hashed unigram+bigram buckets, add-k
    smoothed target/raw distributions, per-doc micro-nat-quantized
    log-ratio sum — the operator's docstring contract, in 25 lines."""
    import decimal
    import hashlib
    import math
    from collections import Counter

    def feats(text):
        ws = [x for x in text.split(" ") if x != ""]
        fs = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        return [
            int(hashlib.md5(f.encode()).hexdigest()[:14], 16) % buckets
            for f in fs
        ]

    per_doc = {doc_id: feats(text) for doc_id, text, _, _ in rows}
    cq, cp = Counter(), Counter()
    for doc_id, fs in per_doc.items():
        cq.update(fs)
        if doc_id in target_ids:
            cp.update(fs)
    nq, np_ = sum(cq.values()), sum(cp.values())

    def lr(b):
        v = (
            math.log((cp.get(b, 0) + k) / (np_ + k * buckets))
            - math.log((cq[b] + k) / (nq + k * buckets))
        ) * 1e6
        return int(
            decimal.Decimal(v).quantize(0, rounding=decimal.ROUND_HALF_UP)
        )

    out = {}
    for doc_id, fs in per_doc.items():
        out[doc_id] = (
            len(fs),
            round(sum(lr(b) for b in fs) / 1e6, 6) if fs else None,
        )
    return out


def test_dsir_weights_match_sequential_reference(spark):
    rows = [
        (1, "the quick brown fox", "en", "A"),
        (2, "the quick quick fox", "en", "A"),
        (3, "lorem ipsum dolor sit amet", "en", "B"),
        (4, "the slow brown dog", "en", "B"),
        (5, "completely different words here", "en", "B"),
    ]
    df = _docs(spark, rows)
    target = df.where("doc_id <= 2")
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in corpus.dsir_weights(df, target).collect()
    }
    want = _dsir_ref(rows, {1, 2})
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-9)
    # docs sharing the target's vocabulary score above the outliers
    assert got[1][1] > got[3][1] and got[2][1] > got[5][1]


def test_dsir_weights_target_equal_to_corpus_is_zero(spark):
    # p_hat == q_hat bucket-for-bucket -> every log-ratio is exactly 0
    df = _docs(
        spark,
        [(i, f"w{i} w{i % 3} common", "en", "s") for i in range(12)],
    )
    for r in corpus.dsir_weights(df, df).collect():
        assert r["logw"] == 0.0


def test_dsir_weights_empty_doc_has_null_weight(spark):
    df = _docs(
        spark, [(1, "some words here", "en", "s"), (2, "", "en", "s")]
    )
    out = {r["doc_id"]: r for r in corpus.dsir_weights(df, df).collect()}
    assert out[2]["n_feats"] == 0 and out[2]["logw"] is None
    assert out[1]["n_feats"] == 5 and out[1]["logw"] == 0.0


def test_dsir_weights_partition_invariant(spark):
    df = _docs(
        spark,
        [(i, f"tok{i % 7} tok{i % 5} tok{i % 3}", "en", "s") for i in range(60)],
    )
    target = corpus.dsir_target_split(df)
    base = sorted(map(tuple, corpus.dsir_weights(df, target).collect()))
    repart = sorted(
        map(
            tuple,
            corpus.dsir_weights(
                df.repartition(11), target.coalesce(1)
            ).collect(),
        )
    )
    assert base == repart


def test_dsir_target_split_is_deterministic_quarter(spark):
    df = _docs(spark, [(i, "x", "en", "s") for i in range(400)])
    a = {r["doc_id"] for r in corpus.dsir_target_split(df).collect()}
    b = {r["doc_id"] for r in corpus.dsir_target_split(df).collect()}
    assert a == b
    # md5 first hex char < '4' is a 4/16 coin
    assert 0.15 < len(a) / 400 < 0.35


def test_dsir_resample_gumbel_and_threshold_match_reference(spark):
    import hashlib
    import math

    rows = [(i, f"w{i % 5} w{i % 3} w{i % 2}", "en", "s") for i in range(30)]
    df = _docs(spark, rows)
    target = df.where("doc_id < 10")
    out = {r["doc_id"]: r for r in corpus.dsir_resample(
        df, target, threshold=-1.0
    ).collect()}
    logw = {r["doc_id"]: r["logw"] for r in corpus.dsir_weights(
        df, target
    ).collect()}
    for d, lw in logw.items():
        v = int(hashlib.md5(f"dsir-g:0:{d}".encode()).hexdigest()[:14], 16)
        g = -math.log(-math.log((v + 0.5) / 2 ** 56))
        assert out[d]["score"] == pytest.approx(round(lw + g, 6), abs=1e-9)
        assert out[d]["selected"] == (out[d]["score"] > -1.0)


def test_dsir_resample_is_deterministic_and_seed_sensitive(spark):
    df = _docs(
        spark, [(i, f"a{i % 4} b{i % 6}", "en", "s") for i in range(40)]
    )
    t = corpus.dsir_target_split(df)
    a = sorted(map(tuple, corpus.dsir_resample(df, t).collect()))
    b = sorted(map(tuple, corpus.dsir_resample(df, t).collect()))
    assert a == b
    c = sorted(map(tuple, corpus.dsir_resample(df, t, seed=1).collect()))
    assert a != c  # independent noise vector
    # the logw face is seed-independent; only the gumbel draw moves
    assert [r[:3] for r in a] == [r[:3] for r in c]


def test_dsir_resample_empty_doc_never_selected(spark):
    df = _docs(spark, [(1, "x y z", "en", "s"), (2, "", "en", "s")])
    out = {r["doc_id"]: r for r in corpus.dsir_resample(
        df, df, threshold=-1e9
    ).collect()}
    assert out[2]["score"] is None and out[2]["selected"] is False
    assert out[1]["selected"] is True


def test_corpus_report_hand_computed(spark):
    df = _docs(
        spark,
        [
            (1, "a b c", "en", "s1"),
            (2, "a b c", "en", "s2"),     # exact dup of 1
            (3, "a b c", "zh", "s1"),     # exact dup of 1 and 2
            (4, "", "en", "s1"),          # empty
            (5, "one two three four", "fr", "s3"),
        ],
    )
    r = corpus.corpus_report(df).collect()[0].asDict()
    assert r == {
        "n_docs": 5,
        "n_tokens": 3 + 3 + 3 + 0 + 4,
        "n_chars": 5 + 5 + 5 + 0 + 18,
        "n_langs": 3,
        "n_sources": 3,
        "n_empty_docs": 1,
        "min_doc_tokens": 0,
        "max_doc_tokens": 4,
        "n_exact_dup_docs": 3,
        "n_redundant_docs": 2,
    }


def test_corpus_report_partition_invariant(spark):
    df = _docs(
        spark,
        [(i, f"w{i % 9} x{i % 4}", "en", f"s{i % 5}") for i in range(50)],
    )
    assert (
        corpus.corpus_report(df).collect()
        == corpus.corpus_report(df.repartition(13)).collect()
    )


def test_apply_domain_mix_downsamples_head_keeps_tail(spark):
    rows = [(i, " ".join(f"a{i}w{j}" for j in range(40)), "en", "big")
            for i in range(60)]
    rows += [(100 + i, " ".join(f"b{i}w{j}" for j in range(40)), "en", "small")
             for i in range(4)]
    df = _docs(spark, rows)
    out = corpus.apply_domain_mix(df, alpha=0.3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # the minority source is oversampled: every doc kept, repeat owed
    assert len(by_src["small"]) == 4
    assert all(r["repeat_factor"] > 1.0 for r in by_src["small"])
    # the head source is thinned by the coin and owes no repetition
    assert 0 < len(by_src["big"]) < 60
    assert all(r["repeat_factor"] == 1.0 for r in by_src["big"])
    # survivors match the per-source rate semantics exactly
    mix = {r["source"]: r["sample_rate"]
           for r in corpus.domain_mix_weights(df, alpha=0.3).collect()}
    import hashlib
    import math
    for doc_id, _, _, src in rows:
        coin = int(hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:8], 16)
        kept = coin < math.floor(min(mix[src], 1.0) * 2 ** 32)
        assert kept == any(r["doc_id"] == doc_id for r in by_src[src])


def test_apply_domain_mix_partition_invariant(spark):
    df = _docs(
        spark,
        [(i, f"w{i % 11} x{i % 5} y{i % 3}", "en", f"s{i % 3}")
         for i in range(45)],
    )
    base = sorted(map(tuple, corpus.apply_domain_mix(df).collect()))
    repart = sorted(
        map(tuple, corpus.apply_domain_mix(df.repartition(7)).collect())
    )
    assert base == repart
