"""Banded-LSH dedup family (operators/dedup.py): recall quality gate,
bucket-cap behavior, Hamming-band pigeonhole properties, and the
connected-components convergence contract. Value parity vs DuckDB is
in test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import dedup

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_banded_recall_meets_quality_bar(spark, docs):
    """The round-2 acceptance gate: banded LSH (b=16, r=4) catches
    >= 90% of pairs with exact Jaccard >= 0.8 (theory: 1-(1-J^4)^16
    = 0.9997 at J=0.8), and is near-perfect at J >= 0.9."""
    rows = {r["j_bucket"]: r for r in dedup.minhash_banded_recall(docs).collect()}
    high = [rows[b] for b in rows if b >= 8]
    assert high, "benchmark produced no J>=0.8 pairs"
    n = sum(r["n_pairs"] for r in high)
    c = sum(r["n_caught"] for r in high)
    assert c / n >= 0.9, f"recall at J>=0.8 is {c / n:.3f}"
    top = [rows[b] for b in rows if b >= 9]
    if top:
        nt = sum(r["n_pairs"] for r in top)
        ct = sum(r["n_caught"] for r in top)
        assert ct / nt >= 0.99


def test_exact_dups_collide_on_all_bands(spark):
    """Constructed duplicates (the driver corpus has no exact dups):
    identical texts share every minhash band (n_bands = 16) and have
    SimHash Hamming distance 0; an unrelated text pairs with
    neither."""
    base = " ".join(f"tok{i % 17} word{i}" for i in range(20))
    other = " ".join(f"zz{i} qq{i * 3}" for i in range(40))
    d = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], "doc_id long, text string"
    )
    banded = {
        (r["doc_a"], r["doc_b"]): r["n_bands"]
        for r in dedup.minhash_banded_pairs(d).collect()
    }
    assert banded == {(1, 2): 16}
    ham = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_hamming_pairs(d).collect()
    }
    assert ham == {(1, 2): 0}


def test_bucket_cap_drops_mega_buckets(spark, docs):
    uncapped = dedup.minhash_banded_pairs(docs).count()
    assert dedup.minhash_banded_pairs(docs, max_bucket=1).count() == 0
    assert dedup.minhash_banded_pairs(docs, max_bucket=10_000).count() == uncapped


def test_hamming_pairs_within_bound(spark, docs):
    rows = dedup.simhash_hamming_pairs(docs, max_hamming=3).collect()
    assert rows, "no near-dup simhash pairs found"
    assert all(0 <= r["hamming"] <= 3 for r in rows)


def test_dup_clusters_on_chained_graph(spark):
    """A diameter-10 path graph: converges under sufficient max_iters
    to a single cluster; RAISES (not silently wrong) when max_iters is
    below the diameter — the contract the DuckDB oracle relies on."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    dummy_docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    out = dedup.dup_clusters(dummy_docs, max_iters=20, pairs=pairs).collect()
    assert {r["cluster_id"] for r in out} == {0}
    assert len(out) == 11
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(dummy_docs, max_iters=2, pairs=pairs)
    # sampled convergence checks (check_every) never change the result,
    # and a check interval past max_iters still checks on the last round
    sparse = dedup.dup_clusters(
        dummy_docs, max_iters=20, pairs=pairs, check_every=3
    ).collect()
    assert sorted(map(tuple, sparse)) == sorted(map(tuple, out))
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(dummy_docs, max_iters=2, pairs=pairs, check_every=99)


def test_dup_clusters_releases_superseded_rounds(spark):
    """Storage hygiene: the CC loop must NOT retain one label relation
    per round (at 20 rounds x 100 TB that's 20 cached copies). After
    the call, at most the FINAL labels checkpoint may remain persisted
    beyond what was already there."""
    sc = spark.sparkContext

    def n_persisted():
        return sc._jsc.getPersistentRDDs().size()

    before = n_persisted()
    # diameter-10 path graph => ~10 propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    dummy_docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    out = dedup.dup_clusters(dummy_docs, max_iters=20, pairs=pairs)
    assert out.count() == 11  # consume: all rounds ran and materialized
    leaked = n_persisted() - before
    assert leaked <= 1, (
        f"{leaked} checkpointed relations retained after dup_clusters — "
        "superseded rounds/edges are not being released"
    )


def test_banded_pairs_have_verified_jaccard_path(spark, docs):
    """Funnel sanity: candidates from the banded join can be verified
    with exact Jaccard restricted to the candidate set; pairs sharing
    many bands skew to high Jaccard."""
    cand = dedup.minhash_banded_pairs(docs)
    full_band = cand.where(F.col("n_bands") == 16).count()
    assert full_band > 0


def test_dedupped_corpus_materialization(spark):
    """The user-facing end of the funnel: keeper = min doc_id per
    cluster, non-keepers anti-joined away, summary arithmetic
    consistent. Two near-dup groups ({1,2,3} chained, {10,11}) plus a
    singleton 20."""
    base = " ".join(f"tok{i % 7} word{i}" for i in range(30))
    other = " ".join(f"aa{i} bb{i * 2} cc{i * 3}" for i in range(30))
    rows = [
        (1, base), (2, base), (3, base),
        (10, other), (11, other),
        (20, " ".join(f"unique{i} zz{i * 5}" for i in range(30))),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kl = {r["doc_id"]: r for r in dedup.dedup_keep_list(d).collect()}
    assert len(kl) == 6
    assert [kl[i]["cluster_id"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [kl[i]["cluster_id"] for i in (10, 11)] == [10, 10]
    assert kl[20]["cluster_id"] == 20 and kl[20]["keep"] == 1
    assert [kl[i]["keep"] for i in (1, 2, 3, 10, 11)] == [1, 0, 0, 1, 0]

    kept = {r["doc_id"] for r in dedup.dedupped_corpus(d).collect()}
    assert kept == {1, 10, 20}
    # original columns intact
    assert dedup.dedupped_corpus(d).columns == ["doc_id", "text"]

    s = dedup.dedup_summary(d).first()
    assert (s["n_docs_in"], s["n_docs_out"], s["n_removed"]) == (6, 3, 3)
    assert s["n_dup_clusters"] == 2


def test_bucket_cap_guard_with_exact_fallback(spark):
    """The web-scale boilerplate scenario: a 30-doc template
    mega-bucket is dropped by max_bucket (its quadratic band join never
    runs) while real near-dup pairs survive, and exact dedup still
    collapses the template members — the documented division of labor."""
    boiler = "lorem ipsum boilerplate navigation footer copyright terms privacy"
    base = " ".join(f"tok{i % 7} word{i}" for i in range(30))
    rows = [(i, boiler) for i in range(30)]
    rows += [(100, base), (101, base)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_banded_pairs(d, max_bucket=10)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert got == {(100, 101)}  # mega-bucket gone, real pair kept
    groups = {r["fp"]: r for r in dedup.exact_dup_groups(d).collect()}
    boiler_group = [g for g in groups.values() if g["n_docs"] == 30]
    assert len(boiler_group) == 1 and boiler_group[0]["keeper"] == 0


def test_contamination_hits_planted_leak(spark):
    """A corpus doc embedding an exact 13-word benchmark span is
    flagged with the right distinct-gram count; clean docs are not."""
    bench_words = [f"q{i}" for i in range(15)]  # 15 words -> 3 13-grams
    leak = "pre " * 3 + " ".join(bench_words[:13]) + " post" * 2
    clean = " ".join(f"w{i}" for i in range(30))
    bench = spark.createDataFrame(
        [(100, " ".join(bench_words))], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [(1, leak), (2, clean), (3, "short text")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r["n_contaminated_ngrams"]
            for r in dedup.contamination_hits(corpus, bench).collect()}
    assert rows == {1: 1}  # exactly the planted 13-gram, once


def test_contamination_check_matches_manual_split(spark, docs):
    """The self-contained %20 split equals contamination_hits on the
    same explicit split, and is non-trivial on the driver corpus
    (planted duplicates leak across the split)."""
    is_bench = (F.col("doc_id") % 20) == 0
    manual = dedup.contamination_hits(
        docs.where(~is_bench), docs.where(is_bench)
    )
    auto = dedup.contamination_check(docs)
    a = {(r["doc_id"], r["n_contaminated_ngrams"]) for r in auto.collect()}
    m = {(r["doc_id"], r["n_contaminated_ngrams"]) for r in manual.collect()}
    assert a == m
    assert a, "driver corpus should contain planted cross-split dups"


def test_contamination_oversized_split_falls_back(spark, docs):
    """An eval split whose gram set exceeds the broadcast budget must
    degrade to a shuffled hash semi-join (no executor materializes the
    set whole) with IDENTICAL rows — pinned here by forcing the budget
    to 1 gram."""
    is_bench = (F.col("doc_id") % 20) == 0
    corpus, bench = docs.where(~is_bench), docs.where(is_bench)
    normal = dedup.contamination_hits(corpus, bench)
    capped = dedup.contamination_hits(corpus, bench, max_broadcast_grams=1)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    a = {(r["doc_id"], r["n_contaminated_ngrams"]) for r in normal.collect()}
    b = {(r["doc_id"], r["n_contaminated_ngrams"]) for r in capped.collect()}
    assert a == b and a


def test_dedup_against_corpus_drops_exact_and_near_hits(spark):
    base = " ".join(f"tok{i % 17} word{i}" for i in range(40))
    near = base + " trailing extra"          # high-Jaccard variant
    fresh = " ".join(f"new{i} item{i * 7}" for i in range(40))
    short = "tiny doc"                       # < SHINGLE words: exact-only
    ref = spark.createDataFrame(
        [(100, base), (101, short)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, base), (2, near), (3, fresh), (4, short), (5, "tiny other")],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_against_corpus(new, ref).collect()
    )
    # 1 exact-dups ref, 2 shares bands with ref, 4 exact-dups the short
    # ref doc; 3 is new content and 5 is short-but-different
    assert kept == [3, 5]


def test_dedup_against_corpus_clean_batch_is_identity(spark):
    ref = spark.createDataFrame(
        [(100, " ".join(f"r{i} s{i * 3}" for i in range(30)))],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, " ".join(f"n{i}x{j} m{j * i + 7}" for j in range(25)))
         for i in range(1, 6)],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_against_corpus(new, ref).collect()
    )
    assert kept == [1, 2, 3, 4, 5]


def test_dedup_against_corpus_partition_invariant(spark, docs):
    new = docs.where("doc_id % 4 = 0")
    ref = docs.where("doc_id % 4 <> 0")
    base = sorted(
        r["doc_id"] for r in dedup.dedup_against_corpus(new, ref).collect()
    )
    repart = sorted(
        r["doc_id"]
        for r in dedup.dedup_against_corpus(
            new.repartition(9), ref.coalesce(1)
        ).collect()
    )
    assert base == repart


def test_decontaminated_corpus_drops_leaks_keeps_clean(spark):
    leak = " ".join(f"q{i} tok{i * 3}" for i in range(15))   # >= 13 words
    clean = " ".join(f"c{i} w{i * 7}" for i in range(15))
    short = "too short to carry a thirteen gram"
    bench = spark.createDataFrame(
        [(100, leak)], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, leak), (2, clean), (3, short),
         (4, "prefix " + leak)],  # contains the benchmark grams inside
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.decontaminated_corpus(train, bench).collect()
    )
    assert kept == [2, 3]
    # max_hits tolerance: the wholesale leak carries MANY shared grams
    kept_tol = sorted(
        r["doc_id"]
        for r in dedup.decontaminated_corpus(train, bench, max_hits=1).collect()
    )
    assert 1 not in kept_tol and 4 not in kept_tol and 2 in kept_tol


def test_decontaminated_corpus_clean_split_is_identity(spark, docs):
    train = docs.where("doc_id % 20 <> 0")
    # a benchmark with no overlapping grams drops nothing
    bench = spark.createDataFrame(
        [(999, " ".join(f"zz{i}qq{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    assert dedup.decontaminated_corpus(train, bench).count() == train.count()
