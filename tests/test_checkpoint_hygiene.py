"""Long-session checkpoint hygiene (VERDICT r4 #7, made a contract).

dedup/similarity's iterative operators localCheckpoint internal sketch
relations whose blocks deliberately outlive the query (lineage
truncation means the blocks ARE the data; dedup.py:173/:335,
similarity.py:137 document the caller-owned lifetime). The supported
long-session pattern is bench.py's between-query sweep — this test
runs the three heaviest checkpoint users back-to-back TWICE and pins
that (a) the sweep returns the session's persisted-block set to empty,
so the storage footprint is FLAT across rounds rather than
accumulating, and (b) per-round superseded blocks (CC label rounds)
were already released by the operators themselves.
"""

from __future__ import annotations

import os

import pytest

from ocr_spark.operators import dedup, similarity, tokenizer

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _persisted(spark) -> list:
    return list(spark.sparkContext._jsc.getPersistentRDDs().values())


def _sweep(spark) -> None:
    for jrdd in _persisted(spark):
        jrdd.unpersist(False)


@pytest.fixture(scope="module")
def tables(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return docs, emb


def test_storage_footprint_flat_across_rounds(spark, tables):
    docs, emb = tables
    _sweep(spark)
    assert not _persisted(spark)

    per_round_blocks = []
    for _ in range(2):
        dedup.simhash_hamming_pairs(docs).count()
        dedup.minhash_banded_pairs(docs).count()
        similarity.ivf_recall(
            emb, codebook=similarity.kmeans_codebook(emb)
        ).count()
        # the operators' session-lifetime checkpoints are present now —
        # the documented caller-owned residue the sweep exists for
        per_round_blocks.append(len(_persisted(spark)))
        _sweep(spark)
        assert not _persisted(spark), "sweep must empty the block set"

    # flat across rounds: every round's caller-owned residue is
    # bounded by the THREE documented checkpoints (simhash sim,
    # minhash band keys, kmeans centroids) — a long-session leak
    # (e.g. CC label rounds retained) would exceed the bound. Exact
    # counts are not comparable round-to-round: the JVM ContextCleaner
    # holds these weakly and collects out-of-scope checkpoints on its
    # own GC schedule (observed both [3,2] and [1,3] orderings).
    assert all(n <= 3 for n in per_round_blocks), per_round_blocks


def test_cc_rounds_release_superseded_blocks_under_sweep_contract(spark, tables):
    """dup_clusters' per-round checkpoint release (dedup.py:553/:561)
    bounds the DURING-query footprint too: after the clusters action,
    at most the final labels + the operator's documented sketch
    relations remain — not one block per CC round."""
    docs, _ = tables
    _sweep(spark)
    dedup.dup_clusters(
        docs, max_iters=30, pairs=dedup.minhash_banded_pairs(docs)
    ).count()
    leftover = len(_persisted(spark))
    assert leftover <= 4, f"{leftover} blocks retained — CC rounds leaking?"
    _sweep(spark)


def test_bpe_trainer_releases_every_round_checkpoint(spark, tables):
    """bpe_train_merges checkpoints the symbol relation once per merge
    round and must release each superseded round AND the final relation
    (the answer is the returned Python merge table, not a DataFrame) —
    so unlike the sketch operators it owes the caller a ZERO-residue
    session, with no sweep required."""
    docs, _ = tables
    _sweep(spark)
    merges = tokenizer.bpe_train_merges(docs.limit(50), n_merges=4)
    assert merges, "trainer should learn at least one merge here"
    leftover = len(_persisted(spark))
    assert leftover == 0, f"{leftover} blocks retained — BPE rounds leaking?"


def test_semdedup_bounded_residue_under_sweep_contract(spark, tables):
    """semdedup_corpus nests dup_clusters over the embedding near-dup
    edges: the per-round release contract must hold through the
    composition — after the survivors action, at most the final CC
    labels (plus ContextCleaner slack) remain, never one block per
    round or the edge relation."""
    _, emb = tables
    _sweep(spark)
    similarity.semdedup_corpus(emb).count()
    leftover = len(_persisted(spark))
    assert leftover <= 3, f"{leftover} blocks retained — semdedup leaking?"
    _sweep(spark)
    assert not _persisted(spark)
