"""Deduplication operators for a large-scale training-data pipeline.

- exact dedup: hash-groupBy on a content fingerprint — one shuffle on
  the md5 key, partial aggregation map-side.
- MinHash signatures: word 5-gram shingles -> md5 -> min. All
  expression-level (sequence/transform/slice), no UDF, so the scan
  stays inside whole-stage codegen. At 100 TB the follow-up
  band-bucket self-join shuffles only (band, signature) pairs, never
  document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SHINGLE = 5


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", F.md5(F.lower("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    w = F.split("text", " ")
    d = docs.select("doc_id", w.alias("w")).where(F.size("w") >= SHINGLE)
    shingles = F.expr(
        f"transform(sequence(0, size(w) - {SHINGLE}), "
        f"i -> md5(concat_ws(' ', slice(w, i + 1, {SHINGLE}))))"
    )
    return d.select("doc_id", F.array_min(shingles).alias("minhash"))


def near_dup_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing a minhash bucket.
    The self-join runs on the tiny signature relation (doc_id, sig)."""
    sig = minhash_signatures(docs)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(b, F.col("a.minhash") == F.col("b.minhash"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.minhash").alias("bucket"),
        )
    )


# -- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 16  # demo width; production uses 64 bits + banded join


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """Per-document SimHash over word tokens, entirely expression-level
    (no UDF — the whole computation stays in whole-stage codegen).

    Bit j of the fingerprint is the sign of sum_tokens(+1/-1) where a
    token votes +1 iff the j-th hex nibble of its md5 has its high bit
    set. This is textbook Charikar SimHash with a 16-bit width so the
    unit/oracle checks stay readable; at 100 TB the same expression
    with 64 bits feeds a banded Hamming-distance self-join (4 bands of
    16 bits: near-dups within distance d collide on >=1 band), which
    shuffles only (band, fingerprint) pairs — never document text.
    """
    b = SIMHASH_BITS
    counters = F.expr(
        f"aggregate(split(text, ' '), array_repeat(0, {b}), "
        f"(acc, t) -> zip_with(acc, transform(sequence(0, {b - 1}), "
        f"j -> CASE WHEN instr('89abcdef', substr(md5(t), j + 1, 1)) > 0 "
        f"THEN 1 ELSE -1 END), (a, c) -> a + c))"
    )
    fp = F.expr(
        f"aggregate(zip_with(cnt, sequence(0, {b - 1}), "
        f"(c, j) -> CASE WHEN c > 0 THEN shiftleft(1, j) ELSE 0 END), "
        f"0, (a, v) -> a + v)"
    )
    return (
        docs.select("doc_id", counters.alias("cnt"))
        .select("doc_id", fp.cast("bigint").alias("simhash"))
    )


# -- exact n-gram Jaccard verification ------------------------------------


def jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Exact word-shingle Jaccard for MinHash candidate pairs.

    Stage 2 of the dedup funnel: the (cheap, recall-oriented) minhash
    bucket join proposes candidates; this verifies each with the exact
    set overlap. Only candidate doc_ids rejoin the shingle relation, so
    the expensive sets are materialized for the candidate subset only —
    at scale that is the difference between |corpus|^2 and |candidates|.
    Jaccard is rounded to 6 decimals (order-independent across engines).
    """
    w = F.split("text", " ")
    shingles = F.expr(
        f"array_distinct(transform(sequence(0, size(w) - {SHINGLE}), "
        f"i -> md5(concat_ws(' ', slice(w, i + 1, {SHINGLE})))))"
    )
    sh = (
        docs.select("doc_id", w.alias("w"))
        .where(F.size("w") >= SHINGLE)
        .select("doc_id", shingles.alias("sh"))
    )
    cand = near_dup_pairs(docs).select("doc_a", "doc_b")
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
        6,
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


# -- duplicate clusters (connected components) -----------------------------


def dup_clusters(docs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over the near-duplicate candidate graph:
    every doc that shares a MinHash bucket with another gets a
    cluster_id = the minimum doc_id reachable through candidate edges.

    Distributed min-label propagation (the scalable CC algorithm for
    graphs that don't fit one machine — unlike the intra-document
    union-find in layout.build_forests, which never needs to leave one
    kernel): each round joins labels across edges and keeps the
    minimum; converges in <= graph-diameter rounds, checked with a
    driver-side changed-count action per round. At 10^12 docs the same
    loop runs over bucketed edge/label tables with AQE sizing each
    round's shuffle. Returns (doc_id, cluster_id)."""
    pairs = near_dup_pairs(docs).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).cache()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .cache()
    )
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges["doc_b"] == labels["doc_id"])
            .groupBy("doc_a")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neigh, labels["doc_id"] == neigh["doc_a"], "left")
            .select(
                labels["doc_id"],
                F.least(
                    labels["label"], F.coalesce("nlabel", labels["label"])
                ).alias("label"),
            )
            .cache()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .where(F.col("u.label") != F.col("l.label"))
            .count()
        )
        labels.unpersist()
        labels = updated
        if changed == 0:
            break
    out = labels.select("doc_id", F.col("label").alias("cluster_id"))
    edges.unpersist()
    return out
