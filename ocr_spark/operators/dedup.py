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
