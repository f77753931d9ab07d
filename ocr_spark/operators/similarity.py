"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the baseline: the (small) query set is
broadcast against the corpus, the dot product runs as an expression
fold (zip_with + aggregate — JVM-side, no Python). Scale path at
100 TB: the same kernel after an LSH/IVF bucket join restricts each
query to one bucket's candidates; the broadcast shape is unchanged.

Scores are rounded to 6 decimals before ranking with a vec_id
tie-break, so ordering is stable across engines and summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def knn_cosine_topk(emb: DataFrame, every: int = 500, k: int = 10) -> DataFrame:
    """Top-k cosine neighbors for every `every`-th vector.

    Returns (query_id, rank, neighbor_id)."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.where(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = F.round(_dot("qv", "v") / (_norm("qv") * _norm("v")), 6)
    scored = pairs.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
