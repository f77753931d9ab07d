"""IVF similarity-search tests.

The driver's sf tables carry *uniform* synthetic embeddings (no
cluster structure), so the k-means codebook cannot beat the stride
codebook there — recall parity is checked by the oracle gate instead.
Here we plant real cluster structure and verify the Lloyd refinement
does what it exists for: recover cluster centers from a degenerate
seed and lift nprobe=1 recall.
"""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from ocr_spark.operators import similarity


K = 4          # planted clusters, one per vec_id % 4
DIM = 8
N = 400
EPS = 0.05     # jitter amplitude — small vs the unit cluster axes


def _vec(i: int) -> list[float]:
    """Deterministic planted-cluster embedding: unit axis e_{i%4} plus
    a small jitter in the remaining dims. Every 100th vector (the
    stride-codebook seeds 0/100/200/300) is ≡ 0 mod 4, so ALL seeds
    fall in cluster 0 — the worst case the Lloyd refinement must fix."""
    v = [0.0] * DIM
    v[i % K] = 1.0
    for d in range(K, DIM):
        # cheap deterministic jitter, engine-independent
        v[d] = EPS * math.sin(1.0 + 0.7 * i + 1.3 * d)
    return v


@pytest.fixture(scope="module")
def clustered(spark):
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    rows = [(i, _vec(i)) for i in range(N)]
    return spark.createDataFrame(rows, schema).cache()


def _recall(df) -> float:
    [(n_queries, avg_recall)] = df.collect()
    assert n_queries == N // similarity.QUERY_EVERY
    return avg_recall


def test_kmeans_codebook_lifts_recall_on_clustered_data(clustered):
    base = _recall(similarity.ivf_recall(clustered))
    refined = _recall(
        similarity.ivf_recall(
            clustered, codebook=similarity.kmeans_codebook(clustered)
        )
    )
    # With all 4 seeds in cluster 0, the stride codebook scatters the
    # other clusters' members across near-equidistant cells; Lloyd
    # pulls at least one centroid onto each sampled cluster's mean.
    assert refined > base
    assert refined >= 0.9


def test_kmeans_codebook_deterministic(clustered):
    a = similarity.kmeans_codebook(clustered).orderBy("cell_id").collect()
    b = similarity.kmeans_codebook(clustered).orderBy("cell_id").collect()
    assert [r.cell_id for r in a] == [r.cell_id for r in b]
    assert [r.cv for r in a] == [r.cv for r in b]
    # Lloyd may drop degenerate centroids but never invents new ones
    assert 1 <= len(a) <= N // similarity.CENTROID_STRIDE


def test_kmeans_assign_covers_corpus(clustered):
    assign = similarity.ivf_assign(
        clustered, codebook=similarity.kmeans_codebook(clustered)
    )
    assert assign.count() == N
    assert assign.select("vec_id").distinct().count() == N


# -- SemDeDup composition ----------------------------------------------------


def _semdedup_rows(spark):
    # three planted groups: {0,1} duplicates on e_0, {2,3,4} duplicates
    # on e_1, {5} unique (its cosine to both axes is < 0.9); vec_id 0 is
    # the only stride-100 centroid, so every vector lands in one cell
    # and the IVF blocking is exhaustive — the CC semantics are what's
    # under test here, not the blocking
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.0, 1.0]),
        (4, [0.0, 1.0]),
        (5, [0.6, 0.8]),
    ]
    return spark.createDataFrame(rows, schema)


def test_semdedup_keeps_one_representative_per_cluster(spark):
    df = _semdedup_rows(spark)
    kept = sorted(
        r["vec_id"]
        for r in similarity.semdedup_corpus(df, threshold=0.9).collect()
    )
    assert kept == [0, 2, 5]


def test_semdedup_no_duplicates_is_identity(spark):
    df = _semdedup_rows(spark).where(F.col("vec_id").isin(0, 2, 5))
    kept = sorted(
        r["vec_id"]
        for r in similarity.semdedup_corpus(df, threshold=0.9).collect()
    )
    assert kept == [0, 2, 5]


def test_semdedup_partition_invariant(spark):
    df = _semdedup_rows(spark)
    base = sorted(
        r["vec_id"]
        for r in similarity.semdedup_corpus(df, threshold=0.9).collect()
    )
    repart = sorted(
        r["vec_id"]
        for r in similarity.semdedup_corpus(
            df.repartition(5), threshold=0.9
        ).collect()
    )
    assert base == repart == [0, 2, 5]


def test_cluster_balanced_sample_caps_every_cell(clustered):
    out = similarity.cluster_balanced_sample(clustered, cap=10).collect()
    assert len(out) == N  # every vector is returned, kept or not
    per_cell: dict[int, list] = {}
    for r in out:
        per_cell.setdefault(r["cell_id"], []).append(r)
    for cell, rows in per_cell.items():
        kept = [r for r in rows if r["kept"]]
        assert len(kept) == min(10, len(rows))
        # ranks within a cell are 1..|cell| with no gaps
        assert sorted(r["cell_rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
        assert all(r["cell_rank"] <= 10 for r in kept)


def test_cluster_balanced_sample_smaller_cap_is_subset(clustered):
    keep = lambda cap: {
        r["vec_id"]
        for r in similarity.cluster_balanced_sample(clustered, cap=cap).collect()
        if r["kept"]
    }
    assert keep(5) < keep(25)


def test_cluster_balanced_sample_partition_invariant(clustered):
    base = sorted(
        map(tuple, similarity.cluster_balanced_sample(clustered, cap=7).collect())
    )
    repart = sorted(
        map(
            tuple,
            similarity.cluster_balanced_sample(
                clustered.repartition(13), cap=7
            ).collect(),
        )
    )
    assert base == repart
