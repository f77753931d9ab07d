"""Bucketed-table layout: the production join strategy of record.

BENCH/BASELINE.md's salt rule is a small-cluster patch ("salt when the
scan yields fewer than 4 task waves per core"); at production scale
(scan partitions >> 4x cluster cores) it never fires and the plan of
record for the repeated equi-joins of this engine — evaluation joins
on doc_id (J5, operators/evaluate.py), dedup drop-list anti-joins on
doc_id (dedup_corpus), order/lineitem revenue joins (A3-A5 relational
shells) — is BUCKETED storage: both tables pre-shuffled into the same
number of hash buckets on the join key at WRITE time, so every
subsequent join and key-grouped aggregation runs with ZERO exchanges.
At 100 TB a single saved shuffle is minutes of cluster time per query;
a table that is joined on the same key more than once pays the shuffle
exactly once, at ingest.

Spark-first shape: `DataFrameWriter.bucketBy(n, key).sortBy(key)` on a
`saveAsTable` parquet target (bucketing metadata lives in the catalog;
an explicit `path` keeps the files external, so the same layout works
against any object store). Catalyst then plans
`SortMergeJoin` over both bucketed scans with NO Exchange on either
side (a Sort may remain when a bucket spans several files — per-file
sortBy lets Spark drop it only in the one-file-per-bucket case), and
a following groupBy on the bucket key reuses the same partitioning —
audited in docs/PLANS.md (REQUIRE SortMergeJoin / FORBID Exchange) and
asserted by tests/test_bucketed.py.

At 10^12 documents the bucket count is sized so one bucket ~= one HDFS
block per file write task (e.g. 2^13-2^15 buckets); bucket pruning
keeps point lookups on the key to a single bucket scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    key: str,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize ``df`` as an external parquet table hash-bucketed
    (and per-file sorted) on ``key``; returns the catalog-backed
    DataFrame whose scans carry the bucket partitioning.

    Overwrites both the catalog entry and the files, so repeated calls
    (driver gate, bench) are idempotent."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(*(sort_cols or [key]))
        .saveAsTable(table)
    )
    return spark.table(table)


def revenue_per_order_bucketed(
    orders_b: DataFrame, lineitem_b: DataFrame
) -> DataFrame:
    """Per-order revenue over co-located bucketed tables.

    Same aggregate as top_revenue_orders' inner block (exact decimal
    sum, then double), but the join is hinted ``merge`` so the plan is
    the bucketed SortMergeJoin this module exists to prove — at the
    gate's SF the optimizer would otherwise broadcast the small side
    and the zero-exchange property would go unexercised. The groupBy
    on the bucket key then reuses the join's partitioning: the WHOLE
    plan runs without a single Exchange (audited in docs/PLANS.md)."""
    joined = lineitem_b.hint("merge").join(
        orders_b, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return joined.groupBy("o_orderkey", "o_orderstatus").agg(
        F.count("*").alias("n_items"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(28,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )
