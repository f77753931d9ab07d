"""Bucketed-table layout (plans/bucketed.py): the zero-exchange
co-located join the 100 TB design names as its plan of record.

Asserts BOTH halves of the claim: (a) the bucketed join + key-grouped
aggregate produce exactly the plain shuffled-join values, and (b) the
physical plan contains a SortMergeJoin and NO Exchange anywhere —
the whole point of paying the shuffle once at write time."""

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans.bucketed import revenue_per_order_bucketed, write_bucketed

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("buckets"))
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ob = write_bucketed(
        orders, "t_orders_bucketed", f"{tmp}/orders", 4, "o_orderkey"
    )
    lb = write_bucketed(
        lineitem, "t_lineitem_bucketed", f"{tmp}/lineitem", 4, "l_orderkey"
    )
    yield orders, lineitem, ob, lb
    spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_bucketed")


def test_bucketed_join_values_match_plain_join(spark, bucketed_pair):
    orders, lineitem, ob, lb = bucketed_pair
    got = {
        (r["o_orderkey"], r["o_orderstatus"]): (r["n_items"], r["revenue"])
        for r in revenue_per_order_bucketed(ob, lb).collect()
    }
    want = {
        (r["o_orderkey"], r["o_orderstatus"]): (r["n_items"], r["revenue"])
        for r in (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderkey", "o_orderstatus")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(28,6)"
                    )
                )
                .cast("double")
                .alias("revenue"),
            )
            .collect()
        )
    }
    assert got == want


def test_bucketed_join_plan_has_no_exchange(bucketed_pair):
    _, _, ob, lb = bucketed_pair
    plan = (
        revenue_per_order_bucketed(ob, lb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # the scans must actually carry the bucket metadata (not a plain
    # parquet read that happened to avoid a shuffle some other way)
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan


def test_bucketed_point_lookup_prunes_buckets(spark, bucketed_pair):
    """A key-equality filter scans ONE bucket, not the table — the
    10^12-row point-lookup path. autoBucketedScan demotes a bare
    filter scan to a plain one (no downstream distribution to
    exploit), so pin bucketed reading on for this query."""
    _, _, ob, _ = bucketed_pair
    first_key = ob.select("o_orderkey").first()["o_orderkey"]
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf, None)
    spark.conf.set(conf, "false")
    try:
        plan = (
            ob.where(F.col("o_orderkey") == first_key)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        if old is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, old)
    assert "SelectedBucketsCount: 1 out of 4" in plan, plan


def test_bucketed_groupby_reuses_bucket_partitioning(spark, bucketed_pair):
    _, _, ob, _ = bucketed_pair
    plan = (
        ob.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
