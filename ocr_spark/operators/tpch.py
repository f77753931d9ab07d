"""Relational-shell benchmarks on the TPC-H-ish tables: classic
scan-agg (A3-A5 analogues), broadcast-join + top-k, and rollup.

Money sums are decimal-cast BEFORE aggregation (exact, order
independent) then cast to double at the end — deterministic across
engines and shuffle orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dsum(col, scale="decimal(28,6)"):
    return F.sum(F.col(col).cast(scale))


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: filter pushes into the parquet scan, partial
    aggregation map-side, 9 groups out."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").cast("double").alias("sum_qty"),
            _dsum("l_extendedprice").cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def top_revenue_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, segment: str = "BUILDING"
) -> DataFrame:
    """TPC-H Q3 shape: small filtered dims broadcast into the lineitem
    scan; exact decimal revenue; deterministic top-10."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_orderdate"
    )
    rev = (
        lineitem.join(F.broadcast(ords), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)


def event_rollup(events: DataFrame) -> DataFrame:
    """Two-level rollup (per-type + grand total) — the reference's
    per-image -> corpus metric rollup shape (evaluate_data.py:346-369)."""
    return (
        events.rollup("event_type")
        .agg(
            F.count("*").alias("n"),
            _dsum("value").cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n",
            "sum_value",
        )
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: 6-table join where customer and supplier sit in
    the same nation, restricted to one region.

    Plan intent at 100 TB: region/nation/supplier/customer are the
    small side — Catalyst broadcast-joins them (region+nation are KB,
    supplier/customer fit the 10 MB auto-broadcast at test SFs and are
    explicitly marked here); the only big shuffle is
    lineitem JOIN orders on orderkey, which AQE sizes. Join order is
    left to the optimizer — the declared shape lets it start from the
    selective region filter."""
    dims = (
        region.where(F.col("r_name") == region_name)
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders with at least one
    returned lineitem (the testdata lacks l_commitdate, so returnflag
    stands in for the lateness predicate), counted per priority.
    left_semi shuffles only the distinct orderkeys of the probe side."""
    returned = lineitem.where(F.col("l_returnflag") == "R")
    return (
        orders.join(
            returned.select("l_orderkey").distinct(),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )
