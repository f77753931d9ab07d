"""Table-level analogues of the reference's pairing/windowing operators
(SURVEY.md §2.3/§2.5/§2.6) over the events table:

- mutual-nearest pairing (J1's two-window pattern at table level);
- top-k per group (O3);
- band/interval assignment against an aggregated dim (J8);
- gap-based sessionization (the streaming-adjacent stateful scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def mutual_nearest_events(events: DataFrame) -> DataFrame:
    """Within each event_type, each event's nearest neighbor by value
    is its predecessor or successor on the value axis; keep mutual
    pairs (a < b). Two window passes — no O(n^2) join."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    e = events.select("event_type", "event_id", "value")
    e = e.withColumn("prev_id", F.lag("event_id").over(w)).withColumn(
        "prev_v", F.lag("value").over(w)
    )
    e = e.withColumn("next_id", F.lead("event_id").over(w)).withColumn(
        "next_v", F.lead("value").over(w)
    )
    nearest = (
        F.when(F.col("prev_id").isNull(), F.col("next_id"))
        .when(F.col("next_id").isNull(), F.col("prev_id"))
        .when(
            F.col("value") - F.col("prev_v") <= F.col("next_v") - F.col("value"),
            F.col("prev_id"),
        )
        .otherwise(F.col("next_id"))
    )
    n = e.select("event_type", "event_id", nearest.alias("nearest_id"))
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.nearest_id") == F.col("b.event_id"))
            & (F.col("b.nearest_id") == F.col("a.event_id"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
        )
    )


def topk_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("event_type", "rank", "event_id")
    )


def value_bands(events: DataFrame) -> DataFrame:
    """Assign each event to a low/high band around its type's exact
    mean. The mean compare is done in exact decimal arithmetic
    (value * n < sum) so engines can't disagree on boundary rounding.
    The bands dim is tiny -> broadcast join."""
    bands = events.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_v"),
        F.count("*").alias("n"),
    )
    return events.join(F.broadcast(bands), "event_type").select(
        "event_id",
        F.when(
            F.col("value").cast("decimal(28,6)") * F.col("n") < F.col("sum_v"), "low"
        )
        .otherwise("high")
        .alias("band"),
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Count gap-delimited sessions per user (watermark-friendly
    pattern: in streaming this is session_window / applyInPandasWithState;
    in batch a lag + cumulative-flag scan)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap = F.expr(f"INTERVAL {gap_seconds} SECOND")
    flagged = events.withColumn(
        "new_session",
        F.when(prev_ts.isNull(), 1)
        .when(F.col("ts") - prev_ts > gap, 1)
        .otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def moving_avg(events: DataFrame, frame: int = 2) -> DataFrame:
    """Per-user moving average of value over the current + previous
    ``frame`` events by time — the table-level twin of the reference's
    bounded window-frame scan (W4, pipline.py:762-789 uses
    rowsBetween(-2, ...) over forest order). Rounded to 6 decimals so
    the float is insensitive to within-frame summation order."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-frame, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("avg_recent"),
    )


def unmatched_events(events: DataFrame) -> DataFrame:
    """Residue after matching (U1, reference pipline.py:168-175
    `list.remove` loops): events of each type that did NOT end up in a
    mutual-nearest pair — expressed as a left_anti join, which at scale
    shuffles only the join keys instead of mutating per-row state."""
    pairs = mutual_nearest_events(events)
    matched = pairs.select(
        F.col("event_type"), F.col("id_a").alias("event_id")
    ).unionByName(pairs.select(F.col("event_type"), F.col("id_b").alias("event_id")))
    return (
        events.select("event_type", "event_id")
        .join(matched, ["event_type", "event_id"], "left_anti")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unmatched"))
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per event type (A6-adjacent
    distribution statistics). Exact `percentile` — one shuffle on the
    5-value group key; at 100 TB swap in approx_percentile with a
    t-digest accuracy budget (sketches merge map-side), which the
    oracle can't replay bit-for-bit — the exact version is the
    checked contract, the approx version the scale path."""
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def value_percentiles_approx_check(
    events: DataFrame, accuracy: int = 10000, budget: float = 0.01
) -> DataFrame:
    """The 100 TB twin of ``value_percentiles``, shipped WITH its own
    quality gate (same pattern as ivf_recall): computes both the exact
    percentiles and approx_percentile sketches (accuracy = Greenwald-
    Khanna 1/eps; sketches merge map-side, so the exact sort-per-group
    disappears at scale) and emits ``within_budget`` = every sketch
    value within ``budget`` relative error of the exact one. The
    sketch values themselves are engine-specific and can't be
    oracle-replayed — the cross-engine contract is the exact values
    plus the (deterministically computed) budget verdict."""
    exact = value_percentiles(events)
    approx = events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], accuracy).alias("ap")
    )

    def ok(col: str, i: int):
        e = F.col(col)
        return F.abs(F.element_at("ap", i) - e) <= F.lit(budget) * F.greatest(
            F.abs(e), F.lit(1e-9)
        )

    return (
        exact.join(approx, "event_type")
        .select(
            "event_type",
            "p50",
            "p95",
            "p99",
            (ok("p50", 1) & ok("p95", 2) & ok("p99", 3)).alias("within_budget"),
        )
    )
