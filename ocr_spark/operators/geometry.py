"""F12 — segment-intersection straddle test, table-level.

The reference's prototype bottom-to-top layout engine prunes vertical
column-pair links whose center-to-center segment crosses the top or
bottom edge of any merged row box on the page
(layout_analysis_bottom_to_top.py:15-38 ``cross``/``IsIntersec``,
used at :304-317 ``intersect``). The test is the classic two-stage
check: fast bounding-box rejection (``>=`` — touching rectangles
pass), then the cross-product straddle test with ``<=0`` — collinear
touching counts as an intersection.

Spark shape (designed for 10^12 docs): links ⋈ boxes is an equi-join
on doc_id with the straddle test as a residual predicate — per-page
box/link counts are bounded (tens), so the fan-out is O(links×boxes)
per document, never corpus-wide; the prune itself is a LEFT ANTI join
(a link survives iff NO box edge crosses it). All arithmetic is
64-bit integer column expressions inside whole-stage codegen — no
UDFs, no driver collection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cross(ax, ay, bx, by, cx, cy) -> Column:
    """cross(p1, p2, p3) — reference layout_analysis_bottom_to_top.py:15-20:
    z-component of (p2-p1) × (p3-p1)."""
    return (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)


def seg_intersects(x1, y1, x2, y2, x3, y3, x4, y4) -> Column:
    """IsIntersec(p1, p2, p3, p4) — reference
    layout_analysis_bottom_to_top.py:22-38. Boolean column: segment
    p1-p2 intersects segment p3-p4 (endpoints touching / collinear
    overlap count, exactly like the reference's ``>=`` + ``<=0``).

    Inputs must be integral columns; promote to long before calling —
    the product of two cross terms is up to coord^4, far past int32.
    """
    bbox = (
        (F.greatest(x1, x2) >= F.least(x3, x4))
        & (F.greatest(x3, x4) >= F.least(x1, x2))
        & (F.greatest(y1, y2) >= F.least(y3, y4))
        & (F.greatest(y3, y4) >= F.least(y1, y2))
    )
    straddle = (
        _cross(x1, y1, x2, y2, x3, y3) * _cross(x1, y1, x2, y2, x4, y4) <= 0
    ) & (_cross(x3, y3, x4, y4, x1, y1) * _cross(x3, y3, x4, y4, x2, y2) <= 0)
    return bbox & straddle


def prune_crossing_links(links: DataFrame, boxes: DataFrame) -> DataFrame:
    """The ``intersect()`` prune (reference
    layout_analysis_bottom_to_top.py:304-317): drop every link whose
    segment crosses the TOP or BOTTOM horizontal edge of any box on
    the same document; return the surviving links unchanged.

    ``links``: (doc_id, link_id, x1, y1, x2, y2) integral columns.
    ``boxes``: (doc_id, left, top, right, bottom) integral columns.
    """
    link_cols = ["x1", "y1", "x2", "y2"]
    l = links.select(
        "doc_id", "link_id", *[F.col(c).cast("long").alias(c) for c in link_cols]
    ).alias("l")
    b = boxes.select(
        "doc_id",
        *[
            F.col(c).cast("long").alias(f"b_{c}")
            for c in ["left", "top", "right", "bottom"]
        ],
    ).alias("b")
    seg = [F.col(f"l.{c}") for c in link_cols]
    lft, top, rgt, bot = (F.col(f"b.b_{c}") for c in ["left", "top", "right", "bottom"])
    crosses = seg_intersects(*seg, lft, top, rgt, top) | seg_intersects(
        *seg, lft, bot, rgt, bot
    )
    return l.join(b, (F.col("l.doc_id") == F.col("b.doc_id")) & crosses, "left_anti")


def synthetic_links(doc_table: DataFrame) -> DataFrame:
    """Deterministic per-doc link segments (the shape of the
    reference's column-pair center segments), pure expressions of
    doc_id so the DuckDB oracle replays them bit-for-bit. Four links
    per doc with mixed orientations spanning y∈[0,300) — against the
    synthetic row boxes this yields a mix of crossing, clearing and
    exactly-touching cases (integer y values land on box edges)."""
    d = doc_table.select(
        "doc_id", F.explode(F.expr("sequence(0, 3)")).alias("link_id")
    )
    x1 = (F.lit(50) + F.col("link_id") * 85).cast("long")
    return d.select(
        "doc_id",
        F.col("link_id").cast("int").alias("link_id"),
        x1.alias("x1"),
        ((F.col("doc_id") * 7 + F.col("link_id") * 13) % 300)
        .cast("long")
        .alias("y1"),
        (x1 + (F.col("doc_id") + F.col("link_id") * 2) % 120 - 60)
        .cast("long")
        .alias("x2"),
        ((F.col("doc_id") * 11 + F.col("link_id") * 29) % 300)
        .cast("long")
        .alias("y2"),
    )
