"""Structured Streaming surface: exactly-once incremental extraction,
watermarked windows, stateful sessionization across restarts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans.extract import corpus_df, extract
from ocr_spark.streaming.incremental import (
    read_stream_output,
    stream_extract,
    stream_sessionize,
    windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _rows(df):
    return sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in df.select("doc_id", "order", "kind", "text", "media_ref").collect()
    )


def test_incremental_extract_two_feeds(spark, tmp_path_factory):
    """Feed 1 drains, feed 2 arrives, second run processes ONLY the new
    files (checkpointed source offsets) — final output covers every doc
    exactly once."""
    base = tmp_path_factory.mktemp("stream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    all_docs = corpus_df(spark, 60).cache()
    chunk1 = all_docs.where(F.xxhash64("doc_id") % 2 == 0)
    chunk2 = all_docs.where(F.xxhash64("doc_id") % 2 != 0)

    chunk1.write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt)
    got1 = read_stream_output(spark, out)
    assert _rows(got1) == _rows(extract(chunk1))
    n_batches_1 = len(os.listdir(out))

    chunk2.write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt)
    got2 = read_stream_output(spark, out)
    assert _rows(got2) == _rows(extract(all_docs))
    assert len(os.listdir(out)) > n_batches_1  # new batch dirs, old untouched

    # idempotence: a third run with nothing new adds nothing
    stream_extract(spark, inp, out, ckpt)
    assert _rows(read_stream_output(spark, out)) == _rows(extract(all_docs))


def test_windowed_counts_match_batch(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("wstream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    spark.read.parquet(EVENTS).write.mode("append").parquet(inp)

    events_stream = spark.readStream.schema(
        spark.read.parquet(EVENTS).schema
    ).parquet(inp)
    q = (
        windowed_event_counts(events_stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    expected = (
        spark.read.parquet(EVENTS)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    # the final (open) windows may be withheld by the watermark; every
    # emitted row must match batch, and most windows must have closed
    exp = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in expected.collect()
    }
    got_rows = got.collect()
    assert len(got_rows) >= 0.5 * len(exp)
    for r in got_rows:
        assert exp[(r["window_start"], r["event_type"])] == (
            r["n"],
            round(r["sum_value"], 6),
        )


def test_stateful_sessionize_across_restarts(spark, tmp_path_factory):
    """State (last_ts, session count) survives a restart: run over the
    first half of the timeline, then the second; the final counts must
    equal the batch computation over the whole table."""
    base = tmp_path_factory.mktemp("sstream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    events = spark.read.parquet(EVENTS)
    n = events.count()
    mid = events.orderBy("ts").limit(n // 2).agg(F.max("ts")).first()[0]
    events.where(F.col("ts") <= mid).write.mode("append").parquet(inp)

    def run():
        stream = spark.readStream.schema(events.schema).parquet(inp)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            stream_sessionize(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    events.where(F.col("ts") > mid).write.mode("append").parquet(inp)
    run()

    # latest emitted row per user == final state
    got = spark.read.parquet(out)
    w = got.groupBy("user_id").agg(
        F.max_by("n_sessions", "n_events").alias("n_sessions"),
        F.max("n_events").alias("n_events"),
    )
    from ocr_spark.operators.pairing import sessionize

    expected = sessionize(events)
    g = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in w.collect()}
    e = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in expected.collect()}
    assert g == e


def test_sessionize_event_time_timeout(spark, tmp_path_factory):
    """The event-time TTL variant: same counts as the batch sessionize
    on a drained feed (timers are driven by the watermark, so they are
    inert under AvailableNow until data progresses past TTL — safe for
    drain-and-stop jobs, unlike processing-time timers), state expiry
    keyed to the data's own clock."""
    from ocr_spark.streaming.incremental import SESSION_STATE_TTL_MS

    base = tmp_path_factory.mktemp("etstream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    events = spark.read.parquet(EVENTS)
    events.write.mode("append").parquet(inp)

    stream = spark.readStream.schema(events.schema).parquet(inp)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        stream_sessionize(
            stream, state_ttl_ms=SESSION_STATE_TTL_MS, event_time_timeout=True
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    w = got.groupBy("user_id").agg(
        F.max_by("n_sessions", "n_events").alias("n_sessions"),
        F.max("n_events").alias("n_events"),
    )
    from ocr_spark.operators.pairing import sessionize

    expected = sessionize(events)
    g = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in w.collect()}
    e = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in expected.collect()}
    assert g == e


def test_sessionize_requires_ttl_for_event_time(spark):
    import pytest as _pytest

    events = spark.read.parquet(EVENTS)
    with _pytest.raises(ValueError):
        stream_sessionize(events, event_time_timeout=True)


class _FakeState:
    """Minimal GroupState stand-in for driving the kernel directly."""

    def __init__(self, watermark_ms: int):
        self.exists = False
        self.hasTimedOut = False
        self._watermark_ms = watermark_ms
        self.timeout_ts = None

    def update(self, value):
        self.get = value
        self.exists = True

    def remove(self):
        self.exists = False

    def getCurrentWatermarkMs(self) -> int:
        return self._watermark_ms

    def setTimeoutTimestamp(self, timestamp_ms: int) -> None:
        if timestamp_ms <= self._watermark_ms:
            raise ValueError(
                "Timeout timestamp must be later than the current watermark"
            )
        self.timeout_ts = timestamp_ms


def test_event_time_ttl_clamped_to_watermark():
    """A backfill user whose last event is older than (watermark - TTL)
    must NOT register a timer at-or-before the watermark — Spark throws
    IllegalArgumentException for that, killing the whole query. The
    kernel clamps to watermark+1 so the stale state is simply reaped
    at the next micro-batch."""
    import pandas as pd

    from ocr_spark.streaming.incremental import _make_sessionize_kernel

    ttl_ms = 24 * 3600 * 1000
    watermark_ms = 10_000 * 1000 * 1000  # far ahead of the backfill data
    kernel = _make_sessionize_kernel(ttl_ms, event_time=True)
    state = _FakeState(watermark_ms)
    pdf = pd.DataFrame({"ts": pd.to_datetime([0, 5_000], unit="s")})
    out = list(kernel(("u1",), iter([pdf]), state))

    assert state.timeout_ts == watermark_ms + 1
    assert out[0]["n_events"].iloc[0] == 2
    # a fresh (non-backfill) user still gets the real event-time TTL
    fresh = _FakeState(watermark_ms=0)
    pdf2 = pd.DataFrame({"ts": pd.to_datetime([7_000], unit="s")})
    list(kernel(("u2",), iter([pdf2]), fresh))
    assert fresh.timeout_ts == 7_000 * 1000 + ttl_ms


def test_sessionize_event_time_backfill_replay(spark, tmp_path_factory):
    """End-to-end backfill: run 1 establishes a high watermark from
    recent events; run 2 appends a user whose events are far behind
    (watermark - TTL). The query must complete (no timer-vs-watermark
    crash) and every recent user's counts must match batch."""
    from ocr_spark.streaming.incremental import SESSION_STATE_TTL_MS

    base = tmp_path_factory.mktemp("bfstream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    events = spark.read.parquet(EVENTS)
    # shift the real timeline ~1000 days forward for run 1
    recent = events.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1000 DAYS")
    )
    recent.write.mode("append").parquet(inp)

    def run():
        stream = spark.readStream.schema(events.schema).parquet(inp)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            stream_sessionize(
                stream,
                state_ttl_ms=SESSION_STATE_TTL_MS,
                event_time_timeout=True,
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # run 2: backfill user 10^6 with events ~1000 days behind the watermark
    backfill = (
        events.limit(5)
        .withColumn("user_id", F.lit(1_000_000))
        .withColumn("event_id", F.col("event_id") + 10_000_000)
    )
    backfill.write.mode("append").parquet(inp)
    run()  # old code: IllegalArgumentException from the state store

    got = spark.read.parquet(out)
    w = got.groupBy("user_id").agg(
        F.max_by("n_sessions", "n_events").alias("n_sessions"),
        F.max("n_events").alias("n_events"),
    )
    from ocr_spark.operators.pairing import sessionize

    expected = sessionize(recent)
    g = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in w.collect()}
    e = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in expected.collect()}
    # the backfill user may have been dropped as late data or emitted,
    # depending on Spark's late-row filtering — both are safe; the
    # recent population must be exact either way
    g.pop(1_000_000, None)
    assert g == e
