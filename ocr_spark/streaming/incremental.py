"""Structured Streaming surface: incremental extraction + event-time ops.

The reference is strictly batch (one directory sweep per process,
pipline.py:893-924; SURVEY.md §2.10) — its "incremental" story is
re-running over whatever files appeared. Here that becomes real
Structured Streaming:

- ``stream_extract``: Trigger.AvailableNow over a parquet document
  feed. The file source's checkpoint tracks which input files each
  micro-batch consumed (exactly-once source accounting across
  restarts); the sink writes each micro-batch to its own
  ``batch=<id>`` partition with overwrite, so a replayed batch after a
  mid-write crash REPLACES its partial output instead of appending a
  duplicate — idempotent-by-construction, the foreachBatch analogue of
  the snapshot-store commit protocol (plans/io.py). At production
  scale the body of ``process`` is an Iceberg MERGE/append committed
  with the batch id recorded in the snapshot summary.
- ``windowed_event_counts``: event-time tumbling-window aggregation
  with a watermark bounding state (late rows beyond the watermark are
  dropped; state for closed windows is evicted — the property that
  keeps a perpetual 100 TB/day feed's state store finite).
- ``stream_sessionize``: custom stateful operator via
  ``applyInPandasWithState`` — per-user session counting whose state
  (last event ts, open session tally) persists in the state store
  across micro-batches AND across job restarts (checkpointed), the
  streaming twin of the batch ``pairing.sessionize``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ocr_spark.plans.extract import DOCS_SCHEMA, extract

SESSION_GAP_S = 1800


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_batch: int = 64,
) -> None:
    """Drain all currently-available document files through the
    extraction plan, exactly once across restarts."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            extract(batch_df)
            .write.mode("overwrite")
            .parquet(os.path.join(output_dir, f"batch={batch_id}"))
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_stream_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.option("basePath", output_dir).parquet(output_dir + "/batch=*")


def windowed_event_counts(
    events_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling windows with bounded state."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_violations", T.LongType()),
    ]
)

_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_violations", T.LongType()),
    ]
)

# idle per-user state is evicted after this much processing time with
# no events — the property that keeps the state store finite on a
# perpetual feed with a churning user population. Applied only when
# the caller opts in (continuous deployments): with Trigger.AvailableNow
# drain-and-stop jobs, registered processing-time timers keep the
# query alive past the available data, so the TTL stays off there.
SESSION_STATE_TTL_MS = 24 * 3600 * 1000


def _make_sessionize_kernel(state_ttl_ms: int | None, event_time: bool = False):
    """Build the stateful kernel. The monotonicity contract (per-user
    event time never goes backwards ACROSS micro-batches) is CHECKED,
    not assumed: a batch whose minimum ts precedes the stored last_ts
    is counted in ``n_violations`` and surfaced in every output row,
    so an operator sees out-of-order input inflating session counts
    instead of silently trusting them. With a TTL, idle users' state
    is dropped on timeout (the last emitted row already carries their
    final totals).

    The per-batch walk is vectorized: over the SORTED timestamps,
    session starts are exactly (first element vs stored last_ts) plus
    the count of consecutive gaps > SESSION_GAP_S — one ``np.diff``
    and a comparison instead of a per-row Python loop."""
    import numpy as np  # noqa: PLC0415

    def kernel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        last_ts, n_sessions, n_events, n_violations = (
            state.get if state.exists else (None, 0, 0, 0)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            secs = np.sort(pdf["ts"].to_numpy().astype("int64")) / 1e9
            if last_ts is not None and float(secs[0]) < last_ts:
                n_violations += 1
            n_sessions += int((np.diff(secs) > SESSION_GAP_S).sum())
            if last_ts is None or secs[0] - last_ts > SESSION_GAP_S:
                n_sessions += 1
            n_events += len(secs)
            last_ts = float(secs[-1])
        state.update((last_ts, n_sessions, n_events, n_violations))
        if state_ttl_ms is not None:
            if event_time:
                # timer in EVENT time: fires once the watermark passes
                # last seen event + TTL (restart-safe, skew-immune).
                # Spark rejects a timeout timestamp at-or-before the
                # current watermark — a backfill user whose last event
                # is older than (watermark - TTL) would crash the
                # query — so clamp to just past the watermark (the
                # state is then reaped at the next micro-batch).
                state.setTimeoutTimestamp(
                    max(
                        int(last_ts * 1000) + state_ttl_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            else:
                state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "n_violations": [n_violations],
            }
        )

    return kernel


def stream_sessionize(
    events_stream: DataFrame,
    state_ttl_ms: int | None = None,
    event_time_timeout: bool = False,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session counts maintained in the state store.

    Emits the updated running totals for every user seen in each
    micro-batch; the latest row per user is the answer (output mode
    'update'). Per-user event-time monotonicity across micro-batches
    is required for counts to equal the batch ``sessionize`` — and is
    detected when violated (``n_violations`` column).

    ``state_ttl_ms``: pass SESSION_STATE_TTL_MS in CONTINUOUS
    deployments to evict idle users' state (bounded state store on a
    churning population). Default None = no timers: under
    Trigger.AvailableNow, registered PROCESSING-time timers keep the
    query alive past the available data, so drain-and-stop jobs must
    run without them.

    ``event_time_timeout``: with a TTL, expire state in EVENT time
    instead — the timer fires when the WATERMARK passes
    last_event + TTL, so eviction is driven by the data's own clock:
    restart-safe (no wall-clock coupling), identical on a backfill
    replay, and inert until the feed actually progresses — which also
    makes it safe under AvailableNow. Requires ``watermark`` on ts."""
    src = events_stream.select("user_id", "ts")
    if event_time_timeout and state_ttl_ms is None:
        raise ValueError("event_time_timeout requires state_ttl_ms")
    if event_time_timeout:
        # watermarks need a zoned timestamp (events.ts is TIMESTAMP_NTZ)
        src = src.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    elif state_ttl_ms is None:
        timeout_conf = GroupStateTimeout.NoTimeout
    else:
        timeout_conf = GroupStateTimeout.ProcessingTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_kernel(state_ttl_ms, event_time=event_time_timeout),
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
