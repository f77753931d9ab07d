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
    ]
)

_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: fold this micro-batch's events (sorted by ts)
    into the user's running (last_ts, n_sessions, n_events)."""
    last_ts, n_sessions, n_events = (
        state.get if state.exists else (None, 0, 0)
    )
    for pdf in pdfs:
        ts = pdf["ts"].sort_values()
        secs = ts.astype("int64") / 1e9
        for t in secs:
            if last_ts is None or t - last_ts > SESSION_GAP_S:
                n_sessions += 1
            last_ts = float(t)
            n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def stream_sessionize(events_stream: DataFrame) -> DataFrame:
    """Per-user session counts maintained in the state store.

    Emits the updated running totals for every user seen in each
    micro-batch; the latest row per user is the answer (output mode
    'update'). Requires per-user event-time monotonicity ACROSS
    micro-batches (true for an append-only time-ordered feed)."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
