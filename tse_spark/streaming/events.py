"""Watermarked Structured Streaming variants of the batch event
analytics in :mod:`tse_spark.operators.events`.

The batch operators answer "what happened" over a static table; these
answer the same questions over an unbounded stream with event-time
semantics:

- late data is admitted up to the watermark delay and dropped after —
  state for closed windows/sessions is then reclaimed, which is what
  makes the operators runnable forever at web scale (unbounded state is
  the classic streaming-sessionization failure mode);
- sessions use Spark's native ``session_window`` (gap-merge sessions,
  state-store backed) instead of the batch lag+cumsum — the same
  session boundaries (a new session starts when the gap exceeds
  ``gap_minutes``), verified against the batch operator in
  tests/test_streaming.py by running the stream with
  ``trigger(availableNow=True)`` over the same input.

Output columns match the batch operators (epoch-second bigints) so the
two paths are interchangeable downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# ts declared TIMESTAMP (not NTZ): Spark watermarks require an
# instant-typed event-time column; the session TZ is pinned UTC, so the
# fixture's naive parquet timestamps read as the same instants the
# batch operators see
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory (the sandbox
    stand-in for Kafka/queue ingestion; swapping the source is a
    one-line change because every operator below takes a DataFrame)."""
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def _epoch(c):
    return c.cast("timestamp").cast("long")


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """(user_id, n_events, t_start, t_end) per gap-session, emitted when
    the watermark passes the session close (append mode).

    State note (100 TB / unbounded): ``session_window`` keeps one state
    row per OPEN session per user, partitioned by the grouping key
    across executors; the watermark bounds how long a session can stay
    open, so state is O(active users within the watermark horizon) —
    never O(history)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            "user_id",
            F.session_window("ts", f"{gap_minutes} minutes"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(_epoch(F.col("ts"))).alias("t_start"),
            F.max(_epoch(F.col("ts"))).alias("t_end"),
        )
        .select("user_id", "n_events", "t_start", "t_end")
    )


def hourly_window_agg_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """(hour_start, event_type, n, total) per tumbling hour, finalized
    once the watermark passes the window end (append mode)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(
            _epoch(F.col("window.start")).alias("hour_start"),
            "event_type",
            "n",
            "total",
        )
    )
