"""Event-stream batch analytics: sessionization and windowed aggregates.

Both window-function compositions are SQL-expressible and oracle-checked.
The streaming (watermarked) variants live in tse_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch(c):
    """Epoch seconds from either TIMESTAMP or TIMESTAMP_NTZ (parquet
    naive timestamps read as NTZ; session TZ is pinned UTC, so the
    two-step cast matches DuckDB's epoch())."""
    return c.cast("timestamp").cast("long")


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, n_events, t_start, t_end) — classic
    lag+cumsum gap sessionization.  Timestamps returned as epoch seconds
    (bigint) for engine-neutral comparison."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _epoch(F.col("ts")) - F.lag(_epoch(F.col("ts"))).over(w)
    marked = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(_epoch(F.col("ts"))).alias("t_start"),
            F.max(_epoch(F.col("ts"))).alias("t_end"),
        )
    )


def hourly_window_agg(events: DataFrame) -> DataFrame:
    """(hour_start, event_type, n, total) — tumbling 1h windows as
    epoch-second bucket starts (engine-neutral)."""
    hour = F.floor(_epoch(F.col("ts")) / 3600) * 3600
    return (
        events.groupBy(hour.alias("hour_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )


def top_users_by_value(events: DataFrame, k: int = 10) -> DataFrame:
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(k)
    )
