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


def burst_windows(
    events: DataFrame,
    z_threshold: float = 2.0,
    trailing: int = 24,
    min_history: int = 12,
) -> DataFrame:
    """Traffic-burst detection per event type (X105): hourly counts,
    z-score of each hour against its trailing ``trailing``-hour
    mean/stddev (the moving-baseline anomaly law query-log monitoring
    runs — Kleinberg's burst states collapsed to one level), flag
    z > ``z_threshold`` once ``min_history`` hours of baseline exist.
    The stddev is floored at 1.0 so a spike over a perfectly constant
    (sd=0) baseline still registers instead of dividing by zero.

    Returns ``(event_type, hour_start, n, z)`` for flagged hours
    (epoch-second bucket starts, z rounded to 2).  Scale shape: the
    hourly agg shuffles once on (type, hour); the trailing window
    partitions by type — per-type series fit one partition for any
    realistic type cardinality x horizon, and a per-(type, day-range)
    re-key handles degenerate single-type logs.
    """
    hour = F.floor(_epoch(F.col("ts")) / 3600) * 3600
    hourly = events.groupBy(
        hour.alias("hour_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(-trailing, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour_start",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("hist"),
    )
    sd_eff = F.greatest(F.col("sd"), F.lit(1.0))
    return (
        scored.filter(
            (F.col("hist") >= min_history)
            & F.col("sd").isNotNull()
            & ((F.col("n") - F.col("mu")) / sd_eff > z_threshold)
        )
        .select(
            "event_type",
            F.col("hour_start").cast("long").alias("hour_start"),
            F.col("n").cast("long").alias("n"),
            F.round((F.col("n") - F.col("mu")) / sd_eff, 2).alias("z"),
        )
    )
