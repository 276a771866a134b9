"""Event-stream batch operators: sessionization and windowed aggregation.

The reference is batch-only (SURVEY §2.8); these are the standard Spark
patterns a production corpus pipeline needs anyway — expressed so the
same logic runs over a static events table (here) or a stream (the
sessionize cumsum becomes applyInPandasWithState; the tumbling agg becomes
a watermarked window groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a session breaks when the inter-event
    gap exceeds ``gap_minutes``.  Output one row per session:
    (user_id, session_id, n_events, started_at, ended_at)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = micros - F.lag(micros).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    sid = F.sum("new_session").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        marked.withColumn("session_id", sid)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("started_at"),
            F.max("ts").alias("ended_at"),
        )
    )


def tumbling_counts(events: DataFrame, hours: int = 24) -> DataFrame:
    """Tumbling-window counts per event_type (window = day by default)."""
    bucket = F.date_trunc("day" if hours == 24 else "hour", F.col("ts"))
    return events.groupBy(
        bucket.alias("window_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
