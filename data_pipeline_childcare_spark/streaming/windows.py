"""Event-time windows + session windows with watermarks.

Streaming analogs of the batch window/session operators. Both
functions accept static OR streaming DataFrames — the expressions are
identical; only the watermark matters in streaming mode (it bounds the
state store and defines late-data drop).

State sizing at scale: tumbling windows keep one row of state per
(key, window); session windows merge on arrival — state is per OPEN
session, so the watermark delay directly caps state size. Keys are
user ids (uniform) ⇒ no skew in the state-store shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    streaming: bool | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time counts per event_type."""
    df = events
    is_streaming = df.isStreaming if streaming is None else streaming
    ts = F.col(ts_col).cast("timestamp")
    df = df.withColumn("_ts", ts)
    if is_streaming:
        df = df.withWatermark("_ts", watermark_delay)
    win = F.window("_ts", window_duration, slide) if slide else F.window("_ts", window_duration)
    return df.groupBy(win.alias("win"), F.col("event_type")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    streaming: bool | None = None,
) -> DataFrame:
    """Session windows (gap-merged) per user — the streaming twin of
    ``operators.sessions.sessionize`` (same gap semantics, state-store
    merged instead of window-ranked)."""
    df = events
    is_streaming = df.isStreaming if streaming is None else streaming
    df = df.withColumn("_ts", F.col(ts_col).cast("timestamp"))
    if is_streaming:
        df = df.withWatermark("_ts", watermark_delay)
    return df.groupBy(
        F.session_window(F.col("_ts"), gap).alias("sw"), F.col(user_col)
    ).agg(F.count("*").alias("n_events")).select(
        F.col(user_col),
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
    )
