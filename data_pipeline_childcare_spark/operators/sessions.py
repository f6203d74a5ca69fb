"""Gap-based sessionization over an event stream.

The reference has no event-stream analytics (SURVEY.md §2.9), but a
training-data pipeline over interaction logs needs it; this is the
batch form of the classic streaming session window
(``F.session_window`` is the Structured Streaming analog — see
``streaming/``).

Shape at scale: one shuffle on the user key; the session assignment is
two window passes over each user's ordered events (lag + running sum),
then a map-side-combinable aggregate. No state store needed in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Assign a per-user session id: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``.

    Returns the input plus a 1-based ``session_id`` column.
    """
    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # timestampdiff does pure NTZ arithmetic — never consults the
    # session timezone (a cast-to-timestamp + unix_micros path shifts
    # gaps that span a DST transition under non-UTC sessions)
    gap_us = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    is_new = F.when(
        prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Roll sessions up to (user, session) rows with start/end/count."""
    s = sessionize(events, user_col, ts_col, gap_minutes, order_tiebreak)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )
