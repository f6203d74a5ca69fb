"""Streaming dedup + stream-stream interval joins.

Two more §2.9 beyond-reference streaming operators, built so the SAME
function body serves batch and streaming frames (only watermarks are
conditional), which is what makes streaming==batch equality testable:

- ``streaming_dedup``: exactly-once-per-key delivery. Streaming mode
  uses ``dropDuplicatesWithinWatermark`` — state for a key is dropped
  once the watermark passes its event time, so state is bounded by
  (key cardinality within the watermark horizon), not by stream
  length. Batch mode is plain ``dropDuplicates``. The modes agree on
  the KEY SET whenever duplicates arrive within the watermark delay
  (the contract the delay is FOR); the retained NON-KEY columns are
  arrival-order-dependent streaming-side and plan-dependent
  batch-side, so full-row agreement holds only when the dedup keys
  cover every retained column (how the certified registry row uses
  it).
- ``stream_stream_click_purchase``: event-time interval join — each
  click pairs with the same user's purchases inside
  ``(click_ts, click_ts + horizon]`` (exclusive lower bound:
  purchase strictly after the click). Both sides carry watermarks and
  the join predicate carries the time bound, which is exactly what
  lets Spark expire join state (unbounded-state stream-stream joins
  are rejected by the planner). Streaming twin of the batch
  ``range_join_click_to_purchase`` query in ``__spark_entry__.py``.

State sizing at scale: dedup state ≈ distinct keys per watermark
horizon; join state ≈ events per horizon per side. Keys are user ids
(uniform) ⇒ the state-store shuffle does not skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    streaming: bool | None = None,
) -> DataFrame:
    """One row per key (see module docstring for which row); late
    duplicates beyond the watermark delay are the (documented)
    streaming/batch divergence window."""
    is_streaming = events.isStreaming if streaming is None else streaming
    # namespaced watermark column: a caller-owned "_ts" would be
    # silently clobbered and dropped
    wm = "__sd_wm_ts"
    df = events.withColumn(wm, F.col(ts_col).cast("timestamp"))
    if is_streaming:
        return df.withWatermark(wm, watermark_delay).dropDuplicatesWithinWatermark(keys).drop(wm)
    return df.dropDuplicates(keys).drop(wm)


def stream_stream_click_purchase(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark_delay: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    streaming: bool | None = None,
) -> DataFrame:
    """(user, click_ts, purchase_ts, purchase_value) for purchases in
    ``(click_ts, click_ts + horizon]`` — event-time interval join with
    watermarks on BOTH sides so join state expires."""
    is_streaming = clicks.isStreaming if streaming is None else streaming
    c = clicks.select(
        F.col(user_col).alias("c_user"), F.col(ts_col).cast("timestamp").alias("click_ts")
    )
    p = purchases.select(
        F.col(user_col).alias("p_user"),
        F.col(ts_col).cast("timestamp").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if is_streaming:
        c = c.withWatermark("click_ts", watermark_delay)
        p = p.withWatermark("purchase_ts", watermark_delay)
    cond = (
        (c["c_user"] == p["p_user"])
        & (p["purchase_ts"] > c["click_ts"])
        & (p["purchase_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"), "click_ts", "purchase_ts", "purchase_value"
    )
