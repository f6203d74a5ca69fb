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
- ``stream_stream_click_purchase_left``: the LEFT-OUTER variant —
  null-extended rows for unmatched clicks emit only after the join
  window expires past the global watermark (see its docstring for
  the measured emission frontier).
- ``stream_stream_click_purchase_full``: the FULL-OUTER variant —
  BOTH sides' unmatched rows gate on the global watermark, with
  ASYMMETRIC frontiers (click: strict, horizon-shifted; purchase:
  non-strict, no horizon term — see its docstring for the measured
  boundaries).

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


def _click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str,
    watermark_delay: str,
    user_col: str,
    ts_col: str,
    streaming: bool | None,
    how: str,
) -> DataFrame:
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
    # full-outer emits purchase-only rows whose click side is NULL —
    # the user id must come from whichever side is present. Inner/left
    # keep the original projection (c_user is never NULL there).
    user = (
        F.coalesce(F.col("c_user"), F.col("p_user"))
        if how == "fullOuter"
        else F.col("c_user")
    )
    return c.join(p, cond, how).select(
        user.alias("user_id"), "click_ts", "purchase_ts", "purchase_value"
    )


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
    return _click_purchase_join(
        clicks, purchases, horizon, watermark_delay, user_col, ts_col,
        streaming, "inner",
    )


def stream_stream_click_purchase_left(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark_delay: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    streaming: bool | None = None,
) -> DataFrame:
    """LEFT-OUTER event-time interval join — the classic stateful-
    streaming correctness trap the inner variant doesn't exercise:
    matched pairs emit immediately (inner semantics), but an UNMATCHED
    click emits its null-extended row only when the engine can PROVE
    no future purchase will pair with it — i.e., when its join window
    has fully expired from state.

    Measured emission frontier (pinned by
    tests/test_streaming.py::test_left_outer_null_rows_emit_only_after_expiry
    and the registry oracle): with both sides on ``watermark_delay``
    and the join window ``(click_ts, click_ts + horizon]``, an
    unmatched click's null row appears iff

        click_ts + horizon  <  W_global   (STRICT)

    where ``W_global = min over sides of floor_ms(max event time) −
    delay`` (Spark's EventTimeStats tracks max event time in whole
    milliseconds; the global watermark is the MIN across the two
    input watermarks under the default multipleWatermarkPolicy). A
    click exactly AT the frontier (click_ts + horizon == W_global)
    stays in state, un-emitted — that's the strictness the oracle's
    ``<`` mirrors. Null rows arrive in the micro-batch AFTER the
    watermark crosses (Spark emits them during state eviction, in a
    no-data batch or the next data batch) — never in the batch that
    ingested the click.

    Batch mode is the plain left-outer join (every unmatched click
    emits); an end-of-stream availableNow run equals the batch join
    FILTERED to ``matched OR expired-by-W_global`` — the exact
    predicate the registry oracle encodes, which is what makes this
    family hash-certifiable.

    State sizing: identical to the inner variant (events per horizon
    per side) plus the null-emission bookkeeping bit per left row —
    the watermark bounds both identically at any corpus size.
    """
    return _click_purchase_join(
        clicks, purchases, horizon, watermark_delay, user_col, ts_col,
        streaming, "leftOuter",
    )


def stream_stream_click_purchase_full(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark_delay: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    streaming: bool | None = None,
) -> DataFrame:
    """FULL-OUTER event-time interval join — the symmetric trap the
    left-outer variant only half-exercises: BOTH sides' unmatched rows
    are gated on the global watermark, and because the interval is
    ASYMMETRIC the two expiry frontiers differ.

    Measured emission frontiers (pinned by
    tests/test_streaming.py::test_full_outer_two_sided_null_emission
    and the registry oracle), with ``W_global = min over sides of
    floor_ms(max side event time) − delay``:

    - unmatched CLICK null row emits iff
      ``click_ts + horizon < W_global`` (STRICT — a click exactly at
      the frontier stays in state): a purchase arriving later carries
      event time ≥ W_global and still satisfies ``purchase_ts ≤
      click_ts + horizon`` when equality holds. Same frontier as the
      left-outer family.
    - unmatched PURCHASE null row emits iff
      ``purchase_ts <= W_global`` (NON-strict — a purchase exactly AT
      the watermark emits; measured: 12:00:00.000 emits at W=12:00,
      12:00:00.001 stays): a purchase pairs only with strictly
      EARLIER clicks (``click_ts < purchase_ts``), and any click
      still to arrive carries event time ≥ W_global — at equality no
      future click can strictly precede it. No horizon term, and the
      strictness flips relative to the click side: the asymmetry of
      the interval is the whole trap.

    Both frontiers gate on the GLOBAL (min-across-sides) watermark —
    measured: a purchase under its own side's watermark but over the
    global one stays in state. Batch mode is the plain full-outer
    join; an end-of-stream availableNow run equals the batch join
    filtered to ``matched OR expired`` per side with exactly these
    two predicates, which is what makes the family hash-certifiable.

    State sizing: identical to the inner variant (events per horizon
    per side) plus one null-emission bookkeeping bit per row on EACH
    side; the watermark bounds both identically at any corpus size.
    """
    return _click_purchase_join(
        clicks, purchases, horizon, watermark_delay, user_col, ts_col,
        streaming, "fullOuter",
    )
