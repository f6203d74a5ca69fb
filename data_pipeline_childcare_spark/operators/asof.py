"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Composition of existing DataFrame ops (no UDF): union the two sides
tagged by origin into one event stream, sort within each key by time,
and carry the last-seen right-side payload forward with a window
``last(..., ignorenulls=True)``. One shuffle on the join key; within
each key the window sort is the only ordering cost — the same shape a
native as-of join would pick at scale, and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts ≤ left_ts within the same `on` key (null when none).

    Ties on timestamp: right rows sort before left rows at the same
    instant, so an exactly-simultaneous right row IS visible to the
    left row (`<=` semantics, matching DuckDB ASOF JOIN).
    """
    l_tag = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_left_row"].dataType).alias("_left_row"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select("_left_row.*", *[f"{c}{suffix}" for c in right_payload])
    )


def asof_join_self(
    source: DataFrame,
    on: str,
    left_pred: Column,
    right_pred: Column,
    left_ts: Column,
    right_ts: Column,
    left_cols: list[tuple[str, Column]],
    right_payload: list[tuple[str, Column]],
    suffix: str = "_asof",
) -> DataFrame:
    """Single-scan :func:`asof_join` for the common case where both
    sides are row-disjoint slices of the SAME source (e.g. clicks vs
    purchases of one event stream). The two-frame form scans the
    source twice — once per filtered side — before the union; here the
    tagged union frame is built directly from ONE scan with
    side-conditional projections (guide §6 I/O: the second full pass
    over the table disappears at every scale).

    ``left_pred``/``right_pred`` MUST be mutually exclusive (a row
    matching both is tagged LEFT only, where the two-frame form would
    emit it on both sides — use :func:`asof_join` for overlapping
    slices). Rows matching neither are dropped by the pushed-down
    filter. Everything downstream — the (key, ts, side) window sort,
    the last(ignorenulls) carry-forward, `<=` tie semantics — is the
    asof_join code path operating on an identical tagged multiset, so
    results are row-identical to asof_join(source.filter(left_pred)…,
    source.filter(right_pred)…).

    ``left_cols`` / ``right_payload`` are (output_name, expression)
    pairs playing the role of the two-frame form's side projections;
    ``left_cols`` must include the join key if the caller wants it in
    the output (the two-frame form exposes every left column)."""
    l_struct = F.struct(*[e.alias(n) for n, e in left_cols])
    tagged = source.filter(left_pred | right_pred).select(
        F.col(on),
        F.when(left_pred, left_ts).otherwise(right_ts).alias("_ts"),
        F.when(left_pred, F.lit(1)).otherwise(F.lit(0)).alias("_side"),
        F.when(left_pred, l_struct).alias("_left_row"),
        *[F.when(right_pred, e).alias(f"_r_{n}") for n, e in right_payload],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.select(
        "*",
        *[
            F.last(F.col(f"_r_{n}"), ignorenulls=True).over(w).alias(f"{n}{suffix}")
            for n, _ in right_payload
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select("_left_row.*", *[f"{n}{suffix}" for n, _ in right_payload])
    )
