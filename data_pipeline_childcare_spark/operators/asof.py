"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Composition of existing DataFrame ops (no UDF): union the two sides
tagged by origin into one event stream, sort within each key by time,
and carry the last-seen right-side payload forward with a window
``last(..., ignorenulls=True)``. One shuffle on the join key; within
each key the window sort is the only ordering cost — the same shape a
native as-of join would pick at scale, and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
