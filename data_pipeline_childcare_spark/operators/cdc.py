"""Snapshot differencing — change-data-feed generation between two
table versions: the upstream half of CDC (operators/merge.py applies
a change feed; this one PRODUCES it from before/after snapshots when
the source system exposes none).

Shape: ONE full-outer join on the key (keyed SMJ at fact scale —
uniform key, both sides corpus-sized, the right plan) + a null-safe
struct compare; unchanged rows are filtered before anything wide is
emitted, so the output is delta-sized. At 100 TB both snapshots
should be bucketed/z-ordered on the key so the join co-locates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """(key..., change_type ∈ insert|update|delete, old_<c>, new_<c>
    for each compare col). ``update`` means ANY compare col differs
    null-safely; unchanged rows are dropped."""
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("_vo"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("_vn"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"_ko_{k}").eqNullSafe(F.col(f"_kn_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("_vo").isNotNull()
    in_new = F.col("_vn").isNotNull()
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~F.col("_vo").eqNullSafe(F.col("_vn")), F.lit("update"))
    )
    keys = [
        F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k) for k in key_cols
    ]
    vals = [
        x
        for c in compare_cols
        for x in (
            F.col("_vo").getField(c).alias(f"old_{c}"),
            F.col("_vn").getField(c).alias(f"new_{c}"),
        )
    ]
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type", *vals)
    )
