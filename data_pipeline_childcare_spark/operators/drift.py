"""Snapshot drift detection — the data-contract diff a pipeline runs
when a new table version lands, before anything trains on it.

Two layers, one report:

- **Schema drift** is PLAN METADATA (``df.schema`` — no jobs):
  columns added, removed, or type-changed between snapshots become
  literal report rows.
- **Stats drift** runs ONE wide aggregate per snapshot over the
  SHARED columns (the :func:`operators.profile.profile_columns`
  shape: count/nulls/distinct are all map-side combinable — exactly
  one scan per snapshot at any size) joined on column name; per-column
  null rates and distinct counts compare as INTEGER micros, so the
  drift verdict is bit-exact and oracle-checkable.

A column is flagged ``drift`` when its null-rate moved more than
``null_rate_threshold_micro`` (absolute, in millionths) or its
distinct count moved more than ``distinct_rel_threshold_micro``
(relative to the old side, in millionths); otherwise ``ok``. Added /
removed / type-changed columns report the stats of the side(s) they
exist on with the respective status — a type change still profiles
both sides (null mass survives casts; the distinct counts make silent
lossy casts visible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.profile import profile_columns

MICRO = 1_000_000


def _profile_side(df: DataFrame, cols: list[str], suffix: str) -> DataFrame:
    p = profile_columns(df, cols)
    return p.select(
        "column_name",
        F.col("n_rows").alias(f"n_rows_{suffix}"),
        F.col("n_nulls").alias(f"n_nulls_{suffix}"),
        F.col("n_distinct").alias(f"n_distinct_{suffix}"),
        F.expr(f"case when n_rows > 0 then n_nulls * {MICRO} div n_rows else 0 end")
        .alias(f"null_rate_micro_{suffix}"),
    )


def snapshot_drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    null_rate_threshold_micro: int = 10_000,
    distinct_rel_threshold_micro: int = 200_000,
) -> DataFrame:
    """Drift report between snapshot A (old) and B (new) →
    one row per column union of both schemas:
    (column_name, status ∈ {added, removed, type_changed, drift, ok},
    type_a, type_b, n_rows/nulls/null_rate_micro/n_distinct per side,
    null_rate_delta_micro). Statuses are disjoint and checked in that
    order — a type-changed column reports ``type_changed`` even when
    its stats also moved."""
    types_a = {f.name: f.dataType.simpleString() for f in df_a.schema.fields}
    types_b = {f.name: f.dataType.simpleString() for f in df_b.schema.fields}
    shared = [c for c in types_a if c in types_b]
    added = [c for c in types_b if c not in types_a]
    removed = [c for c in types_a if c not in types_b]

    prof = _profile_side(df_a, shared + removed, "a").join(
        _profile_side(df_b, shared + added, "b"), "column_name", "full_outer"
    )
    ta = F.create_map(*[F.lit(x) for kv in sorted(types_a.items()) for x in kv])
    tb = F.create_map(*[F.lit(x) for kv in sorted(types_b.items()) for x in kv])
    delta = F.coalesce(F.col("null_rate_micro_b"), F.lit(0)) - F.coalesce(
        F.col("null_rate_micro_a"), F.lit(0)
    )
    # integer cross-multiplication — no float division anywhere near
    # the threshold compare, so the verdict is engine-exact
    dist_moved = F.when(
        F.col("n_distinct_a").isNotNull()
        & F.col("n_distinct_b").isNotNull()
        & (F.col("n_distinct_a") > 0),
        F.abs(F.col("n_distinct_b") - F.col("n_distinct_a")) * MICRO
        > F.lit(distinct_rel_threshold_micro) * F.col("n_distinct_a"),
    ).otherwise(F.lit(False))
    type_a_c = F.try_element_at(ta, F.col("column_name"))
    type_b_c = F.try_element_at(tb, F.col("column_name"))
    status = (
        F.when(type_a_c.isNull(), F.lit("added"))
        .when(type_b_c.isNull(), F.lit("removed"))
        .when(type_a_c != type_b_c, F.lit("type_changed"))
        .when(
            (F.abs(delta) > null_rate_threshold_micro) | dist_moved, F.lit("drift")
        )
        .otherwise(F.lit("ok"))
    )
    return prof.select(
        "column_name",
        status.alias("status"),
        type_a_c.alias("type_a"),
        type_b_c.alias("type_b"),
        "n_rows_a",
        "n_rows_b",
        "n_nulls_a",
        "n_nulls_b",
        "null_rate_micro_a",
        "null_rate_micro_b",
        delta.alias("null_rate_delta_micro"),
        "n_distinct_a",
        "n_distinct_b",
    )
