"""Slowly-changing-dimension (Type 2) history build.

A warehouse ingesting 100 TB of fact history needs dimension
snapshots with validity intervals — the classic Kimball SCD2 shape:
one row per (key, attribute-state run) with ``valid_from`` /
``valid_to`` and a current flag. The input is an observation log
(every sighting of the key's attributes, e.g. each order carrying the
customer's then-current status); the operator compresses consecutive
runs of equal attribute values into intervals.

Scale shape: everything is windowed over ``partitionBy(key)`` with a
deterministic in-key sort — ONE hash exchange on the (uniform) key,
reused by all three window passes (run-compression lag, interval
lead, version row_number); Catalyst keeps the sort satisfied between
them. No joins, no Expand, map-sized state per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    observations: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Observation log → SCD2 interval rows.

    ``tiebreak_col`` makes the in-key ordering total (two observations
    at the same timestamp would otherwise make run compression
    nondeterministic); ties pick the higher-tiebreak observation as
    the later one, matching the oracle twin exactly.

    Returns (key, *attrs, valid_from, valid_to, version, is_current)
    with ``valid_to`` NULL on the open (current) interval.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    state: Column = F.struct(*[F.col(c) for c in attr_cols])
    changes = (
        observations.withColumn("_state", state)
        .withColumn("_prev", F.lag("_state").over(w))
        .filter(~F.col("_prev").eqNullSafe(F.col("_state")))
    )
    wc = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(wc))
        .withColumn("version", F.row_number().over(wc))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key_col, *attr_cols, "valid_from", "valid_to", "version", "is_current")
    )


def scd2_point_in_time(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    fact_ts_col: str,
    attr_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time enrichment against an SCD2 history — the lookup
    every fact table needs ("which dimension version was in effect
    when this row happened"), WITHOUT the naive
    ``ts BETWEEN valid_from AND valid_to`` theta join (quadratic
    blowup per key at scale). Because SCD2 intervals are contiguous
    per key, interval containment equals "latest valid_from ≤ fact
    ts" — the as-of formulation: one union, one per-key window, one
    last(ignorenulls) fill per payload column.

    Tie rules (all deterministic): a version starting exactly at the
    fact's timestamp IS visible (``<=``, the [valid_from, valid_to)
    convention — history rows sort before fact rows at the same
    instant); zero-length intervals from same-instant flips are
    shadowed by ordering same-instant history rows by ``version``
    ascending, so the fill reads the LAST version effective at that
    instant — exactly what a BETWEEN join against the compressed
    history returns. Facts before the first version get nulls.

    This is the asof_join shape specialized for SCD2; it exists
    separately because asof_join's (_ts, _side) window order is not
    total when a key has several versions at one instant.

    The fill is ONE last(ignorenulls) over a STRUCT of all attribute
    columns plus version — never per-column: independent per-column
    fills would backfill an attribute that is legitimately NULL in
    the effective version from an OLDER version (a stale non-null
    value, or a cross-version mix of attributes, while version_asof
    reports the newer version). The struct is non-null exactly on
    history rows, so every as-of field expands from the SAME history
    row the window elected."""
    from pyspark.sql.types import StructField, StructType

    ver_t = history.schema["version"].dataType
    asof_type = StructType(
        [StructField(c, history.schema[c].dataType) for c in attr_cols]
        + [StructField("version", ver_t)]
    )
    f_tag = facts.select(
        F.col(key_col),
        F.col(fact_ts_col).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(ver_t).alias("_ver"),
        F.struct(*[F.col(c) for c in facts.columns]).alias("_fact_row"),
        F.lit(None).cast(asof_type).alias("_h_row"),
    )
    h_tag = history.select(
        F.col(key_col),
        F.col("valid_from").cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),
        F.col("version").alias("_ver"),
        F.lit(None).cast(f_tag.schema["_fact_row"].dataType).alias("_fact_row"),
        F.struct(
            *[F.col(c).alias(c) for c in attr_cols],
            F.col("version").alias("version"),
        ).alias("_h_row"),
    )
    unioned = f_tag.unionByName(h_tag)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_ver"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_asof_row", F.last(F.col("_h_row"), ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).select(
        "_fact_row.*",
        *[F.col(f"_asof_row.{c}").alias(f"{c}{suffix}") for c in attr_cols],
        F.col("_asof_row.version").alias(f"version{suffix}"),
    )
