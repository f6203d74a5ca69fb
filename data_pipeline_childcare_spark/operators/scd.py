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
