"""Data-quality expectation checks (the dbt-test / Great-Expectations
family) as one-pass aggregates — the gate a 100 TB ingest runs before
publishing a table version: uniqueness, not-null, value range,
referential integrity. Each check reduces to ONE aggregate (or one
broadcast/keyed anti-join + aggregate) over the audited table; the
audit frame is checks-sized and unions one row per check:
(check, table, column, n_violations, passed).

Violation counts, not booleans: the operator reports HOW BROKEN a
contract is (and stays cheap — no violating-row materialization; a
debugging pass re-runs the one failing predicate to fetch examples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row(check: str, table: str, column: str, violations: DataFrame) -> DataFrame:
    return violations.select(
        F.lit(check).alias("check"),
        F.lit(table).alias("table"),
        F.lit(column).alias("column"),
        F.col("n").cast("long").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


def expect_unique(df: DataFrame, table: str, *cols: str) -> DataFrame:
    """n_violations = surplus rows beyond one per key:
    ``count(*) − count(DISTINCT key)`` — one aggregate, no window.
    NULL key fields count as a value (struct packing), matching the
    'NULLs are a key too' dedup semantics."""
    v = df.agg(
        (F.count(F.lit(1)) - F.countDistinct(F.struct(*[F.col(c) for c in cols]))).alias("n")
    )
    return _row("unique", table, ",".join(cols), v)


def expect_not_null(df: DataFrame, table: str, col: str) -> DataFrame:
    v = df.agg(F.count(F.when(F.col(col).isNull(), 1)).alias("n"))
    return _row("not_null", table, col, v)


def expect_in_range(df: DataFrame, table: str, col: str, lo, hi) -> DataFrame:
    """Violations = non-null values outside [lo, hi]."""
    v = df.agg(
        F.count(
            F.when(F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1)
        ).alias("n")
    )
    return _row("in_range", table, col, v)


def expect_ref_integrity(
    child: DataFrame, child_table: str, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Orphaned children: non-null FKs with no parent row. The parent
    key set joins as a LEFT ANTI on the FK — broadcast when the
    parent is dimension-sized, keyed SMJ when both are facts."""
    orphans = (
        child.filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias("_pk")).distinct(), F.col(fk) == F.col("_pk"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _row("ref_integrity", child_table, fk, orphans)


def expectations_audit(*checks: DataFrame) -> DataFrame:
    """Union the one-row check frames into the audit table."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
