"""Column profiling — the data-quality pass a pipeline runs before
training on a new table.

One wide aggregate computes every column's stats in a single scan
(count/nulls/distinct are all map-side combinable), then the wide row
unpivots to long form with ``stack`` — no per-column scans, no
driver-side loops. At 100 TB this is exactly one pass over the data;
exact distinct counts shuffle one (col, value-hash) pair per distinct
value — swap ``approx_count_distinct`` in via ``exact=False`` when a
±2% HLL estimate is enough (no exact-distinct shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Per-column profile in long form:
    (column, n_rows, n_nulls, n_distinct).

    ``n_distinct`` counts distinct non-null values (exact by default —
    needed when an oracle must agree bit-for-bit; HLL otherwise).
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nul_{c}"))
        aggs.append(
            (F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(c)).alias(
                f"_dis_{c}"
            )
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `_nul_{c}`, `_dis_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")
