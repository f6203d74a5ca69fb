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


PPM = 10**6


def inclusion_dependencies(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Inclusion-dependency / foreign-key-candidate discovery over
    declared column pairs — the schema-profiling step that tells a
    pipeline which join keys are SAFE before it builds joins on them
    (the classic IND problem; SPIDER/BINDER lineage, here restricted
    to a caller-supplied candidate list because at 100 TB the
    all-pairs column search is a governance decision, not a default).

    ``pairs``: (label, child_df, child_col, parent_df, parent_col).
    For each pair the operator reports, in one row:

    - ``n_child_distinct`` — distinct non-NULL child values (NULLs
      never violate an IND, per the standard definition),
    - ``n_contained`` — how many of those exist in the parent column,
    - ``containment_ppm`` — integer parts-per-million containment
      (``(contained * 1e6) div distinct``; 1_000_000 = a valid IND,
      i.e. a foreign-key candidate),
    - ``parent_unique`` — whether the parent column is duplicate-free
      (containment + parent uniqueness = referential-integrity-grade
      FK evidence).

    Scale shape per pair: both sides reduce to their DISTINCT key
    sets first (map-side-combinable aggregates), so the containment
    join is distinct×distinct — never row×row; a dimension-sized
    parent set broadcasts (AQE converts at runtime). The per-pair
    single-row results cross-combine and union — the output is
    |pairs| rows regardless of data volume.
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    outs: list[DataFrame] = []
    for label, child, child_col, parent, parent_col in pairs:
        cvals = (
            child.select(F.col(child_col).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .distinct()
        )
        pvals = (
            parent.select(F.col(parent_col).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .distinct()
        )
        child_n = cvals.agg(F.count(F.lit(1)).alias("n_child_distinct"))
        contained = cvals.join(pvals, "_v", "left_semi").agg(
            F.count(F.lit(1)).alias("n_contained")
        )
        pu = (
            parent.select(F.col(parent_col).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .agg(
                (F.count(F.lit(1)) == F.count_distinct(F.col("_v"))).alias(
                    "parent_unique"
                )
            )
        )
        outs.append(
            child_n.join(F.broadcast(contained), how="cross")
            .join(F.broadcast(pu), how="cross")
            .select(
                F.lit(label).alias("pair_label"),
                F.col("n_child_distinct").cast("long").alias("n_child_distinct"),
                F.col("n_contained").cast("long").alias("n_contained"),
                F.expr(
                    f"if(n_child_distinct = 0, {PPM},"
                    f" (n_contained * cast({PPM} as bigint)) div n_child_distinct)"
                ).alias("containment_ppm"),
                "parent_unique",
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
