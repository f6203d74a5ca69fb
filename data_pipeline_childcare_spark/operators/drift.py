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

from pyspark.sql import DataFrame, Window
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


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str = "value",
    quant: int = 1000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic → one row
    (n_a, n_b, ks_u, ks_at_value_m): the max absolute gap between
    the two empirical CDFs, the nonparametric distribution-drift
    test that needs no binning choices (unlike PSI).

    Exactness: values quantize to integer ``quant``-ths up front
    (milli by default — the supremum over the quantized EDF equals
    the true one unless a crossing hides inside one quantum);
    the gap is computed as ``|cumA·n_b − cumB·n_a|`` — pure
    DECIMAL(38,0)/HUGEINT integers, no per-row division — and only
    the final statistic divides, floor-micro. Argmax ties break to
    the smallest value.

    Scale shape: per-side counts collapse by quantized value
    (map-side combinable), so the cumulative window runs over the
    DISTINCT-value frame — bounded by the value range × quant, not
    the corpus (the series-frame argument; 490k rows for a 0..490
    range at milli). One single-partition window over that bounded
    frame, documented."""
    a = df_a.select(
        F.floor(F.col(value_col) * quant + F.lit(0.5)).cast("long").alias("v_m")
    ).groupBy("v_m").agg(F.count(F.lit(1)).cast("long").alias("ca"))
    b = df_b.select(
        F.floor(F.col(value_col) * quant + F.lit(0.5)).cast("long").alias("v_m")
    ).groupBy("v_m").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    merged = a.join(b, on="v_m", how="full").select(
        "v_m",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.partitionBy(F.lit(0)).orderBy("v_m")
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = merged.select(
        "v_m",
        F.sum(F.col("ca").cast("decimal(38,0)")).over(w).alias("cum_a"),
        F.sum(F.col("cb").cast("decimal(38,0)")).over(w).alias("cum_b"),
        F.sum(F.col("ca").cast("decimal(38,0)")).over(w_all).alias("n_a"),
        F.sum(F.col("cb").cast("decimal(38,0)")).over(w_all).alias("n_b"),
    ).withColumn(
        "gap", F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    )
    return (
        cum.orderBy(F.desc("gap"), F.col("v_m"))
        .limit(1)
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("cast(gap * 1000000 div (n_a * n_b) as bigint)").alias("ks_u"),
            F.col("v_m").alias("ks_at_value_m"),
        )
    )


def vocab_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Vocabulary drift between two text corpora → one row
    (n_vocab_a, n_vocab_b, n_shared, n_only_a, n_only_b,
    vocab_jaccard_u): the distribution-shift signal for TEXT columns,
    where the numeric drift report (null rates, distinct counts)
    says nothing — a new crawl snapshot whose vocabulary Jaccard
    fell is talking about different things.

    A term is in a side's vocabulary when its DOCUMENT frequency ≥
    ``min_df`` (per-doc distinct tokens first, so one spammy doc
    can't mint vocabulary). Shape: per side one explode + two keyed
    aggregates (map-side combinable), one full-outer join on the
    term, one scalar reduce — all exact integers."""
    def vocab(df: DataFrame, name: str) -> DataFrame:
        from data_pipeline_childcare_spark.functions.text import tokenize

        toks = df.select(
            F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("_t")
        )
        return (
            toks.groupBy("_t")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") >= min_df)
            .select(F.col("_t"), F.lit(1).alias(name))
        )

    va, vb = vocab(df_a, "_ina"), vocab(df_b, "_inb")
    merged = va.join(vb, on="_t", how="full")
    return merged.agg(
        F.sum(F.coalesce("_ina", F.lit(0))).cast("long").alias("n_vocab_a"),
        F.sum(F.coalesce("_inb", F.lit(0))).cast("long").alias("n_vocab_b"),
        F.sum(
            F.when(F.col("_ina").isNotNull() & F.col("_inb").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_shared"),
        F.sum(
            F.when(F.col("_ina").isNotNull() & F.col("_inb").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_only_a"),
        F.sum(
            F.when(F.col("_ina").isNull() & F.col("_inb").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_only_b"),
    ).select(
        "n_vocab_a",
        "n_vocab_b",
        "n_shared",
        "n_only_a",
        "n_only_b",
        F.expr(
            "CASE WHEN n_vocab_a + n_vocab_b - n_shared > 0 THEN "
            "cast(n_shared * 1000000 div (n_vocab_a + n_vocab_b - n_shared) as bigint) END"
        ).alias("vocab_jaccard_u"),
    )
