"""CDC merge (upsert/delete) and funnel analysis — batch relational
ops every warehouse pipeline needs, engine-native.

``merge_changes`` is the MERGE INTO statement as a composition:
latest-change-wins dedup (window over the change log), then
anti-join + union against the snapshot. Shapes: one window shuffle
over the CHANGES (usually ≪ snapshot), one key-equi anti-join —
broadcastable when the change batch is small, which is the common
case; the snapshot is never shuffled when the change side broadcasts.
At 100 TB the snapshot-side win is partition pruning: partition the
snapshot by key range/date and only rewrite partitions containing
change keys (the Delta/Iceberg MERGE strategy; the pure-DataFrame
form here is the fallback for plain parquet).

``funnel_counts`` is ordered-sequence conversion: how many users
reached step 1, then step 2 AFTER step 1, then step 3 AFTER step 2.
Expressed as cascading conditional aggregates over ONE frame
shuffled once by user — step k's earliest-completion time feeds the
step k+1 condition. No UDFs, no per-user Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a change log to a snapshot → the merged snapshot.

    ``changes`` carries the snapshot's columns plus ``op_col`` in
    {'I','U','D'} and ``seq_col`` (a monotonically increasing change
    id). Multiple changes per key collapse to the LATEST by seq;
    deletes drop the key, inserts/updates replace the row wholesale.
    """
    w = Window.partitionBy(key_col).orderBy(F.desc(seq_col))
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    surviving = snapshot.join(
        F.broadcast(latest.select(key_col)), key_col, "left_anti"
    )
    applied = latest.filter(F.col(op_col) != "D").drop(op_col, seq_col)
    return surviving.unionByName(applied)


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion counts → (step_idx, step, n_users):
    n_users at index k = users with some steps[0] event, followed
    STRICTLY LATER by a steps[1] event, ..., followed strictly later
    by a steps[k] event (earliest-completion chaining, the standard
    funnel semantics).

    One shuffle by user; each stage is a conditional min over the
    same aggregate, computed stage-by-stage because stage k's
    earliest time parameterizes stage k+1's condition.
    """
    per_user = events.groupBy(user_col).agg(
        F.collect_list(F.struct(ts_col, type_col)).alias("_evs")
    )
    # stage times as nested array reductions: t0 = min ts of step0;
    # tk = min ts of stepk with ts > t(k-1). array_min skips nulls.
    stage_cols = []
    prev = None
    for i, step in enumerate(steps):
        if prev is None:
            expr = F.array_min(
                F.transform(
                    "_evs",
                    _stage_lambda(step, ts_col, type_col, None),
                )
            )
        else:
            expr = F.array_min(
                F.transform(
                    "_evs",
                    _stage_lambda(step, ts_col, type_col, F.col(f"_t{i - 1}")),
                )
            )
        per_user = per_user.withColumn(f"_t{i}", expr)
        prev = step
        stage_cols.append(f"_t{i}")
    counts = per_user.agg(
        *[
            F.count(F.col(c)).alias(f"_n{i}")
            for i, c in enumerate(stage_cols)
        ]
    )
    rows = [
        F.struct(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"_n{i}").alias("n_users"),
        )
        for i, step in enumerate(steps)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("_r")).select(
        "_r.step_idx", "_r.step", "_r.n_users"
    )


def _stage_lambda(step: str, ts_col: str, type_col: str, after):
    """Build the per-event lambda for one funnel stage; a factory so
    the closure captures values instead of growing lambda arity
    (PySpark derives lambda arity from the Python param count)."""
    if after is None:
        return lambda e: F.when(e[type_col] == step, e[ts_col])
    return lambda e: F.when(
        (e[type_col] == step) & (e[ts_col] > after), e[ts_col]
    )
