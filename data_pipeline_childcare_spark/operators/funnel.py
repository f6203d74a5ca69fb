"""Funnel conversion and cohort retention — the two product-analytics
aggregates every event pipeline ships (Mixpanel/Amplitude semantics),
expressed as keyed joins and map-side-combinable aggregates.

Funnel: a user converts to step k at the FIRST occurrence of step
k's event STRICTLY AFTER their step-(k−1) conversion time (the
ordered-sequence definition — not "did both events ever happen").
Each step is a user-keyed equi-join against the previous step's
(user, t) frame; after the first shuffle the chain stays
co-partitioned on user, so an n-step funnel is one shuffle plus
n−1 co-partitioned joins at any corpus size.

Cohort retention: users are cohorted by the week of their first
event; a cohort×offset cell counts users with ANY event that many
weeks later. Weeks are integer epoch-day div 7 — engine-portable,
timezone-free. Conversions and retention rates are integer-micro
floor divisions (the fixed-point discipline).

Reference parity: beyond-reference (the brief's analytics family);
complements operators/sessions.py (sessionization) and
operators/timeline.py (cumulative timelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel → one row per step:
    (step, step_name, n_users, conv_from_prev_u, conv_from_top_u).

    conv_from_prev_u is null on step 1 (no previous);
    conv_from_top_u is 1e6 on step 1 by construction. Counts are
    distinct converting users; the tiny |steps|-row result frame
    carries the rate math on a provably small single-partition
    window (documented)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    frames = [cur.select(F.lit(1).alias("step"), F.col(user_col))]
    for i, s in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("_u2"), F.col(ts_col).alias("_ts2")
        )
        cur = (
            cur.join(nxt, on=F.col(user_col) == F.col("_u2"))
            .filter(F.col("_ts2") > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min("_ts2").alias("_t"))
        )
        frames.append(cur.select(F.lit(i).alias("step"), F.col(user_col)))
    allsteps = frames[0]
    for fr in frames[1:]:
        allsteps = allsteps.unionByName(fr)
    counts = allsteps.groupBy("step").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    names = F.array(*[F.lit(s) for s in steps])
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_ord = Window.partitionBy(F.lit(0)).orderBy("step")
    enriched = counts.withColumns(
        {
            "_top": F.max(F.when(F.col("step") == 1, F.col("n_users"))).over(w_all),
            "_prev": F.lag("n_users").over(w_ord),
        }
    )
    return (
        enriched.select(
            "step",
            F.element_at(names, F.col("step")).alias("step_name"),
            "n_users",
            F.expr(
                "CASE WHEN _prev IS NOT NULL AND _prev > 0 "
                f"THEN cast(n_users * {MICRO} div _prev as bigint) END"
            ).alias("conv_from_prev_u"),
            F.expr(
                f"CASE WHEN _top > 0 THEN cast(n_users * {MICRO} div _top as bigint) END"
            ).alias("conv_from_top_u"),
        )
        .orderBy("step")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention →
    (cohort_week, week_offset, n_users, cohort_size, retention_u).

    cohort_week is the epoch-week of the user's first event;
    week_offset 0 rows ARE the cohort sizes (every user is active in
    their first week by definition), which pins retention_u's
    denominator without a second scan."""
    wk = events.select(
        F.col(user_col).alias("_u"),
        F.expr(
            f"cast(datediff(to_date({ts_col}), date '1970-01-01') div 7 as bigint)"
        ).alias("_w"),
    )
    first = wk.groupBy("_u").agg(F.min("_w").alias("cohort_week"))
    active = wk.distinct()
    cells = (
        active.join(first, on="_u")
        .groupBy("cohort_week", (F.col("_w") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    w = Window.partitionBy("cohort_week").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    enriched = cells.withColumn(
        "_size", F.max(F.when(F.col("week_offset") == 0, F.col("n_users"))).over(w)
    )
    return enriched.select(
        "cohort_week",
        "week_offset",
        "n_users",
        F.col("_size").alias("cohort_size"),
        F.expr(
            f"cast(n_users * {MICRO} div _size as bigint)"
        ).alias("retention_u"),
    )
