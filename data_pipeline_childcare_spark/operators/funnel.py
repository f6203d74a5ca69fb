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


def interarrival_dispersion(
    events: DataFrame,
    group_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-group inter-arrival regularity →
    (group, n_gaps, mean_gap_s_u, var_gap_s2_u, dispersion_u):
    consecutive same-user gaps in seconds, their mean and population
    variance, and the index of dispersion Var/mean² (CV² — 1e6 for a
    Poisson-like process, higher = bursty, lower = regular; the
    integer-exact stand-in for the Goh-Barabási burstiness score,
    which needs a square root).

    One (user)-keyed window for the lag, then ONE corpus aggregate
    per group: n, Σd, Σd² in DECIMAL(38,0); mean = Σd div n micro,
    variance = (n·Σd² − (Σd)²) div n² (population), dispersion =
    var·1e6 div mean² — all floor-division micros, engine-exact."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # whole elapsed seconds via the MICROSECOND diff floored: Spark's
    # timestampdiff(SECOND) counts complete units while SQL engines'
    # date_diff('second') counts boundary CROSSINGS — they disagree on
    # fractional-second timestamps; the microsecond diff is exact in
    # both and the floor division is shared
    gaps = events.select(
        F.col(group_col).alias("_g"),
        F.timestamp_diff(
            "MICROSECOND", F.lag(ts_col).over(w), F.col(ts_col)
        ).alias("_dus"),
    ).filter(F.col("_dus").isNotNull()).select(
        "_g", F.expr("_dus div 1000000").alias("_d")
    )
    agg = gaps.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(F.col("_d").cast("decimal(38,0)")).alias("_s"),
        F.sum(
            F.col("_d").cast("decimal(38,0)") * F.col("_d").cast("decimal(38,0)")
        ).alias("_s2"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n_gaps",
        F.expr(
            "cast(_s * 1000000 div cast(n_gaps as decimal(38,0)) as bigint)"
        ).alias("mean_gap_s_u"),
        F.expr(
            "cast((cast(n_gaps as decimal(38,0)) * _s2 - _s * _s) * 1000000 "
            "div (cast(n_gaps as decimal(38,0)) * cast(n_gaps as decimal(38,0))) as bigint)"
        ).alias("var_gap_s2_u"),
        F.expr(
            "CASE WHEN _s > 0 THEN "
            "cast((cast(n_gaps as decimal(38,0)) * _s2 - _s * _s) * 1000000 "
            "div (_s * _s) as bigint) END"
        ).alias("dispersion_u"),
    )


def association_rules(
    events: DataFrame,
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_support_u: int = 0,
) -> DataFrame:
    """Pairwise association rules over per-basket item SETS
    (market-basket analysis, the A-Priori k=2 tier) →
    (antecedent, consequent, n_both, n_ante, n_baskets, support_u,
    confidence_u, lift_u): support = P(A∧B), confidence = P(B|A),
    lift = P(A∧B)/(P(A)P(B)) — lift > 1e6 means positive
    association. Ordered pairs (both directions) so confidence is
    per-rule.

    Scale shape: distinct (basket, item) collapses multiplicity
    first (map-side combinable), the pair join is keyed by basket
    and bounded by per-basket ITEM-TYPE count (tiny — the item
    vocabulary), never by event multiplicity; counts then aggregate
    by pair. Lift simplifies to one exact integer ratio —
    (n_both/N)/((n_a/N)(n_b/N)) = n_both·N/(n_a·n_b) — computed in
    DECIMAL(38,0)."""
    bi = events.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    n_baskets = events.select(F.col(basket_col).alias("_b")).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    item_counts = bi.groupBy("_i").agg(
        F.count(F.lit(1)).cast("long").alias("_ni")
    )
    pairs = (
        bi.join(
            bi.select(F.col("_b"), F.col("_i").alias("_j")), on="_b"
        )
        .filter(F.col("_i") != F.col("_j"))
        .groupBy("_i", "_j")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    out = (
        pairs.join(F.broadcast(item_counts), on="_i")
        .withColumnRenamed("_ni", "n_ante")
        .join(
            F.broadcast(item_counts.select(F.col("_i").alias("_j"), F.col("_ni").alias("n_cons"))),
            on="_j",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    res = out.select(
        F.col("_i").alias("antecedent"),
        F.col("_j").alias("consequent"),
        "n_both",
        "n_ante",
        "n_baskets",
        F.expr("cast(n_both * 1000000 div n_baskets as bigint)").alias("support_u"),
        F.expr("cast(n_both * 1000000 div n_ante as bigint)").alias("confidence_u"),
        F.expr(
            "cast(cast(n_both as decimal(38,0)) * n_baskets * 1000000 "
            "div (cast(n_ante as decimal(38,0)) * n_cons) as bigint)"
        ).alias("lift_u"),
    )
    if min_support_u > 0:
        res = res.filter(F.col("support_u") >= min_support_u)
    return res


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition estimates over per-user event
    sequences → (from_type, to_type, n, row_total, p_u): counts of
    consecutive (prev → next) pairs under the total (ts, tiebreak)
    order, and the row-normalized transition probability
    ``P(next | prev) = n·1e6 div row_total`` — the empirical Markov
    chain a next-event model or a journey-map dashboard starts from.

    One (user)-keyed window for the lag, one keyed aggregate, one
    from_type-keyed window for row totals (state-vocabulary-sized).
    Integer micros — engine-exact."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = events.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_row = Window.partitionBy("from_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counts.withColumn(
        "row_total", F.sum("n").over(w_row).cast("long")
    ).select(
        "from_type",
        "to_type",
        "n",
        "row_total",
        F.expr(f"cast(n * {MICRO} div row_total as bigint)").alias("p_u"),
    )


def loo_target_encoding(
    df: DataFrame,
    id_col: str,
    category_col: str,
    target_col: str,
) -> DataFrame:
    """Leave-one-out target (mean) encoding →
    (id, category, n_category, loo_enc_u): each row's category
    encoded as the mean target of the OTHER rows in its category —
    ``(S_c − y_i) / (n_c − 1)`` — the leakage-safe form of mean
    encoding (plain mean encoding leaks each row's own label into
    its feature; LOO is the standard fix). Null when the row is its
    category's only member (no peers — the honest answer).

    Shape: one category-keyed aggregate (vocabulary-sized result)
    broadcast back over the corpus — map-only after the one
    aggregate. Integer micros, sign-safe floor division."""
    y = F.floor(F.col(target_col) * MICRO + F.lit(0.5)).cast("long")
    tagged = df.select(
        F.col(id_col), F.col(category_col).alias("_cat"), y.alias("_y")
    )
    stats = tagged.groupBy("_cat").agg(
        F.sum(F.col("_y").cast("decimal(38,0)")).alias("_s"),
        F.count(F.lit(1)).cast("long").alias("n_category"),
    )
    return tagged.join(F.broadcast(stats), on="_cat").select(
        id_col,
        F.col("_cat").alias(category_col),
        "n_category",
        F.expr(
            "CASE WHEN n_category > 1 THEN "
            "CASE WHEN _s - _y >= 0 THEN "
            "cast((_s - _y) div cast(n_category - 1 as decimal(38,0)) as bigint) "
            "ELSE -cast((-(_s - _y)) div cast(n_category - 1 as decimal(38,0)) as bigint) END "
            "END"
        ).alias("loo_enc_u"),
    )


def rfm_segments(
    orders: DataFrame,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary — the classic
    customer-value grid) → one row per key: (key, recency_days,
    frequency, monetary_u, r_score, f_score, m_score, segment).

    Scores are exact TERTILES (1..3, 3 = best): thresholds are the
    ceil(n/3) and ceil(2n/3) order statistics of each dimension's
    per-key value, computed on the quantized count frame (key-count
    bounded) and broadcast back — the per-key scoring pass is
    map-only, NO corpus-sized ntile window (the usual RFM recipe's
    ntile(3) funnels every key through one task). Recency is days
    since the key's last event relative to the corpus max date
    (lower = better, so its buckets invert). Boundary keys (value ==
    threshold) take the lower bucket — pinned, engine-identical."""
    last = orders.groupBy(key_col).agg(
        F.max(F.col(ts_col)).alias("_last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(
            F.floor(F.col(amount_col) * MICRO + F.lit(0.5)).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("monetary_u"),
    )
    gmax = orders.agg(F.max(F.col(ts_col)).alias("_gmax"))
    per = last.crossJoin(F.broadcast(gmax)).select(
        key_col,
        F.datediff(F.col("_gmax"), F.col("_last")).cast("long").alias(
            "recency_days"
        ),
        "frequency",
        "monetary_u",
    )

    def thresholds(col: str):
        counts = per.groupBy(F.col(col).alias("_v")).agg(
            F.count(F.lit(1)).cast("long").alias("_c")
        )
        w = Window.partitionBy(F.lit(0)).orderBy("_v")
        w_all = Window.partitionBy(F.lit(0)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cum = counts.withColumn("_cum", F.sum("_c").over(w)).withColumn(
            "_n", F.sum("_c").over(w_all)
        )
        return cum.agg(
            F.min(
                F.when(F.col("_cum") * 3 >= F.col("_n"), F.col("_v"))
            ).alias(f"{col}_t1"),
            F.min(
                F.when(F.col("_cum") * 3 >= F.col("_n") * 2, F.col("_v"))
            ).alias(f"{col}_t2"),
        )

    thr = (
        thresholds("recency_days")
        .crossJoin(thresholds("frequency"))
        .crossJoin(thresholds("monetary_u"))
    )

    def up_score(col: str) -> Column:  # higher = better
        return (
            F.when(F.col(col) <= F.col(f"{col}_t1"), F.lit(1))
            .when(F.col(col) <= F.col(f"{col}_t2"), F.lit(2))
            .otherwise(F.lit(3))
            .cast("int")
        )

    r_score = (
        F.when(F.col("recency_days") <= F.col("recency_days_t1"), F.lit(3))
        .when(F.col("recency_days") <= F.col("recency_days_t2"), F.lit(2))
        .otherwise(F.lit(1))
        .cast("int")
    )
    scored = per.crossJoin(F.broadcast(thr)).select(
        key_col,
        "recency_days",
        "frequency",
        "monetary_u",
        r_score.alias("r_score"),
        up_score("frequency").alias("f_score"),
        up_score("monetary_u").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ),
    )


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion-latency distribution per adjacent funnel step →
    (step, from_name, to_name, n_converted, p50_s, p90_s, max_s):
    among users who reached step k, how long the k−1 → k hop took
    (seconds, microsecond-diff floored — the engine-portable whole-
    second rule). Percentiles are exact order statistics over the
    per-step quantized duration count frame (converted-user bounded)
    — the :mod:`robust` discipline, no corpus-sized sort.

    Same conversion semantics as :func:`funnel` (strictly-after
    first occurrence); this is the "how fast", that is the "how
    many"."""
    from data_pipeline_childcare_spark.operators.robust import _group_quantile

    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    hops = []
    for i, s in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("_u2"), F.col(ts_col).alias("_ts2")
        )
        # carry the previous conversion time THROUGH the step
        # aggregate (it is constant per user, so min() reads it back)
        # — one join+agg per hop; a separate hop join would recompute
        # the whole previous-step subtree (measured 18 exchanges for
        # a 3-step funnel vs 8 in this form)
        cur = (
            cur.join(nxt, on=F.col(user_col) == F.col("_u2"))
            .filter(F.col("_ts2") > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min("_ts2").alias("_t"), F.min("_t").alias("_tp"))
        )
        hops.append(
            cur.select(
                F.lit(i).alias("step"),
                F.expr("timestampdiff(MICROSECOND, _tp, _t) div 1000000").alias(
                    "_d"
                ),
            )
        )
        cur = cur.select(user_col, "_t")
    allhops = hops[0]
    for h in hops[1:]:
        allhops = allhops.unionByName(h)
    counts = allhops.groupBy("step", F.col("_d").alias("_v")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    p50 = _group_quantile(counts, "step", "_v", "_c", 500_000, "p50_s")
    p90 = _group_quantile(counts, "step", "_v", "_c", 900_000, "p90_s")
    tops = counts.groupBy("step").agg(
        F.sum("_c").cast("long").alias("n_converted"),
        F.max("_v").alias("max_s"),
    )
    names = F.array(*[F.lit(s) for s in steps])
    return (
        tops.join(p50, on="step")
        .join(p90, on="step")
        .select(
            "step",
            F.element_at(names, F.col("step") - 1).alias("from_name"),
            F.element_at(names, F.col("step")).alias("to_name"),
            "n_converted",
            "p50_s",
            "p90_s",
            "max_s",
        )
    )


def journey_ngrams(
    events: DataFrame,
    n: int = 3,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-k most frequent user journey n-grams → (path, n_users,
    n_occurrences, rank): consecutive event-type n-grams per user
    under the total (ts, tiebreak) order — the journey-mining
    primitive behind "what do users do right before purchasing".

    One user-keyed window builds the n−1 lookaheads, one keyed
    aggregate counts occurrences and distinct users per path, one
    top-k. Ordering for rank: occurrences DESC, users DESC, path ASC
    — total and engine-identical."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    cols = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    paths = events.select(
        F.col(user_col).alias("_u"),
        F.concat_ws(">", *cols).alias("path"),
        cols[-1].isNotNull().alias("_full"),
    ).filter(F.col("_full"))
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.count_distinct("_u").cast("long").alias("n_users"),
    )
    wr = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("n_occurrences"), F.desc("n_users"), F.asc("path")
    )
    return (
        counts.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("path", "n_users", "n_occurrences", "rank")
    )


def session_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """WITHIN-SESSION ordered funnel → one row per step:
    (step, step_name, n_sessions, conv_from_prev_u, conv_from_top_u):
    a session converts to step k only if step k's event happens
    STRICTLY AFTER step k−1's conversion time INSIDE THE SAME
    session (gap-based sessionization) — the stricter product metric
    ("did it happen in one sitting") beside :func:`funnel`'s
    user-lifetime version. Counting unit = sessions.

    Same chain shape as funnel, keyed by (user, session) — one
    sessionize window + one keyed shuffle, co-partitioned joins."""
    from data_pipeline_childcare_spark.operators.sessions import sessionize

    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    sess = sessionize(
        events, user_col, ts_col, gap_minutes, order_tiebreak=tiebreak_col
    ).select(
        F.col(user_col).alias("_u"),
        F.col("session_id").alias("_sid"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_ty"),
    )
    cur = (
        sess.filter(F.col("_ty") == steps[0])
        .groupBy("_u", "_sid")
        .agg(F.min("_ts").alias("_t"))
    )
    # per-step GLOBAL aggregates (a global agg yields a row even for
    # an empty step frame, so fully-unconverted steps report 0
    # instead of vanishing)
    count_frames = [
        cur.agg(F.count(F.lit(1)).cast("long").alias("n_sessions")).select(
            F.lit(1).alias("step"), "n_sessions"
        )
    ]
    for i, s in enumerate(steps[1:], start=2):
        nxt = sess.filter(F.col("_ty") == s).select(
            F.col("_u").alias("_u2"), F.col("_sid").alias("_sid2"),
            F.col("_ts").alias("_ts2"),
        )
        cur = (
            cur.join(
                nxt,
                on=(F.col("_u") == F.col("_u2"))
                & (F.col("_sid") == F.col("_sid2")),
            )
            .filter(F.col("_ts2") > F.col("_t"))
            .groupBy("_u", "_sid")
            .agg(F.min("_ts2").alias("_t"))
        )
        count_frames.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias("n_sessions")).select(
                F.lit(i).alias("step"), "n_sessions"
            )
        )
    counts = count_frames[0]
    for fr in count_frames[1:]:
        counts = counts.unionByName(fr)
    names = F.array(*[F.lit(s) for s in steps])
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_ord = Window.partitionBy(F.lit(0)).orderBy("step")
    en = counts.withColumns(
        {
            "_top": F.max(F.when(F.col("step") == 1, F.col("n_sessions"))).over(
                w_all
            ),
            "_prev": F.lag("n_sessions").over(w_ord),
        }
    )
    return en.select(
        "step",
        F.element_at(names, F.col("step")).alias("step_name"),
        "n_sessions",
        F.expr(
            "CASE WHEN _prev IS NOT NULL AND _prev > 0 "
            f"THEN cast(n_sessions * {MICRO} div _prev as bigint) END"
        ).alias("conv_from_prev_u"),
        F.expr(
            f"CASE WHEN _top > 0 THEN cast(n_sessions * {MICRO} div _top as bigint) END"
        ).alias("conv_from_top_u"),
    ).orderBy("step")
