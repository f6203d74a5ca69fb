"""Skew-handling utilities for hot-key aggregations and joins.

AQE's skew-join splitting covers sort-merge joins at runtime; these
helpers cover the remaining cases a 100 TB pipeline hits:

- salted two-phase aggregation: a hot groupBy key (one user with 10^8
  events, one shingle in every document) overloads a single reducer.
  Salting spreads phase 1 over ``n_salts`` partial keys; phase 2
  combines the partials — both phases map-side combinable.
- frequency-capped inverted index: drop join keys whose document
  frequency exceeds a cap BEFORE the pair-generating self-join (the
  standard df-cut for shingle indexes; a shingle in half the corpus
  generates |corpus|²/4 pairs and carries no similarity signal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "total",
) -> DataFrame:
    """Two-phase salted sum: groupBy(key, salt) → groupBy(key).

    Equivalent to ``groupBy(key).sum(value)`` for any data; worth the
    second (tiny) shuffle only when a key is hot enough to overwhelm
    one reducer. The salt is a uniform hash of a random-ish row
    attribute, so phase-1 partials are balanced.
    """
    salt = (F.abs(F.xxhash64(F.col(value_col), F.monotonically_increasing_id())) % n_salts).alias(
        "_salt"
    )
    phase1 = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias(out_col))


def broadcast_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Hot-key equi-join: replicate the SMALL side n_salts× and salt
    the big side, so one hot key spreads over n_salts reducers.

    Only needed when the small side is too big to broadcast outright
    but the join key is skewed; with a broadcastable small side,
    ``big.join(broadcast(small), on)`` already avoids the skew.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt", (F.abs(F.xxhash64(F.monotonically_increasing_id())) % n_salts).cast("int")
    )
    return big_salted.join(small_rep, [on, "_salt"]).drop("_salt")


def df_capped_index(
    index: DataFrame,
    key_col: str,
    max_df: int,
) -> DataFrame:
    """Drop inverted-index keys with document frequency > max_df before
    a pair-generating self-join (hot-shingle cut)."""
    freq = index.groupBy(key_col).agg(F.count("*").alias("_df"))
    keep = freq.filter(F.col("_df") <= max_df).select(key_col)
    return index.join(keep, key_col, "left_semi")


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Shuffle-key skew pre-flight: ONE row describing how a prospective
    groupBy/join key is distributed — the report that decides salting
    (`salted_sum`), broadcast, or AQE skew-join BEFORE a 100 TB shuffle
    is launched.

    Columns: n_rows, n_keys, max_count, p50_count / p90_count /
    p99_count (exact percentiles of per-key multiplicity),
    top1_share_u / topn_share_u (fraction of all rows owned by the
    hottest 1 / ``top_n`` keys, integer micros), gini_u (Gini
    coefficient of the key-count distribution, micros),
    hot_key_factor_u (max_count / mean_count, micros — the reducer
    overload ratio salting must spread).

    Scale design: per-key counts (one exchange, map-side combinable) →
    count-of-counts rollup (second, tiny exchange): the profile table
    is sized by DISTINCT MULTIPLICITY VALUES, not keys — Zipf-ish data
    at any scale yields thousands of rows, so the ordered windows that
    produce exact percentiles, the grouped-data Gini and the top-N
    share are effectively free, and no global sort of the key set ever
    happens. All ratios are BIGINT/DECIMAL(38,0) floor-division micros
    (bit-exact across engines and partitionings); the grouped Gini uses
    2·Σ(i·x_i) = Σ c·k·(2·keys_before + k + 1) to stay integral.
    """
    big = "decimal(38,0)"
    counts = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cc = counts.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("k"))

    from pyspark.sql import Window

    asc_before = (
        Window.partitionBy(F.lit(0)).orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    desc_before = (
        Window.partitionBy(F.lit(0)).orderBy(F.desc("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    whole = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    en = cc.select(
        "c", "k",
        F.coalesce(F.sum("k").over(asc_before), F.lit(0)).cast("long").alias("kb"),
        F.coalesce(F.sum("k").over(desc_before), F.lit(0)).cast("long").alias("kbd"),
        F.sum("k").over(whole).cast("long").alias("tk"),
    )

    def _pct(p: int) -> F.Column:
        # smallest multiplicity c whose cumulative key count reaches p%
        return F.min(
            F.when((F.col("kb") + F.col("k")) * 100 >= F.lit(p) * F.col("tk"), F.col("c"))
        ).cast("long").alias(f"p{p}_count")

    take = F.least(
        F.col("k"), F.greatest(F.lit(0).cast("long"), F.lit(top_n) - F.col("kbd"))
    )
    agg = en.agg(
        F.sum(F.col("c").cast(big) * F.col("k")).cast(big).alias("_rows"),
        F.sum("k").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_count"),
        _pct(50), _pct(90), _pct(99),
        # 2*sum(i * x_i) over keys sorted by count asc, grouped form
        F.sum(
            (F.col("c").cast(big) * F.col("k") * (2 * F.col("kb") + F.col("k") + 1))
        ).cast(big).alias("_s2"),
        F.sum(F.col("c").cast(big) * take).cast(big).alias("_topn"),
    )
    return agg.select(
        F.col("_rows").cast("long").alias("n_rows"),
        "n_keys", "max_count", "p50_count", "p90_count", "p99_count",
        F.expr("cast(max_count as decimal(38,0)) * 1000000 div _rows")
        .cast("long").alias("top1_share_u"),
        F.expr("_topn * 1000000 div _rows").cast("long").alias("topn_share_u"),
        # grouped-data Gini: (2S - (n+1)R) / (nR), single floor division
        F.expr(
            "(_s2 - cast(n_keys + 1 as decimal(38,0)) * _rows) * 1000000 "
            "div (cast(n_keys as decimal(38,0)) * _rows)"
        ).cast("long").alias("gini_u"),
        # max/mean = max * n_keys / n_rows
        F.expr(
            "cast(max_count as decimal(38,0)) * n_keys * 1000000 div _rows"
        ).cast("long").alias("hot_key_factor_u"),
    )


def join_strategy_advisor(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    broadcast_row_limit: int = 1_000_000,
    skew_factor_u: int = 16_000_000,
    top_n: int = 10,
) -> DataFrame:
    """Measured join pre-flight: profile BOTH sides' key distributions
    (`key_skew_profile`) and emit one row with the numbers plus a
    deterministic strategy recommendation — the decision a 100 TB
    join planner makes from statistics, made explicit and auditable:

    - ``broadcast_left`` / ``broadcast_right`` when a side fits the
      row budget (dimension-sized build side beats any shuffle);
    - ``salted_skew_join`` when both sides are big and either side's
      hottest key exceeds ``skew_factor_u`` (micros, max/mean) — the
      salt factor to spread it is reported as ``salt_factor`` =
      ceil(hot/1e6) capped at 64 (pair with `broadcast_salted_join` /
      AQE skew handling);
    - ``sort_merge_join`` otherwise — uniform keys at scale.

    Output: one row, columns prefixed left_/right_ from the profile
    (n_rows, n_keys, max_count, hot_key_factor_u, gini_u) +
    recommendation string + salt_factor. Cost: the two profile
    aggregates — cheap enough to run before every planned big join,
    and the row is loggable next to the job for the post-mortem."""
    lp = key_skew_profile(left, key_cols, top_n=top_n).select(
        *[F.col(c).alias(f"left_{c}")
          for c in ("n_rows", "n_keys", "max_count", "hot_key_factor_u", "gini_u")]
    )
    rp = key_skew_profile(right, key_cols, top_n=top_n).select(
        *[F.col(c).alias(f"right_{c}")
          for c in ("n_rows", "n_keys", "max_count", "hot_key_factor_u", "gini_u")]
    )
    both = lp.crossJoin(F.broadcast(rp)).withColumn(
        "_hot",
        F.greatest(F.col("left_hot_key_factor_u"), F.col("right_hot_key_factor_u")),
    )
    rec = (
        F.when(F.col("left_n_rows") <= broadcast_row_limit, F.lit("broadcast_left"))
        .when(F.col("right_n_rows") <= broadcast_row_limit, F.lit("broadcast_right"))
        .when(F.col("_hot") >= skew_factor_u, F.lit("salted_skew_join"))
        .otherwise(F.lit("sort_merge_join"))
    )
    out = both.select("*", rec.alias("recommendation")).withColumn(
        "salt_factor",
        F.when(
            F.col("recommendation") == "salted_skew_join",
            F.least(
                F.expr("cast((_hot + 999999) div 1000000 as bigint)"),
                F.lit(64).cast("long"),
            ),
        ).otherwise(F.lit(1).cast("long")),
    )
    return out.drop("_hot")


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    certify: bool = True,
) -> DataFrame:
    """Exact inner-join cardinality prediction WITHOUT running the
    join: |A ⋈ B| = Σ_k c_A(k)·c_B(k) over matching keys — the
    histogram product a cost-based optimizer estimates from sampled
    stats, computed exactly from both sides' key-count frames. The
    count-frame join touches one row per DISTINCT key (vs one per
    output row for the real join), which is why a planner can afford
    it as a pre-flight: at 100 TB it is two map-side-combinable
    aggregates plus a distinct-key-sized equi-join.

    One row out: (left_rows, right_rows, left_keys, right_keys,
    matching_keys, predicted_rows[, actual_rows]). ``certify=True``
    (test/gate mode) also RUNS the join and counts it — the green
    oracle row is the proof the formula is the join size. Products
    and sums accumulate in DECIMAL(38,0)/HUGEINT."""
    ca = left.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("_ca"))
    cb = right.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("_cb"))
    both = ca.join(cb, on=keys)
    pred = both.agg(
        F.count(F.lit(1)).cast("long").alias("matching_keys"),
        F.sum(F.col("_ca").cast("decimal(38,0)") * F.col("_cb").cast("decimal(38,0)"))
        .cast("long")
        .alias("predicted_rows"),
    )
    sides = (
        ca.agg(
            F.sum("_ca").cast("long").alias("left_rows"),
            F.count(F.lit(1)).cast("long").alias("left_keys"),
        )
        .crossJoin(
            cb.agg(
                F.sum("_cb").cast("long").alias("right_rows"),
                F.count(F.lit(1)).cast("long").alias("right_keys"),
            )
        )
        .crossJoin(pred)
    )
    out = sides.select(
        "left_rows",
        "right_rows",
        "left_keys",
        "right_keys",
        F.coalesce("matching_keys", F.lit(0)).alias("matching_keys"),
        F.coalesce("predicted_rows", F.lit(0)).alias("predicted_rows"),
    )
    if not certify:
        return out
    actual = left.join(right, on=keys).agg(
        F.count(F.lit(1)).cast("long").alias("actual_rows")
    )
    return out.crossJoin(actual)


def pareto_concentration(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    thresholds_u: tuple[int, ...] = (500_000, 800_000, 900_000),
    bucket_shift: int = 20,
) -> DataFrame:
    """Revenue/volume concentration audit (the Lorenz/Pareto
    question: how many keys own X% of the total?) → one row
    (n_keys, total_u, top1_share_u, n_for_50 / n_for_80 / n_for_90).

    The cumulative sum over keys-sorted-by-value-DESC is computed
    TWO-LEVEL — per-key totals hash into coarse value buckets
    (``value_u div 2^bucket_shift``), bucket partials take one
    ordered window over the VALUE-RANGE-BOUNDED bucket frame, and
    each key adds only a within-bucket window — so no corpus-sized
    single-partition window exists anywhere (the distributed-cumsum
    pattern; a plain ``Window.orderBy(value)`` here would funnel
    every key through one task at 1e9 keys).

    n_for_t counts keys whose BEFORE-cumulative is still short of
    the threshold (``cum_before·1e6 < t_u·total``) — exactly the
    minimal top-key count whose running share reaches t. All math is
    integer micros / DECIMAL(38,0); ties order by (value DESC,
    keys ASC), total and deterministic."""
    v_u = F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5)).cast("long")
    per = df.groupBy(*key_cols).agg(
        F.sum(v_u.cast("decimal(38,0)")).cast("long").alias("_v")
    )
    per = per.withColumn("_bkt", F.expr("_v div " + str(1 << bucket_shift)))
    bparts = per.groupBy("_bkt").agg(
        F.sum(F.col("_v").cast("decimal(38,0)")).alias("_bsum")
    )
    wb = Window.partitionBy(F.lit(0)).orderBy(F.desc("_bkt"))
    boff = bparts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_bsum").over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("decimal(38,0)"),
        ),
    ).select("_bkt", "_off")
    wk = Window.partitionBy("_bkt").orderBy(
        F.desc("_v"), *[F.asc(c) for c in key_cols]
    )
    cum = (
        per.join(boff, on="_bkt")
        .withColumn(
            "_within",
            F.sum(F.col("_v").cast("decimal(38,0)")).over(
                wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("_cum", F.col("_off") + F.col("_within"))
        .withColumn("_before", F.col("_cum") - F.col("_v"))
    )
    total = per.agg(
        F.sum(F.col("_v").cast("decimal(38,0)")).alias("_total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("_v").alias("_maxv"),
    )
    agg = cum.crossJoin(F.broadcast(total)).agg(
        F.first("n_keys").alias("n_keys"),
        F.first("_total").cast("long").alias("total_u"),
        F.expr(
            "cast(first(_maxv) * 1000000 div first(_total) as bigint)"
        ).alias("top1_share_u"),
        *[
            F.sum(
                F.when(
                    F.col("_before") * F.lit(1_000_000)
                    < F.lit(t) * F.col("_total"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"n_for_{t // 10_000}")
            for t in thresholds_u
        ],
    )
    return agg
