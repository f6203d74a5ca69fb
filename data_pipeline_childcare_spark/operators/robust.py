"""Robust statistics and distribution-free intervals — the
anomaly-detection / uncertainty leg of the measurement family
(raneval ranks, claseval classifies, regeval regresses, drift
compares; this flags outliers and calibrates intervals).

Everything here runs on the QUANTIZED-VALUE COUNT FRAME: values
floor-quantize to integer milli up front, per-group counts collapse
by distinct value (map-side combinable at any corpus size), and
order statistics come from cumulative windows over that
distinct-value frame — bounded by the value range × quantization,
never the corpus (the skew-profile / KS discipline). Exact integer
order statistics, no approximate percentiles, no floats anywhere.

- :func:`robust_outliers` — median / MAD per group (the
  breakdown-point-0.5 robust location/scale pair) and the
  |x − med| > k·MAD outlier rule (Hampel identifier; the compare is
  pure integers — no consistency-constant float needed because k is
  calibrated against MAD directly).
- :func:`conformal_interval` — split conformal prediction (Vovk;
  Angelopoulos-Bates 2021 tutorial form): the ⌈(n+1)(1−α)⌉-th
  smallest calibration nonconformity is the distribution-free
  interval half-width; finite-sample coverage ≥ 1−α regardless of
  the predictor. Reported with the EMPIRICAL test coverage so the
  guarantee is observable in the output row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _group_median(
    counts: DataFrame, group_col: str, v_col: str, c_col: str, out: str
) -> DataFrame:
    """Lower median per group from a (group, value, count) frame: the
    smallest value whose cumulative count reaches (n+1) div 2."""
    w = Window.partitionBy(group_col).orderBy(v_col)
    cum = counts.withColumn("_cum", F.sum(c_col).over(w)).withColumn(
        "_n",
        F.sum(c_col).over(
            Window.partitionBy(group_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    return cum.groupBy(group_col).agg(
        F.min(
            F.when(F.col("_cum") >= F.expr("(_n + 1) div 2"), F.col(v_col))
        ).alias(out)
    )


def robust_outliers(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    k: int = 5,
    quant: int = 1000,
) -> DataFrame:
    """Median/MAD outlier audit per group → (group, n, median_m,
    mad_m, n_outliers, outlier_frac_u).

    Two passes of the same shape: collapse to (group, milli value,
    count), cumulative window over the distinct-value frame for the
    median; then the same for |x − median| to get the MAD; finally
    one keyed aggregate counts rows with |x − med| > k·MAD (Hampel
    identifier — k·MAD is an integer product, no float). MAD = 0
    (over half the group identical) flags any deviation, the
    documented degenerate."""
    vals = df.select(
        F.col(group_col).alias("_g"),
        F.floor(F.col(value_col) * quant + F.lit(0.5)).cast("long").alias("_v"),
    )
    counts = vals.groupBy("_g", "_v").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    med = _group_median(counts, "_g", "_v", "_c", "median_m")
    dev_counts = (
        counts.join(med, on="_g")
        .select("_g", F.abs(F.col("_v") - F.col("median_m")).alias("_d"), "_c")
        .groupBy("_g", "_d")
        .agg(F.sum("_c").alias("_c"))
    )
    mad = _group_median(dev_counts, "_g", "_d", "_c", "mad_m")
    flagged = (
        counts.join(med, on="_g")
        .join(mad, on="_g")
        .groupBy("_g", "median_m", "mad_m")
        .agg(
            F.sum("_c").cast("long").alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("_v") - F.col("median_m"))
                    > F.lit(k) * F.col("mad_m"),
                    F.col("_c"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
    return flagged.select(
        F.col("_g").alias(group_col),
        "n",
        "median_m",
        "mad_m",
        "n_outliers",
        F.expr(f"cast(n_outliers * {MICRO} div n as bigint)").alias(
            "outlier_frac_u"
        ),
    )


def conformal_interval(
    calib: DataFrame,
    test: DataFrame,
    truth_col: str = "truth",
    pred_col: str = "pred",
    alpha_u: int = 100_000,
    quant: int = 1000,
) -> DataFrame:
    """Split conformal prediction interval → one row
    (n_calib, n_test, alpha_u, qhat_m, coverage_u, guarantee_u).

    qhat is the ⌈(n+1)(1−α)⌉-th smallest calibration |error| (exact
    integer order statistic over the quantized count frame — rank
    computed as ``n + 1 − ((n+1)·α_u div 1e6)`` so the ceiling is
    integer-exact); coverage_u is the test fraction with
    |error| ≤ qhat; guarantee_u = 1e6 − alpha_u for eyeballing the
    finite-sample bound next to the empirical number. qhat is null
    (infinite interval — the honest answer) when the rank exceeds
    n_calib."""
    nc_c = calib.select(
        F.floor(
            F.abs(F.col(pred_col) - F.col(truth_col)) * quant + F.lit(0.5)
        )
        .cast("long")
        .alias("_e")
    )
    counts = nc_c.groupBy("_e").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    w = Window.partitionBy(F.lit(0)).orderBy("_e")
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(w_all)
    )
    # rank = ceil((n+1)(1-alpha)) = n + 1 - floor((n+1)*alpha)  when
    # (n+1)*alpha is not integral, and the same expression works at
    # integrality because both sides are exact integers
    qhat = cum.groupBy("_n").agg(
        F.min(
            F.when(
                F.col("_cum")
                >= F.expr(f"_n + 1 - ((_n + 1) * {alpha_u}) div {MICRO}"),
                F.col("_e"),
            )
        ).alias("qhat_m")
    )
    te = test.select(
        F.floor(
            F.abs(F.col(pred_col) - F.col(truth_col)) * quant + F.lit(0.5)
        )
        .cast("long")
        .alias("_e")
    )
    cov = te.crossJoin(F.broadcast(qhat)).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(
            F.when(F.col("_e") <= F.col("qhat_m"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("_covered"),
        F.first("_n").alias("n_calib"),
        F.first("qhat_m").alias("qhat_m"),
    )
    return cov.select(
        "n_calib",
        "n_test",
        F.lit(alpha_u).cast("long").alias("alpha_u"),
        "qhat_m",
        F.expr(f"cast(_covered * {MICRO} div n_test as bigint)").alias(
            "coverage_u"
        ),
        F.lit(MICRO - alpha_u).cast("long").alias("guarantee_u"),
    )


def poisson_table(lam: float = 1.0, bound: int = 10) -> list[tuple[int, int]]:
    """Quantized inverse CDF of Poisson(lam): [(cum_threshold_u, k)],
    tail folded into the last row — the same baked-CASE sampling
    scheme as operators/dp (one shared Python function generates both
    engines' plans, so the seeded draw is bit-identical)."""
    import math

    masses, cum, out = [], 0.0, []
    for k in range(bound + 1):
        masses.append(math.exp(-lam) * lam**k / math.factorial(k))
    for k, m in enumerate(masses):
        cum += m
        out.append((min(MICRO, math.floor(cum * MICRO + 0.5)), k))
    out[-1] = (MICRO, bound)
    return out


def _poisson_case(u_expr: str, lam: float = 1.0) -> str:
    t = poisson_table(lam)
    branches = "\n".join(f"WHEN {u_expr} < {thr} THEN {k}" for thr, k in t[:-1])
    return f"(CASE {branches} ELSE {t[-1][1]} END)"


def poisson_bootstrap_mean(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_replicas: int = 40,
    salt: str = "boot-1",
    alpha_u: int = 50_000,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the mean via the
    POISSON bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    for massive data streams" — the bootstrap that works distributed:
    resampling-with-replacement weights are independent Poisson(1)
    draws per (row, replica), so no replica ever needs a global
    sample). One row out: (n, mean_u, ci_lo_u, ci_hi_u, n_replicas,
    alpha_u).

    Determinism: weights come from the baked inverse-CDF CASE over
    the portable md5 draw of (salt, row id, replica) — the seeded
    discipline shared with operators/dp; re-runs and the SQL twin
    reproduce the interval bit-exactly (swap the salt per analysis
    epoch for fresh randomness). CI rule: replica means sorted
    ascending, lo rank = floor(B'·α/2)+1, hi rank = B' − floor(B'·α/2),
    where B' is the SURVIVING replica count (replicas whose Poisson
    weights are all zero on a tiny corpus produce no mean and drop
    out; both tail ranks use the same B' so the interval stays
    symmetric — B' = B on any non-degenerate input).

    Scale shape: one explode ×B (map-only), one combinable aggregate
    to B rows, order statistics on the B-row frame. All integer
    micros; replica means are sign-safe floor divisions."""
    from data_pipeline_childcare_spark.operators.dp import uniform_draw_sql

    u = uniform_draw_sql(
        f"concat(cast(`{id_col}` as string), ':', cast(_b as string))", salt
    )
    wexpr = _poisson_case(u)
    v_u = F.floor(F.col(value_col) * MICRO + F.lit(0.5)).cast("long")
    rep = df.select(
        F.col(id_col),
        v_u.alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1))).alias("_b"),
    ).withColumn("_w", F.expr(wexpr))
    means = (
        rep.groupBy("_b")
        .agg(
            F.sum(F.col("_w").cast("decimal(38,0)") * F.col("_v")).alias("_num"),
            F.sum(F.col("_w").cast("decimal(38,0)")).alias("_den"),
        )
        .select(
            "_b",
            F.expr(
                "CASE WHEN _den > 0 THEN "
                "CASE WHEN _num >= 0 THEN cast(_num div _den as bigint) "
                "ELSE -cast((-_num) div _den as bigint) END END"
            ).alias("_mean"),
        )
        .filter(F.col("_mean").isNotNull())
    )
    w_ord = Window.partitionBy(F.lit(0)).orderBy(F.asc("_mean"), F.asc("_b"))
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = means.select(
        "_mean",
        F.row_number().over(w_ord).alias("_r"),
        F.count(F.lit(1)).over(w_all).alias("_nb"),
    )
    # BOTH tail ranks derive from the SURVIVING replica count _nb
    # (all-zero-weight replicas on a tiny corpus drop out of `means`):
    # mixing a constant-B lower rank with a dynamic-_nb upper rank
    # would skew the interval asymmetric exactly when replicas drop.
    # _nb == n_replicas on any non-degenerate input, so the common
    # case (and the SQL twin) is unchanged.
    tail = F.expr(f"cast(_nb * {alpha_u // 2} div {MICRO} as bigint)")
    ci = ranked.agg(
        F.max(
            F.when(F.col("_r") == tail + F.lit(1), F.col("_mean"))
        ).alias("ci_lo_u"),
        F.max(
            F.when(F.col("_r") == F.col("_nb") - tail, F.col("_mean"))
        ).alias("ci_hi_u"),
        F.first("_nb").cast("long").alias("n_replicas"),
    )
    point = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v_u.cast("decimal(38,0)")).alias("_s"),
    ).select(
        "n",
        F.expr(
            "CASE WHEN n > 0 THEN "
            "CASE WHEN _s >= 0 THEN cast(_s div cast(n as decimal(38,0)) as bigint) "
            "ELSE -cast((-_s) div cast(n as decimal(38,0)) as bigint) END END"
        ).alias("mean_u"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n",
        "mean_u",
        "ci_lo_u",
        "ci_hi_u",
        "n_replicas",
        F.lit(alpha_u).cast("long").alias("alpha_u"),
    )


def _group_quantile(
    counts: DataFrame, group_col: str, v_col: str, c_col: str, q_u: int, out: str
) -> DataFrame:
    """Exact lower quantile per group from a (group, value, count)
    frame: the smallest value whose cumulative count reaches
    ``ceil(q·n)`` (rank = (q_u·n + 1e6 − 1) div 1e6, floored at 1)."""
    w = Window.partitionBy(group_col).orderBy(v_col)
    cum = counts.withColumn("_cum", F.sum(c_col).over(w)).withColumn(
        "_n",
        F.sum(c_col).over(
            Window.partitionBy(group_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    rank = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(_n * {q_u} + {MICRO} - 1) div {MICRO}"),
    )
    return cum.groupBy(group_col).agg(
        F.min(F.when(F.col("_cum") >= rank, F.col(v_col))).alias(out)
    )


def winsorize_audit(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    lo_u: int = 10_000,
    hi_u: int = 990_000,
    quant: int = 1000,
) -> DataFrame:
    """Per-group winsorization audit → (group, n, p_lo_m, p_hi_m,
    n_clipped_lo, n_clipped_hi, clipped_frac_u): the exact per-group
    clip bounds (lower-quantile order statistics at ``lo_u``/``hi_u``
    micros — p1/p99 by default) and how much mass a winsorizing
    cleaner would touch. Same quantized-count-frame discipline as
    :func:`robust_outliers` (median/MAD is the robust-center view;
    this is the tail-clipping view a feature pipeline applies).

    The clip itself is one more map-only expression against the
    broadcast bounds — returned as an audit rather than a mutated
    corpus so the oracle row is group-sized."""
    vals = df.select(
        F.col(group_col).alias("_g"),
        F.floor(F.col(value_col) * quant + F.lit(0.5)).cast("long").alias("_v"),
    )
    counts = vals.groupBy("_g", "_v").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    lo = _group_quantile(counts, "_g", "_v", "_c", lo_u, "p_lo_m")
    hi = _group_quantile(counts, "_g", "_v", "_c", hi_u, "p_hi_m")
    return (
        counts.join(lo, on="_g")
        .join(hi, on="_g")
        .groupBy("_g", "p_lo_m", "p_hi_m")
        .agg(
            F.sum("_c").cast("long").alias("n"),
            F.sum(F.when(F.col("_v") < F.col("p_lo_m"), F.col("_c")).otherwise(0))
            .cast("long")
            .alias("n_clipped_lo"),
            F.sum(F.when(F.col("_v") > F.col("p_hi_m"), F.col("_c")).otherwise(0))
            .cast("long")
            .alias("n_clipped_hi"),
        )
        .select(
            F.col("_g").alias(group_col),
            "n",
            "p_lo_m",
            "p_hi_m",
            "n_clipped_lo",
            "n_clipped_hi",
            F.expr(
                f"cast((n_clipped_lo + n_clipped_hi) * {MICRO} div n as bigint)"
            ).alias("clipped_frac_u"),
        )
    )


def impute_group_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quant: int = 1000,
) -> DataFrame:
    """Group-median imputation audit → (group, n, n_missing,
    fill_value_m, missing_frac_u): the fill value a feature pipeline
    substitutes for NULLs is the exact per-group lower median of the
    OBSERVED values (quantized count frame — the robust_outliers
    discipline), reported with the missingness mass. Null fill when
    a group has no observed values (nothing to learn from — the
    honest answer).

    Returned as the group-sized audit; the imputed corpus itself is
    one more broadcast-join + coalesce against these rows (map-only),
    left to the caller so the oracle row stays small."""
    vals = df.select(
        F.col(group_col).alias("_g"),
        F.floor(F.col(value_col) * quant + F.lit(0.5)).cast("long").alias("_v"),
    )
    counts = vals.filter(F.col("_v").isNotNull()).groupBy("_g", "_v").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    med = _group_median(counts, "_g", "_v", "_c", "fill_value_m")
    stats = vals.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing"),
    )
    return stats.join(med, on="_g", how="left").select(
        F.col("_g").alias(group_col),
        "n",
        "n_missing",
        "fill_value_m",
        F.expr("cast(n_missing * 1000000 div n as bigint)").alias(
            "missing_frac_u"
        ),
    )
