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
