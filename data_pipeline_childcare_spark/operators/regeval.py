"""Regression / forecast evaluation — the third leg of the
measurement family (`raneval` scores rankings, `claseval` scores
binary classifiers, this scores numeric predictions): MAE, signed
bias, wMAPE, MSE and R² over a (truth, prediction) frame.

Scale design: ONE corpus aggregate — every metric derives from the
five sums (n, Σerr, Σ|err|, Σerr², Σy, Σy², Σ|y|), so the plan is a
single map-side-combinable reduce regardless of corpus size. No
windows, no joins, no UDFs.

Determinism (the fixed-point discipline): truth/prediction quantize
to integer micros (floor(x·1e6 + 0.5)) up front; sums accumulate in
DECIMAL(38,0) (HUGEINT in the DuckDB twins) so squared-error sums
never overflow; every ratio is an integer-micro floor division.
Signed quantities (bias, R² when negative) divide as
``sign · (|num|·scale div den)`` — EXPLICIT sign handling, because
Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors
toward −∞, and the two disagree on negative operands.

wMAPE = Σ|err| / Σ|truth| (the weighted MAPE a forecasting team
actually tracks — per-row MAPE is undefined at truth 0 and
over-weights small actuals). R² = 1 − n·SSE / (n·Σy² − (Σy)²),
exact in integers; negative when the predictor underperforms the
mean, null when truth is constant (zero variance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
_BIG = "decimal(38,0)"


def _signed_div_u(num: str, den: str) -> str:
    """SQL snippet: sign(num) * (|num| * MICRO div den), BIGINT-exact
    and identical across engines (truncation-vs-floor safe)."""
    return (
        f"CASE WHEN {num} >= 0 THEN cast(({num}) * {MICRO} div ({den}) as bigint) "
        f"ELSE -cast((-({num})) * {MICRO} div ({den}) as bigint) END"
    )


def regression_eval(
    truth_pred: DataFrame,
    truth_col: str = "truth",
    pred_col: str = "pred",
) -> DataFrame:
    """One-row evaluation of a numeric predictor →
    (n, mae_u, bias_u, wmape_u, mse_u, r2_u), all integer micros.

    mse_u is the mean of squared micro-errors re-scaled to micros
    (floor(Σerr_u² / (n·1e6))) — the Brier convention; r2_u is
    1e6·R², negative when worse than predicting the mean, null for
    constant truth; wmape_u is null when Σ|truth| = 0.
    """
    y = F.floor(F.col(truth_col) * MICRO + F.lit(0.5)).cast("long")
    p = F.floor(F.col(pred_col) * MICRO + F.lit(0.5)).cast("long")
    err = (p - y).cast(_BIG)
    agg = truth_pred.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(err).cast(_BIG).alias("s_err"),
        F.sum(F.abs(err)).cast(_BIG).alias("s_abs"),
        F.sum(err * err).cast(_BIG).alias("s_sq"),
        F.sum(y.cast(_BIG)).cast(_BIG).alias("s_y"),
        F.sum(y.cast(_BIG) * y.cast(_BIG)).cast(_BIG).alias("s_y2"),
        F.sum(F.abs(y.cast(_BIG))).cast(_BIG).alias("s_ay"),
    )
    sst = f"(cast(n as {_BIG}) * s_y2 - s_y * s_y)"  # n²·Var(y), ≥ 0
    return agg.select(
        "n",
        F.expr(f"cast(s_abs div cast(n as {_BIG}) as bigint)").alias("mae_u"),
        F.expr(
            f"CASE WHEN s_err >= 0 THEN cast(s_err div cast(n as {_BIG}) as bigint) "
            f"ELSE -cast((-s_err) div cast(n as {_BIG}) as bigint) END"
        ).alias("bias_u"),
        F.expr(
            f"CASE WHEN s_ay > 0 THEN cast(s_abs * {MICRO} div s_ay as bigint) END"
        ).alias("wmape_u"),
        F.expr(f"cast(s_sq div (cast(n as {_BIG}) * {MICRO}) as bigint)")
        .alias("mse_u"),
        F.expr(
            f"CASE WHEN {sst} > 0 THEN "
            f"{_signed_div_u(f'({sst} - cast(n as {_BIG}) * s_sq)', sst)} END"
        ).alias("r2_u"),
    )


def group_trend(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group OLS time trend → (group, n, slope_u_per_day, r2_u):
    the least-squares slope of value against time in integer micros
    per day, plus R² — both RATIONAL, so computed exactly:
    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` and
    ``r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))``.

    x is epoch-days CENTERED on the corpus minimum date (shifting x
    changes neither slope nor r², and keeps the squared cross terms
    inside DECIMAL(38,0) — uncentered epoch days overflow at
    (n·Σxy)²). One corpus aggregate per group; sign-safe floor
    divisions; slope null for constant time, r² null when either
    variance is zero."""
    mind = df.agg(F.min(F.to_date(F.col(ts_col))).alias("_d0"))
    big = "decimal(38,0)"
    base = df.crossJoin(F.broadcast(mind)).select(
        F.col(group_col).alias("_g"),
        F.datediff(F.to_date(F.col(ts_col)), F.col("_d0"))
        .cast("long")
        .alias("_x"),
        F.floor(F.col(value_col) * MICRO + F.lit(0.5)).cast("long").alias("_y"),
    )
    agg = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("_x").cast(big)).alias("_sx"),
        F.sum(F.col("_y").cast(big)).alias("_sy"),
        F.sum(F.col("_x").cast(big) * F.col("_x").cast(big)).alias("_sxx"),
        F.sum(F.col("_y").cast(big) * F.col("_y").cast(big)).alias("_syy"),
        F.sum(F.col("_x").cast(big) * F.col("_y").cast(big)).alias("_sxy"),
    )
    num = "(cast(n as decimal(38,0)) * _sxy - _sx * _sy)"
    denx = "(cast(n as decimal(38,0)) * _sxx - _sx * _sx)"
    deny = "(cast(n as decimal(38,0)) * _syy - _sy * _sy)"
    return agg.select(
        F.col("_g").alias(group_col),
        "n",
        F.expr(
            f"CASE WHEN {denx} > 0 THEN "
            f"CASE WHEN {num} >= 0 THEN cast({num} div {denx} as bigint) "
            f"ELSE -cast((-{num}) div {denx} as bigint) END END"
        ).alias("slope_u_per_day"),
        F.expr(
            f"CASE WHEN {denx} > 0 AND {deny} > 0 THEN "
            f"cast({num} * {num} * 1000000 div ({denx} * {deny}) as bigint) END"
        ).alias("r2_u"),
    )


def pairwise_signed_r2(
    df: DataFrame,
    cols: dict[str, int],
) -> DataFrame:
    """Pairwise correlation matrix as SIGNED R² →
    (col_a, col_b, n, signed_r2_u): sign(cov)·r² in integer micros —
    r itself needs a square root, but r² is rational, so the matrix
    is exact integer math. ``cols`` maps each column to its
    quantization factor.

    Overflow discipline (the 10× scale bench caught the naive
    ``(nΣxy−ΣxΣy)²`` form overflowing DECIMAL(38,0)): values CENTER
    on their integer floor-means first (pass 1 — one tiny aggregate,
    broadcast back), so the moment sums are deviation-sized; the
    mean-rounding cross terms are corrected exactly
    (``Σdxdy − (Σdx·Σdy div n)``); and the final ratio divides in
    two steps (``((num² div da)·1e6) div db`` — Cauchy-Schwarz keeps
    the intermediate ≤ db). Safe through ~1e9 rows at documented
    quants. Two corpus passes total; pair rows are a literal explode
    of the one-row wide aggregate. Null when either variance is
    zero."""
    names = list(cols)
    q = {c: F.floor(F.col(c) * cols[c] + F.lit(0.5)).cast("long") for c in names}
    big = "decimal(38,0)"
    means = df.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        *[F.sum(q[c].cast(big)).alias(f"_s_{c}") for c in names],
    ).select(
        "_n",
        *[
            F.expr(
                f"CASE WHEN _s_{c} >= 0 THEN cast(_s_{c} div cast(_n as decimal(38,0)) as bigint) "
                f"ELSE -cast((-_s_{c}) div cast(_n as decimal(38,0)) as bigint) END"
            ).alias(f"_m_{c}")
            for c in names
        ],
    )
    dev = df.crossJoin(F.broadcast(means))
    d = {c: (q[c] - F.col(f"_m_{c}")).cast(big) for c in names}
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in names:
        aggs.append(F.sum(d[c]).alias(f"s_{c}"))
        aggs.append(F.sum(d[c] * d[c]).alias(f"ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum(d[a] * d[b]).alias(f"sp_{a}_{b}"))
    one = dev.agg(*aggs)

    def corr(num_s: str, den_s: str) -> str:
        """sign-safe num − (x·y div n) correction"""
        return (
            f"({num_s} - (CASE WHEN {den_s} >= 0 "
            f"THEN {den_s} div cast(n as decimal(38,0)) "
            f"ELSE -((-({den_s})) div cast(n as decimal(38,0))) END))"
        )

    def expr_for(a: str, b: str) -> str:
        num = corr(f"sp_{a}_{b}", f"(s_{a} * s_{b})")
        da = corr(f"ss_{a}", f"(s_{a} * s_{a})")
        db = corr(f"ss_{b}", f"(s_{b} * s_{b})")
        mag = (
            f"cast((((({num}) * ({num})) div ({da})) * 1000000) div ({db}) as bigint)"
        )
        return (
            f"CASE WHEN {da} > 0 AND {db} > 0 THEN "
            f"CASE WHEN {num} >= 0 THEN {mag} ELSE -{mag} END END"
        )

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.expr(expr_for(a, b)).alias("signed_r2_u"),
            )
            for a, b in pairs
        ]
    )
    return one.select("n", F.explode(rows).alias("_p")).select(
        F.col("_p.col_a").alias("col_a"),
        F.col("_p.col_b").alias("col_b"),
        "n",
        F.col("_p.signed_r2_u").alias("signed_r2_u"),
    )
