"""Time-series hyperfunctions (TimescaleDB semantics on Spark).

Two aggregates that plain ``avg``/``sum`` get WRONG on irregularly
sampled series, implemented as pure column arithmetic over one window
pass + one keyed aggregation (no UDFs, stays in codegen):

- ``time_weighted_avg``: each sample's value holds (LOCF) until the
  next sample or the end of its bucket, and the average weights by
  that holding duration — so a sensor that reports 100 for 23 hours
  and 0 for 1 hour averages ≈95.8, not 50. Weighting restarts at each
  bucket boundary (no carry-in from the previous bucket); this is the
  bucket-local variant of TimescaleDB's ``time_weight('LOCF', ...)``.
- ``counter_agg``: Prometheus/TimescaleDB counter semantics — deltas
  between consecutive samples of a monotonically increasing counter,
  where a DROP means the counter reset and the post-reset value is
  the increase. Buckets sum deltas (attributed to the later sample's
  bucket) and count resets.

Scale shape: one window shuffle keyed by the series key (uniform —
one partition per series group, skew only if one series dominates,
in which case ``operators/skew.salt_window`` applies), then a keyed
aggregation that combines map-side. Both engines compute identical
per-row arithmetic, and sums are pre-rounded before the final
division, so the DuckDB oracle checks these exactly.

Reference parity: beyond-reference (the task brief's hypertable
family); complements ``operators/hypertable.py``'s rollup ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hypertable import _UNIT_SECONDS, _parse_width, time_bucket


def _bucket_width_seconds(width: str) -> int:
    n, unit = _parse_width(width)
    if unit not in _UNIT_SECONDS:
        raise ValueError(
            f"time-weighted/counter buckets need a fixed width; got {width!r}"
        )
    return n * _UNIT_SECONDS[unit]


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: tuple[str, ...],
    width: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-(group, bucket) LOCF time-weighted average →
    (group..., bucket, n_samples, twa).

    ``tiebreak_col`` makes the lead() ordering total, so the holding
    durations — and therefore the result — are deterministic even
    with duplicate timestamps.
    """
    sec = _bucket_width_seconds(width)
    w = Window.partitionBy(*group_cols).orderBy(ts_col, tiebreak_col)
    bucket = time_bucket(width, F.col(ts_col))
    bucket_end = F.timestamp_add("SECOND", F.lit(sec), bucket)
    hold_until = F.least(
        F.coalesce(F.lead(ts_col).over(w), bucket_end), bucket_end
    )
    dur_s = (
        F.timestamp_diff("MICROSECOND", F.col(ts_col), hold_until).cast("double")
        / 1000000.0
    )
    weighted = df.select(
        *group_cols,
        bucket.alias("bucket"),
        dur_s.alias("_dur"),
        (dur_s * F.col(value_col)).alias("_wv"),
    )
    # pre-round both sums: canonical doubles regardless of partition
    # summation order, so the quotient is engine-independent
    return (
        weighted.groupBy(*group_cols, "bucket")
        .agg(
            F.count("*").alias("n_samples"),
            F.round(F.sum("_wv"), 4).alias("_num"),
            F.round(F.sum("_dur"), 6).alias("_den"),
        )
        .select(
            *group_cols,
            "bucket",
            "n_samples",
            F.round(F.col("_num") / F.col("_den"), 6).alias("twa"),
        )
    )


def time_weighted_avg_sql(
    table: str,
    ts_col: str,
    value_col: str,
    group_cols: tuple[str, ...],
    width: str,
    tiebreak_col: str,
) -> str:
    """DuckDB oracle for :func:`time_weighted_avg` — identical
    window, clamping, and pre-rounded-sum division. The final round
    goes through the shortest-decimal repr so it matches Spark's
    BigDecimal rounding on .5 boundaries."""
    sec = _bucket_width_seconds(width)
    groups = ", ".join(group_cols)
    return f"""
        WITH held AS (
            SELECT {groups},
                   time_bucket(INTERVAL {sec} SECOND, {ts_col}) AS bucket,
                   CAST(date_diff('microsecond', {ts_col},
                        least(coalesce(lead({ts_col}) OVER (PARTITION BY {groups} ORDER BY {ts_col}, {tiebreak_col}),
                                       time_bucket(INTERVAL {sec} SECOND, {ts_col}) + INTERVAL {sec} SECOND),
                              time_bucket(INTERVAL {sec} SECOND, {ts_col}) + INTERVAL {sec} SECOND)
                   ) AS DOUBLE) / 1000000.0 AS dur,
                   {value_col} AS v
            FROM {table}
        ), agg AS (
            SELECT {groups}, bucket, count(*) AS n_samples,
                   round(sum(dur * v), 4) AS num,
                   round(sum(dur), 6) AS den
            FROM held GROUP BY {groups}, bucket
        )
        SELECT {groups}, bucket, n_samples,
               CAST(round(CAST(CAST((num / den) AS VARCHAR) AS DECIMAL(30,15)), 6) AS DOUBLE) AS twa
        FROM agg
    """


def counter_agg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: tuple[str, ...],
    width: str,
    tiebreak_col: str,
) -> DataFrame:
    """Reset-aware counter rollup per (group, bucket) →
    (group..., bucket, n_samples, counter_delta, n_resets).

    delta = v - lag(v) when the counter grew, v itself after a reset
    (the counter restarted from 0 and climbed back to v); a group's
    first sample contributes nothing. Deltas land in the LATER
    sample's bucket — Prometheus ``increase`` attribution.
    """
    w = Window.partitionBy(*group_cols).orderBy(ts_col, tiebreak_col)
    prev = F.lag(value_col).over(w)
    v = F.col(value_col)
    delta = F.when(prev.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(v >= prev, v - prev).otherwise(v)
    )
    reset = F.when(prev.isNotNull() & (v < prev), F.lit(1)).otherwise(F.lit(0))
    stepped = df.select(
        *group_cols,
        time_bucket(width, F.col(ts_col)).alias("bucket"),
        delta.alias("_delta"),
        reset.alias("_reset"),
    )
    return (
        stepped.groupBy(*group_cols, "bucket")
        .agg(
            F.count("*").alias("n_samples"),
            F.round(F.coalesce(F.sum("_delta"), F.lit(0.0)), 4).alias("counter_delta"),
            F.sum("_reset").alias("n_resets"),
        )
    )


def counter_agg_sql(
    table: str,
    ts_col: str,
    value_col: str,
    group_cols: tuple[str, ...],
    width: str,
    tiebreak_col: str,
) -> str:
    """DuckDB oracle for :func:`counter_agg`."""
    sec = _bucket_width_seconds(width)
    groups = ", ".join(group_cols)
    return f"""
        WITH stepped AS (
            SELECT {groups},
                   time_bucket(INTERVAL {sec} SECOND, {ts_col}) AS bucket,
                   CASE WHEN lag({value_col}) OVER w IS NULL THEN NULL
                        WHEN {value_col} >= lag({value_col}) OVER w
                             THEN {value_col} - lag({value_col}) OVER w
                        ELSE {value_col} END AS delta,
                   CASE WHEN lag({value_col}) OVER w IS NOT NULL
                             AND {value_col} < lag({value_col}) OVER w
                        THEN 1 ELSE 0 END AS reset
            FROM {table}
            WINDOW w AS (PARTITION BY {groups} ORDER BY {ts_col}, {tiebreak_col})
        )
        SELECT {groups}, bucket, count(*) AS n_samples,
               round(coalesce(sum(delta), 0.0), 4) AS counter_delta,
               CAST(sum(reset) AS BIGINT) AS n_resets
        FROM stepped GROUP BY {groups}, bucket
    """


def _sgn_div(num: str, den: str, scale: int = 1) -> str:
    """SQL snippet: ``sign(num) · (|num|·scale div den)`` in
    DECIMAL(38,0), cast to BIGINT — the explicit-sign integer
    division (Spark ``div`` truncates toward zero, DuckDB ``//``
    floors; they agree only through this form)."""
    mul = f" * {scale}" if scale != 1 else ""
    return (
        f"CASE WHEN {num} >= 0 THEN cast(({num}){mul} div ({den}) as bigint) "
        f"ELSE -cast((-({num})){mul} div ({den}) as bigint) END"
    )


def _milli_series(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    width: str,
) -> DataFrame:
    """The shared fixed-point series both diagnostics run on:
    bucket the rows with ``time_bucket``, average the value per
    bucket in integer millis (sign-safe floor division), and
    re-index observed buckets contiguously (t = 1..N by bucket
    order) so lag arithmetic is gap-free.

    Scale shape: the per-bucket aggregate is map-side combinable over
    any corpus size; everything after runs on the SERIES frame, whose
    length is time-range/width — bounded by the calendar, not the
    corpus (720 rows for a month of hours), the hypertable-rollup
    scale argument. The single-partition row_number window is over
    that provably small frame (documented, same class as the score_u
    windows)."""
    v_m = F.floor(F.col(value_col) * 1000 + F.lit(0.5)).cast("long")
    per = (
        df.select(time_bucket(width, F.col(ts_col)).alias("bucket"), v_m.alias("_v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(F.col("_v").cast("decimal(38,0)")).alias("_s"),
        )
        .select(
            "bucket",
            F.expr(_sgn_div("_s", "cast(_n as decimal(38,0))")).alias("y_m"),
        )
    )
    w = Window.partitionBy(F.lit(0)).orderBy("bucket")
    return per.select("bucket", "y_m", F.row_number().over(w).alias("t"))


def acf(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    width: str = "1 hour",
    max_lag: int = 12,
) -> DataFrame:
    """Sample autocorrelation of the bucketed series at lags
    1..max_lag → (lag, n_pairs, acf_u), integer micros.

    The series is the per-bucket milli average; the mean is the
    floor milli mean; ``acf(ℓ) = Σ_t d_t·d_{t−ℓ} / Σ_t d_t²`` with
    deviations, products and sums all in DECIMAL(38,0) (HUGEINT in
    the twin) — overflow-free and bit-exact across engines, the
    fixed-point discipline. Denominator is the full-series energy
    (the standard biased ACF estimator, lag-independent — what
    statsmodels ``acf`` computes).

    Lag pairing is a broadcast self-equi-join of the series frame on
    ``t = t′ + ℓ`` after an explode of the lag list — series-sized
    both sides, so the join is trivially broadcastable at any corpus
    scale. Null acf_u when the series is constant (zero energy)."""
    ser = _milli_series(df, ts_col, value_col, width)
    stats = ser.agg(
        F.sum(F.col("y_m").cast("decimal(38,0)")).alias("_s"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    ).select(
        F.expr(_sgn_div("_s", "cast(_n as decimal(38,0))")).alias("_ybar"), "_n"
    )
    dser = ser.crossJoin(F.broadcast(stats)).select(
        "t", (F.col("y_m") - F.col("_ybar")).cast("decimal(38,0)").alias("d")
    )
    den = dser.agg(F.sum(F.col("d") * F.col("d")).alias("_den"))
    lags = dser.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    pairs = (
        lags.crossJoin(dser.withColumnRenamed("d", "_d1"))
        .join(
            F.broadcast(
                dser.select(F.col("t").alias("_t2"), F.col("d").alias("_d2"))
            ),
            on=F.col("t") == F.col("_t2") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("_d1") * F.col("_d2")).alias("_num"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.expr(
                f"CASE WHEN _den > 0 THEN {_sgn_div('_num', '_den', 1_000_000)} END"
            ).alias("acf_u"),
        )
        .orderBy("lag")
    )


def cusum_changepoint(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    width: str = "1 hour",
) -> DataFrame:
    """CUSUM change-point scan (Page 1954 / the offline CUSUM test):
    cumulative sums of deviations from the series mean peak exactly
    where the level shifts. One row out:
    (n_buckets, change_bucket, cusum_max_abs_m, mean_before_m,
    mean_after_m, shift_m) — the argmax-|CUSUM| bucket (earliest on
    ties), the peak magnitude, and the milli means either side of it.

    All arithmetic is integer milli / DECIMAL(38,0): deviations from
    the floor milli mean, a bucket-ordered cumulative sum over the
    series-sized frame (single-partition window, bounded by the
    calendar — documented), sign-safe floor divisions for the two
    side means. Bit-exact across engines by construction."""
    ser = _milli_series(df, ts_col, value_col, width)
    stats = ser.agg(
        F.sum(F.col("y_m").cast("decimal(38,0)")).alias("_s"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    ).select(
        F.expr(_sgn_div("_s", "cast(_n as decimal(38,0))")).alias("_ybar"), "_n"
    )
    w = Window.partitionBy(F.lit(0)).orderBy("t")
    cum = (
        ser.crossJoin(F.broadcast(stats))
        .select(
            "bucket",
            "t",
            "y_m",
            "_n",
            F.sum((F.col("y_m") - F.col("_ybar")).cast("decimal(38,0)"))
            .over(w)
            .alias("c"),
        )
    )
    peak = cum.orderBy(F.abs(F.col("c")).desc(), F.col("t")).limit(1).select(
        F.col("bucket").alias("change_bucket"),
        F.col("t").alias("_tstar"),
        F.col("c").cast("long").alias("cusum_max_abs_m_signed"),
        F.col("_n").alias("n_buckets"),
    )
    sides = (
        cum.crossJoin(F.broadcast(peak))
        .withColumn("_side", F.when(F.col("t") <= F.col("_tstar"), 1).otherwise(2))
        .groupBy("n_buckets", "change_bucket", "cusum_max_abs_m_signed", "_side")
        .agg(
            F.sum(F.col("y_m").cast("decimal(38,0)")).alias("_ss"),
            F.count(F.lit(1)).cast("long").alias("_sn"),
        )
        .groupBy("n_buckets", "change_bucket", "cusum_max_abs_m_signed")
        .agg(
            F.max(
                F.when(
                    F.col("_side") == 1,
                    F.expr(_sgn_div("_ss", "cast(_sn as decimal(38,0))")),
                )
            ).alias("mean_before_m"),
            F.max(
                F.when(
                    F.col("_side") == 2,
                    F.expr(_sgn_div("_ss", "cast(_sn as decimal(38,0))")),
                )
            ).alias("mean_after_m"),
        )
    )
    return sides.select(
        "n_buckets",
        "change_bucket",
        F.abs(F.col("cusum_max_abs_m_signed")).alias("cusum_max_abs_m"),
        "mean_before_m",
        "mean_after_m",
        (F.col("mean_after_m") - F.col("mean_before_m")).alias("shift_m"),
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    width: str = "1 hour",
    period: int = 24,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method of statsmodels ``seasonal_decompose``) over the bucketed
    milli series → one row per bucket:
    (bucket, t, y_m, trend_m, seasonal_m, residual_m).

    - trend: centered moving average of length period+1 with the two
      half-weight endpoints folded as a ±period/2 window sum of
      2·period with the ends halved — implemented integer-exact as
      ``(sum(±half window) · 2 − y[t−half] − y[t+half]) div (2·period)``
      (the standard even-period centered MA); null where the window
      is incomplete.
    - seasonal: per phase (t mod period) floor-mean of detrended
      values, re-centered so the period sums to ~0 (floor-mean of
      the phase means subtracted).
    - residual: y − trend − seasonal where trend exists.

    All arithmetic integer milli / DECIMAL(38,0) with sign-safe floor
    divisions; everything after the per-bucket aggregate runs on the
    calendar-bounded series frame (the ACF/CUSUM discipline)."""
    if period % 2:
        raise ValueError("period must be even for the centered MA")
    half = period // 2
    ser = _milli_series(df, ts_col, value_col, width)
    w = Window.partitionBy(F.lit(0)).orderBy("t")
    win_sum = F.sum(F.col("y_m").cast("decimal(38,0)")).over(
        w.rowsBetween(-half, half)
    )
    win_cnt = F.count(F.lit(1)).over(w.rowsBetween(-half, half))
    y_lo = F.lag("y_m", half).over(w)
    y_hi = F.lead("y_m", half).over(w)
    trend_num = (
        win_sum * F.lit(2)
        - F.col("_ylo").cast("decimal(38,0)")
        - F.col("_yhi").cast("decimal(38,0)")
    )
    based = (
        ser.withColumn("_ws", win_sum)
        .withColumn("_wc", win_cnt)
        .withColumn("_ylo", y_lo)
        .withColumn("_yhi", y_hi)
        .withColumn(
            "trend_m",
            F.when(
                F.col("_wc") == period + 1,
                F.expr(
                    f"CASE WHEN (_ws * 2 - cast(_ylo as decimal(38,0)) - cast(_yhi as decimal(38,0))) >= 0 "
                    f"THEN cast((_ws * 2 - cast(_ylo as decimal(38,0)) - cast(_yhi as decimal(38,0))) div {2 * period} as bigint) "
                    f"ELSE -cast(-(_ws * 2 - cast(_ylo as decimal(38,0)) - cast(_yhi as decimal(38,0))) div {2 * period} as bigint) END"
                ),
            ),
        )
        .withColumn("_det", F.col("y_m") - F.col("trend_m"))
        .withColumn("_phase", F.expr(f"(t - 1) % {period}"))
    )
    phase = based.filter(F.col("_det").isNotNull()).groupBy("_phase").agg(
        F.sum(F.col("_det").cast("decimal(38,0)")).alias("_ps"),
        F.count(F.lit(1)).cast("long").alias("_pn"),
    ).select(
        "_phase",
        F.expr(
            "CASE WHEN _ps >= 0 THEN cast(_ps div cast(_pn as decimal(38,0)) as bigint) "
            "ELSE -cast((-_ps) div cast(_pn as decimal(38,0)) as bigint) END"
        ).alias("_s_raw"),
    )
    center = phase.agg(
        F.sum(F.col("_s_raw").cast("decimal(38,0)")).alias("_cs"),
        F.count(F.lit(1)).cast("long").alias("_cn"),
    ).select(
        F.expr(
            "CASE WHEN _cs >= 0 THEN cast(_cs div cast(_cn as decimal(38,0)) as bigint) "
            "ELSE -cast((-_cs) div cast(_cn as decimal(38,0)) as bigint) END"
        ).alias("_adj")
    )
    seas = phase.crossJoin(F.broadcast(center)).select(
        "_phase", (F.col("_s_raw") - F.col("_adj")).alias("seasonal_m")
    )
    return (
        based.join(F.broadcast(seas), on="_phase", how="left")
        .select(
            "bucket",
            "t",
            "y_m",
            "trend_m",
            "seasonal_m",
            F.when(
                F.col("trend_m").isNotNull(),
                F.col("y_m") - F.col("trend_m") - F.col("seasonal_m"),
            ).alias("residual_m"),
        )
    )
