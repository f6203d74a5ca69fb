"""Time-weighted average and counter aggregates: hand-computed
expectations on crafted series, plus bucket-boundary clamping."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.timeseries import (
    counter_agg,
    time_weighted_avg,
)


def _series(spark, rows):
    return spark.createDataFrame(
        [(dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), float(v), i)
         for i, (s, v) in enumerate(rows)],
        "ts timestamp_ntz, value double, event_id long",
    ).withColumn("g", F.lit("a"))


def test_twa_weights_by_holding_time(spark):
    # value 100 held for 3/4 of the bucket, 0 for the last 1/4:
    # plain avg = 50, TWA = 75
    df = _series(spark, [(0, 100.0), (3 * 3600, 0.0)])
    row = time_weighted_avg(df, "ts", "value", ("g",), "4 hours", "event_id").first()
    assert row["twa"] == pytest.approx(75.0)
    assert row["n_samples"] == 2


def test_twa_clamps_at_bucket_end_not_next_sample(spark):
    # second sample is in the NEXT bucket: the first holds only to its
    # own bucket end, and each bucket averages its own samples
    df = _series(spark, [(0, 10.0), (7200, 50.0)])
    rows = {
        r["bucket"]: r
        for r in time_weighted_avg(
            df, "ts", "value", ("g",), "1 hour", "event_id"
        ).collect()
    }
    assert len(rows) == 2
    assert rows[dt.datetime(2024, 1, 1, 0)]["twa"] == pytest.approx(10.0)
    assert rows[dt.datetime(2024, 1, 1, 2)]["twa"] == pytest.approx(50.0)


def test_twa_single_sample_holds_to_bucket_end(spark):
    df = _series(spark, [(1800, 42.0)])  # half-way into a 1-hour bucket
    row = time_weighted_avg(df, "ts", "value", ("g",), "1 hour", "event_id").first()
    assert row["twa"] == pytest.approx(42.0)


def test_counter_deltas_and_resets(spark):
    # 10 → 25 (+15) → 5 (RESET, +5) → 30 (+25): total 45, one reset
    df = _series(spark, [(0, 10.0), (60, 25.0), (120, 5.0), (180, 30.0)])
    row = counter_agg(df, "ts", "value", ("g",), "1 day", "event_id").first()
    assert row["counter_delta"] == pytest.approx(45.0)
    assert row["n_resets"] == 1
    assert row["n_samples"] == 4


def test_counter_first_sample_contributes_nothing(spark):
    df = _series(spark, [(0, 1000.0)])
    row = counter_agg(df, "ts", "value", ("g",), "1 day", "event_id").first()
    assert row["counter_delta"] == 0.0 and row["n_resets"] == 0


def test_counter_delta_lands_in_later_bucket(spark):
    # rise happens across the bucket boundary → attributed to bucket 2
    df = _series(spark, [(0, 10.0), (3600, 70.0)])
    rows = {
        r["bucket"]: r["counter_delta"]
        for r in counter_agg(df, "ts", "value", ("g",), "1 hour", "event_id").collect()
    }
    assert rows[dt.datetime(2024, 1, 1, 0)] == 0.0
    assert rows[dt.datetime(2024, 1, 1, 1)] == pytest.approx(60.0)


# ---------------------------------------------------------------- acf / cusum


def _series_df(spark, vals, start="2024-01-01 00:00:00"):
    """One event per hour with the given values."""
    rows = [
        (f"2024-01-01 {h:02d}:00:07", float(v)) for h, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "ts string, value double").selectExpr(
        "cast(ts as timestamp) as ts", "value"
    )


def test_acf_alternating_series(spark):
    from data_pipeline_childcare_spark.operators.timeseries import acf

    # y = [0, 2, 0, 2, ...]: mean 1, d = ±1000 milli
    df = _series_df(spark, [0, 2] * 6)  # 12 buckets
    rows = {r["lag"]: r for r in acf(df, max_lag=3).collect()}
    # lag 1: all products -1e6, 11 pairs; den = 12e6 -> -11/12
    assert rows[1]["n_pairs"] == 11
    assert rows[1]["acf_u"] == -(11 * 1_000_000 * 1_000_000 // (12 * 1_000_000))
    # lag 2: 10 pairs, all +1 -> 10/12
    assert rows[2]["acf_u"] == 10 * 1_000_000 // 12
    assert rows[3]["n_pairs"] == 9


def test_acf_constant_series_null(spark):
    from data_pipeline_childcare_spark.operators.timeseries import acf

    df = _series_df(spark, [5.0] * 8)
    rows = acf(df, max_lag=2).collect()
    assert all(r["acf_u"] is None for r in rows)


def test_acf_multiple_events_per_bucket_average(spark):
    from data_pipeline_childcare_spark.operators.timeseries import acf

    # two events in bucket 0 average to 1.0 -> same series as [1, 3]
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:10:00", 0.0),
            ("2024-01-01 00:50:00", 2.0),
            ("2024-01-01 01:30:00", 3.0),
        ],
        "ts string, value double",
    ).selectExpr("cast(ts as timestamp) as ts", "value")
    r = acf(df, max_lag=1).collect()[0]
    assert r["n_pairs"] == 1
    # series [1000, 3000], mean 2000, d = [-1000, 1000]; the biased
    # estimator divides by the FULL energy 2e6 -> -0.5 (statsmodels)
    assert r["acf_u"] == -500_000


def test_cusum_step_series(spark):
    from data_pipeline_childcare_spark.operators.timeseries import (
        cusum_changepoint,
    )

    # level shift after hour 5: 6 hours at 1.0 then 6 at 9.0
    df = _series_df(spark, [1.0] * 6 + [9.0] * 6)
    r = cusum_changepoint(df).collect()[0]
    assert r["n_buckets"] == 12
    assert r["change_bucket"].hour == 5  # peak |CUSUM| at the last low bucket
    assert r["mean_before_m"] == 1000
    assert r["mean_after_m"] == 9000
    assert r["shift_m"] == 8000
    # mean = 5000 -> each low bucket contributes -4000
    assert r["cusum_max_abs_m"] == 6 * 4000


def test_cusum_tie_earliest_bucket(spark):
    from data_pipeline_childcare_spark.operators.timeseries import (
        cusum_changepoint,
    )

    # symmetric V: |CUSUM| peaks equal at both slopes -> earliest wins
    df = _series_df(spark, [0.0, 4.0, 4.0, 0.0])
    r = cusum_changepoint(df).collect()[0]
    # mean 2000; c = [-2000, 0, 2000, 0] -> |c| ties at t=1 and t=3
    assert r["change_bucket"].hour == 0
    assert r["cusum_max_abs_m"] == 2000


def test_seasonal_decompose_pure_seasonal(spark):
    from data_pipeline_childcare_spark.operators.timeseries import (
        seasonal_decompose,
    )

    # pure period-4 seasonal pattern, 5 cycles, no trend: amplitude
    # recovers exactly; trend flat at the mean; residual 0
    pattern = [10.0, 20.0, 30.0, 40.0]
    df = _series_df(spark, pattern * 5)  # 20 hourly buckets
    rows = {
        r["t"]: r
        for r in seasonal_decompose(df, width="1 hour", period=4).collect()
    }
    assert len(rows) == 20
    full = [r for r in rows.values() if r["trend_m"] is not None]
    # centered MA of a pure periodic series is the constant mean 25000
    assert all(r["trend_m"] == 25_000 for r in full)
    # seasonal offsets: -15000, -5000, 5000, 15000 by phase
    seas = {(r["t"] - 1) % 4: r["seasonal_m"] for r in full}
    assert seas == {0: -15_000, 1: -5_000, 2: 5_000, 3: 15_000}
    assert all(r["residual_m"] == 0 for r in full)
    # incomplete windows at both ends are null (period/2 each side)
    assert rows[1]["trend_m"] is None and rows[20]["trend_m"] is None


def test_seasonal_decompose_odd_period_raises(spark):
    import pytest

    from data_pipeline_childcare_spark.operators.timeseries import (
        seasonal_decompose,
    )

    df = _series_df(spark, [1.0] * 8)
    with pytest.raises(ValueError):
        seasonal_decompose(df, period=3)
