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
