"""Hypertable operator family: time_bucket semantics, rollup-ladder
exactness, gapfill density + LOCF."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.hypertable import (
    bucket_partials,
    finalize_rollup,
    hypertable_rollup,
    time_bucket,
    time_bucket_gapfill,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (ts, event_type, value) — two types, deliberate 6h gaps
        (_ts("2024-01-01 00:10:00"), "click", 1.0),
        (_ts("2024-01-01 01:20:00"), "click", 3.0),
        (_ts("2024-01-01 13:00:00"), "click", 5.0),
        (_ts("2024-01-02 02:00:00"), "click", 7.0),
        (_ts("2024-01-01 05:59:59"), "view", 10.0),
        (_ts("2024-01-02 23:00:00"), "view", 20.0),
    ]
    return spark.createDataFrame(rows, "ts timestamp_ntz, event_type string, value double")


def _bucket_of(spark, width: str, ts: str):
    return (
        spark.range(1)
        .select(time_bucket(width, F.lit(ts).cast("timestamp_ntz")).alias("b"))
        .head()[0]
    )


def test_time_bucket_day_and_hour(spark):
    assert _bucket_of(spark, "1 day", "2024-01-15 13:45:10") == _ts("2024-01-15 00:00:00")
    assert _bucket_of(spark, "6 hours", "2024-01-15 13:45:10") == _ts("2024-01-15 12:00:00")
    assert _bucket_of(spark, "15 minutes", "2024-01-15 13:44:59") == _ts("2024-01-15 13:30:00")


def test_time_bucket_week_starts_monday(spark):
    # 2024-01-15 is a Monday; Sunday the 14th belongs to the prior week
    assert _bucket_of(spark, "1 week", "2024-01-15 00:00:00") == _ts("2024-01-15 00:00:00")
    assert _bucket_of(spark, "1 week", "2024-01-14 23:59:59") == _ts("2024-01-08 00:00:00")


def test_time_bucket_month_and_quarter(spark):
    assert _bucket_of(spark, "1 month", "2024-02-29 12:00:00") == _ts("2024-02-01 00:00:00")
    # 3-month buckets anchored at 2000-01 → Jan/Apr/Jul/Oct
    assert _bucket_of(spark, "3 months", "2024-05-15 00:00:00") == _ts("2024-04-01 00:00:00")
    assert _bucket_of(spark, "1 year", "2024-05-15 00:00:00") == _ts("2024-01-01 00:00:00")


def test_time_bucket_pre_origin_floors(spark):
    # 1999 < origin: floor (not truncate-toward-zero) keeps buckets aligned
    assert _bucket_of(spark, "1 day", "1999-12-31 23:00:00") == _ts("1999-12-31 00:00:00")
    assert _bucket_of(spark, "1 month", "1999-11-20 10:00:00") == _ts("1999-11-01 00:00:00")


def test_time_bucket_pre_origin_subsecond_floors(spark):
    # Pre-origin timestamps with sub-second fractions: a SECOND-level
    # diff truncates toward zero and lands one bucket too high.
    # DuckDB: time_bucket(INTERVAL '1 minute', '2000-01-02 23:58:59.5')
    # = 23:58:00.
    assert _bucket_of(spark, "1 minute", "2000-01-02 23:58:59.5") == _ts(
        "2000-01-02 23:58:00"
    )
    assert _bucket_of(spark, "1 second", "2000-01-02 23:59:59.999") == _ts(
        "2000-01-02 23:59:59"
    )
    # post-origin fractional stays correct too
    assert _bucket_of(spark, "1 minute", "2000-01-03 00:00:59.9") == _ts(
        "2000-01-03 00:00:00"
    )


def test_rollup_ladder_equals_direct(events):
    ladder = hypertable_rollup(events, ("1 hour", "1 day"))
    derived = finalize_rollup(ladder["1 day"])
    direct = finalize_rollup(bucket_partials(events, "1 day"))
    cols = derived.columns
    assert sorted(map(tuple, derived.select(cols).collect())) == sorted(
        map(tuple, direct.select(cols).collect())
    )


def test_rollup_counts(events):
    day = finalize_rollup(hypertable_rollup(events, ("1 hour", "1 day"))["1 day"])
    got = {(r["bucket"], r["event_type"]): r["n_events"] for r in day.collect()}
    assert got[(_ts("2024-01-01 00:00:00"), "click")] == 3
    assert got[(_ts("2024-01-02 00:00:00"), "view")] == 1


def test_gapfill_density_zero_and_locf(events):
    b = bucket_partials(events, "6 hours").select(
        "bucket", "event_type", "n_events",
        F.round(F.col("sum_value") / F.col("n_events"), 4).alias("avg_value"),
    )
    filled = time_bucket_gapfill(
        b, "6 hours", zero_cols=("n_events",), locf_cols=("avg_value",)
    )
    rows = {(r["bucket"], r["event_type"]): r for r in filled.collect()}
    # observed range 2024-01-01 00:00 → 2024-01-02 18:00 = 8 buckets × 2 types
    assert len(rows) == 16
    # empty click bucket 06:00: zero-filled count, avg carried from 00:00 bucket
    gap = rows[(_ts("2024-01-01 06:00:00"), "click")]
    assert gap["n_events"] == 0
    assert gap["avg_value"] == 2.0  # (1+3)/2 carried forward
    # leading gap for view stays NULL (no prior observation)
    lead = rows[(_ts("2024-01-01 12:00:00"), "view")]
    assert lead["n_events"] == 0
    # view observed at 00:00 bucket (05:59:59) → 12:00 carries 10.0
    assert lead["avg_value"] == 10.0


def test_gapfill_leading_null(spark):
    b = spark.createDataFrame(
        [(_ts("2024-01-01 06:00:00"), "x", 2, 5.0)],
        "bucket timestamp_ntz, event_type string, n_events long, avg_value double",
    ).union(
        spark.createDataFrame(
            [(_ts("2024-01-01 18:00:00"), "y", 1, 9.0)],
            "bucket timestamp_ntz, event_type string, n_events long, avg_value double",
        )
    )
    filled = time_bucket_gapfill(
        b, "6 hours", zero_cols=("n_events",), locf_cols=("avg_value",)
    )
    rows = {(r["bucket"], r["event_type"]): r for r in filled.collect()}
    assert len(rows) == 6  # 3 buckets × 2 types
    assert rows[(_ts("2024-01-01 06:00:00"), "y")]["avg_value"] is None
    assert rows[(_ts("2024-01-01 18:00:00"), "x")]["avg_value"] == 5.0


def test_streaming_bucket_partials_matches_batch_expr(events):
    from data_pipeline_childcare_spark.operators.hypertable import (
        streaming_bucket_partials,
    )

    # static-frame form: identical rows to bucket_partials for widths
    # where epoch and the 2000-01-03 origin disagree (weeks) and agree
    for width in ("6 hours", "1 week"):
        got = sorted(
            map(tuple, streaming_bucket_partials(events, width, streaming=False).collect())
        )
        want = sorted(map(tuple, bucket_partials(events, width).collect()))
        assert got == want, width


def test_streaming_bucket_partials_true_stream(spark, tmp_path, events):
    from data_pipeline_childcare_spark.operators.hypertable import (
        streaming_bucket_partials,
    )

    src = tmp_path / "events_stream"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    agg = streaming_bucket_partials(stream, "6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("cagg_6h")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("cagg_6h").collect()))
    want = sorted(map(tuple, bucket_partials(events, "6 hours").collect()))
    assert got == want


def test_streaming_gapfilled_rollup_matches_batch(spark, tmp_path, events):
    """foreachBatch gapfill head: the final micro-batch's gap-filled
    day level must equal the batch ladder's gap-filled day level."""
    from data_pipeline_childcare_spark.operators.hypertable import (
        rollup_partials,
        streaming_gapfilled_rollup,
        time_bucket_gapfill,
    )

    src = tmp_path / "events_stream_gf"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))

    got_batches = {}

    def sink(df, batch_id):
        got_batches[batch_id] = sorted(map(tuple, df.collect()))

    q = (
        streaming_gapfilled_rollup(stream, "6 hours", "1 day", sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got_batches, "no micro-batch delivered"
    got = got_batches[max(got_batches)]

    fine = bucket_partials(events, "6 hours")
    want = sorted(
        map(
            tuple,
            time_bucket_gapfill(
                rollup_partials(fine, "1 day"), "1 day"
            ).collect(),
        )
    )
    assert got == want


def test_merge_rollup_partials_equals_full(spark):
    """IVM merge over an arbitrary two-way split reproduces the
    single-pass partials exactly (count/sum add, min/min, max/max)."""
    from pyspark.sql import functions as F

    from data_pipeline_childcare_spark.operators.hypertable import (
        bucket_partials,
        merge_rollup_partials,
    )

    rows = [
        (i, f"2024-03-0{1 + i % 3} 0{i % 6}:1{i % 5}:00", "t" + str(i % 2), float(i % 7) - 2.0)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    full = bucket_partials(df, "1 hour")
    merged = merge_rollup_partials(
        bucket_partials(df.filter(F.col("event_id") % 3 != 0), "1 hour"),
        bucket_partials(df.filter(F.col("event_id") % 3 == 0), "1 hour"),
    )
    key = ["bucket", "event_type"]
    a = {tuple(r[k] for k in key): (r["n_events"], r["sum_value"], r["min_value"], r["max_value"])
         for r in full.collect()}
    b = {tuple(r[k] for k in key): (r["n_events"], r["sum_value"], r["min_value"], r["max_value"])
         for r in merged.collect()}
    assert set(a) == set(b)
    for k in a:
        na, sa, mina, maxa = a[k]
        nb, sb, minb, maxb = b[k]
        assert (na, mina, maxa) == (nb, minb, maxb), k
        assert abs(sa - sb) < 1e-9, k
