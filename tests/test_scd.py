"""SCD2 history build: run compression, interval chaining, ties,
null-state handling."""

from __future__ import annotations

import datetime

from data_pipeline_childcare_spark.operators.scd import scd2_history


def _d(day):
    return datetime.datetime(2024, 1, day)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "k: long, status: string, ts: timestamp, seq: long"
    )
    out = scd2_history(df, "k", ["status"], "ts", "seq")
    return [
        (r.k, r.status, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in out.orderBy("k", "version").collect()
    ]


def test_runs_compress_and_intervals_chain(spark):
    rows = [
        (1, "O", _d(1), 1),
        (1, "O", _d(2), 2),  # same run — compressed away
        (1, "F", _d(3), 3),
        (1, "O", _d(5), 4),  # back to O — a NEW version, not merged
        (2, "P", _d(1), 5),
    ]
    assert _run(spark, rows) == [
        (1, "O", _d(1), _d(3), 1, False),
        (1, "F", _d(3), _d(5), 2, False),
        (1, "O", _d(5), None, 3, True),
        (2, "P", _d(1), None, 1, True),
    ]


def test_same_timestamp_ties_resolved_by_tiebreak(spark):
    rows = [
        (1, "A", _d(1), 2),
        (1, "B", _d(1), 1),  # lower seq → earlier observation
    ]
    assert _run(spark, rows) == [
        (1, "B", _d(1), _d(1), 1, False),
        (1, "A", _d(1), None, 2, True),
    ]


def test_null_status_is_a_real_state(spark):
    rows = [
        (1, None, _d(1), 1),
        (1, None, _d(2), 2),  # null == null under eqNullSafe — one run
        (1, "F", _d(3), 3),
    ]
    got = _run(spark, rows)
    assert got == [
        (1, None, _d(1), _d(3), 1, False),
        (1, "F", _d(3), None, 2, True),
    ]
