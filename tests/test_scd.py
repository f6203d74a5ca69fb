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


def test_scd2_point_in_time_tie_rules(spark):
    """A fact ON a version boundary sees the new version; a
    same-instant double flip resolves to the LAST version; facts
    before the first version get nulls."""
    from data_pipeline_childcare_spark.operators.scd import (
        scd2_history,
        scd2_point_in_time,
    )

    obs = spark.createDataFrame(
        [
            (1, "A", "2024-01-02 00:00:00", 1),
            # same-instant flip at 01-05: two changes, versions 2 then 3
            (1, "B", "2024-01-05 00:00:00", 2),
            (1, "C", "2024-01-05 00:00:00", 3),
        ],
        "k long, status string, ts string, tb long",
    ).selectExpr("k", "status", "cast(ts as timestamp) as ts", "tb")
    hist = scd2_history(obs, "k", ["status"], "ts", "tb")
    facts = spark.createDataFrame(
        [
            (10, 1, "2024-01-01 00:00:00"),  # before first version
            (11, 1, "2024-01-02 00:00:00"),  # exactly at v1 start
            (12, 1, "2024-01-05 00:00:00"),  # at the double flip
            (13, 1, "2024-01-09 00:00:00"),
        ],
        "fid long, k long, fts string",
    ).selectExpr("fid", "k", "cast(fts as timestamp) as fts")
    rows = {
        r["fid"]: r
        for r in scd2_point_in_time(facts, hist, "k", "fts", ["status"]).collect()
    }
    assert rows[10]["status_asof"] is None and rows[10]["version_asof"] is None
    assert rows[11]["status_asof"] == "A" and rows[11]["version_asof"] == 1
    assert rows[12]["status_asof"] == "C"  # last same-instant version wins
    assert rows[13]["status_asof"] == "C"
