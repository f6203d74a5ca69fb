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


def test_scd2_point_in_time_null_attr_not_backfilled(spark):
    """All as-of fields must come from the SAME elected version row:
    a version whose attribute is legitimately NULL stays NULL — it
    must NOT be backfilled from an older version's non-null value
    (per-column last(ignorenulls) fills would mix versions)."""
    from data_pipeline_childcare_spark.operators.scd import scd2_point_in_time

    hist = spark.createDataFrame(
        [
            # v1: status=A tier=gold; v2: status=B tier=NULL (real state)
            (1, "A", "gold", "2024-01-01 00:00:00", "2024-01-10 00:00:00", 1),
            (1, "B", None, "2024-01-10 00:00:00", None, 2),
        ],
        "k long, status string, tier string, vf string, vt string, version long",
    ).selectExpr(
        "k",
        "status",
        "tier",
        "cast(vf as timestamp) as valid_from",
        "cast(vt as timestamp) as valid_to",
        "version",
    )
    facts = spark.createDataFrame(
        [(20, 1, "2024-01-05 00:00:00"), (21, 1, "2024-01-15 00:00:00")],
        "fid long, k long, fts string",
    ).selectExpr("fid", "k", "cast(fts as timestamp) as fts")
    rows = {
        r["fid"]: r
        for r in scd2_point_in_time(
            facts, hist, "k", "fts", ["status", "tier"]
        ).collect()
    }
    assert rows[20]["status_asof"] == "A" and rows[20]["tier_asof"] == "gold"
    assert rows[20]["version_asof"] == 1
    # the v2 fact sees v2's NULL tier, not v1's "gold"
    assert rows[21]["status_asof"] == "B" and rows[21]["tier_asof"] is None
    assert rows[21]["version_asof"] == 2
