"""CDC merge (latest-wins upsert/delete) and funnel-conversion
semantics on crafted inputs."""

from __future__ import annotations

import datetime as dt

from data_pipeline_childcare_spark.operators.merge import (
    funnel_counts,
    merge_changes,
)


def test_merge_latest_wins_delete_and_insert(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", "U", 1),
            (1, "a2", "U", 2),   # latest wins
            (2, None, "D", 1),   # delete
            (9, "z", "I", 1),    # insert
        ],
        "k long, v string, op string, seq long",
    )
    got = {r["k"]: r["v"] for r in merge_changes(snap, changes, "k").collect()}
    assert got == {1: "a2", 3: "c", 9: "z"}


def test_merge_is_noop_on_empty_changes(spark):
    snap = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    empty = spark.createDataFrame([], "k long, v string, op string, seq long")
    got = sorted((r["k"], r["v"]) for r in merge_changes(snap, empty, "k").collect())
    assert got == [(1, "a"), (2, "b")]


def test_funnel_requires_strict_order(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1 completes the whole funnel in order
        (1, t0, "click"), (1, t0 + m, "view"), (1, t0 + 2 * m, "purchase"),
        # user 2 views BEFORE clicking: stops at step 0
        (2, t0, "view"), (2, t0 + m, "click"),
        # user 3 clicks then views, never purchases: stops at step 1
        (3, t0, "click"), (3, t0 + m, "view"),
        # user 4 purchases first, then click+view: reaches step 1 only
        (4, t0, "purchase"), (4, t0 + m, "click"), (4, t0 + 2 * m, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["step"]: r["n_users"] for r in
           funnel_counts(df, ("click", "view", "purchase")).collect()}
    assert got == {"click": 4, "view": 3, "purchase": 1}
