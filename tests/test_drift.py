"""Snapshot drift report (operators/drift) against hand-built
snapshots covering every status."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import data_pipeline_childcare_spark as eng


@pytest.fixture(scope="module")
def spark():
    s = eng.get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def test_snapshot_drift_statuses(spark):
    from data_pipeline_childcare_spark.operators.drift import snapshot_drift_report

    a = spark.createDataFrame(
        [(i, f"u{i}", float(i), i % 3) for i in range(100)],
        "id long, name string, score double, gone int",
    )
    # b: 'gone' removed, 'fresh' added, 'score' re-typed, 'name'
    # nulled on the %4 lattice (25% null-rate drift), 'id' distinct
    # collapsed mod 2 (relative-distinct drift)
    b = spark.createDataFrame(
        [
            (i % 2, None if i % 4 == 0 else f"u{i}", str(float(i)), i > 50)
            for i in range(100)
        ],
        "id long, name string, score string, fresh boolean",
    )
    got = {r["column_name"]: r.asDict() for r in snapshot_drift_report(a, b).collect()}
    assert set(got) == {"id", "name", "score", "gone", "fresh"}
    assert got["gone"]["status"] == "removed" and got["gone"]["type_b"] is None
    assert got["fresh"]["status"] == "added" and got["fresh"]["type_a"] is None
    assert got["score"]["status"] == "type_changed"
    assert (got["score"]["type_a"], got["score"]["type_b"]) == ("double", "string")
    # name: 25 of 100 null → delta 250000 micro > 10000 → drift
    assert got["name"]["status"] == "drift"
    assert got["name"]["null_rate_delta_micro"] == 250_000
    # id: distinct 100 → 2, relative move ≫ 20% → drift
    assert got["id"]["status"] == "drift"
    assert (got["id"]["n_distinct_a"], got["id"]["n_distinct_b"]) == (100, 2)
    # removed column still reports its A-side stats
    assert got["gone"]["n_rows_a"] == 100 and got["gone"]["n_distinct_a"] == 3
    assert got["gone"]["n_rows_b"] is None


def test_snapshot_drift_identical_snapshots_all_ok(spark):
    from data_pipeline_childcare_spark.operators.drift import snapshot_drift_report

    a = spark.createDataFrame(
        [(i, f"u{i}") for i in range(50)], "id long, name string"
    )
    got = snapshot_drift_report(a, a).collect()
    assert {r["status"] for r in got} == {"ok"}
    assert all(r["null_rate_delta_micro"] == 0 for r in got)


def test_vocab_drift_hand_case(spark):
    from data_pipeline_childcare_spark.operators.drift import vocab_drift

    a = spark.createDataFrame(
        [("alpha beta",), ("alpha gamma",), ("beta gamma",)], "text string"
    )
    b = spark.createDataFrame(
        [("alpha delta",), ("alpha delta",), ("beta beta",)], "text string"
    )
    # vocab A (df>=2): alpha(2), beta(2), gamma(2); vocab B: alpha(2),
    # delta(2) — beta appears in ONE doc of B twice (per-doc distinct!)
    r = vocab_drift(a, b, min_df=2).collect()[0]
    assert r["n_vocab_a"] == 3 and r["n_vocab_b"] == 2
    assert r["n_shared"] == 1  # alpha
    assert r["n_only_a"] == 2 and r["n_only_b"] == 1
    assert r["vocab_jaccard_u"] == 1_000_000 // 4


def test_vocab_drift_identical_corpora(spark):
    from data_pipeline_childcare_spark.operators.drift import vocab_drift

    a = spark.createDataFrame([("x y",), ("x y",)], "text string")
    r = vocab_drift(a, a, min_df=2).collect()[0]
    assert r["vocab_jaccard_u"] == 1_000_000
    assert r["n_only_a"] == r["n_only_b"] == 0
