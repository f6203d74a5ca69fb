"""KMV distinct-count sketch: estimator accuracy, exact-path cutover,
and determinism of the portable hash family."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import data_pipeline_childcare_spark as eng
from data_pipeline_childcare_spark.operators.sketches import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], "g string, v long"
    )
    row = kmv_distinct(df, ("g",), "v", k=64).first()
    assert row["n_kept"] == 10 and row["est_distinct"] == 10.0


def test_kmv_estimator_accuracy_on_events(spark):
    ev = eng.load_table(spark, "events", "/root/testdata/sf0.001")
    got = {
        r["event_type"]: r for r in kmv_distinct(ev, ("event_type",), "user_id", k=64).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    for et, n in exact.items():
        est = got[et]["est_distinct"]
        if got[et]["n_kept"] < 64:
            assert est == float(n)
        else:
            # σ/μ ≈ 1/√(k−2) ≈ 12.7%; allow 5σ
            assert abs(est - n) / n < 5 / math.sqrt(62), (et, est, n)


def test_kmv_deterministic_across_runs(spark):
    ev = eng.load_table(spark, "events", "/root/testdata/sf0.001")
    a = sorted(map(tuple, kmv_distinct(ev, ("event_type",), "user_id").collect()))
    b = sorted(map(tuple, kmv_distinct(ev, ("event_type",), "user_id").collect()))
    assert a == b
