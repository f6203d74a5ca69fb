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


def test_cms_never_undercounts_and_tight_when_wide(spark):
    from data_pipeline_childcare_spark.operators.sketches import cms_heavy_hitters

    ev = eng.load_table(spark, "events", "/root/testdata/sf0.001")
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    got = cms_heavy_hitters(ev, "user_id", depth=4, width=4096, k=50).collect()
    for r in got:
        assert r["est_count"] >= exact[r["user_id"]]
    # width 4096 >> distinct users at sf0.001: collisions are rare
    # enough that the top estimate is exact
    top = got[0]
    assert top["est_count"] == exact[top["user_id"]]


def test_cms_counters_merge_by_addition(spark):
    from data_pipeline_childcare_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )

    ev = eng.load_table(spark, "events", "/root/testdata/sf0.001")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        cms_counters(half_a, "user_id")
        .unionAll(cms_counters(half_b, "user_id"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_counters(ev, "user_id")
    cand = ev.select("user_id").distinct().limit(30)
    est_merged = sorted(map(tuple, cms_estimate(merged, cand, "user_id").collect()))
    est_whole = sorted(map(tuple, cms_estimate(whole, cand, "user_id").collect()))
    assert est_merged == est_whole


def test_hll_estimator_accuracy_on_events(spark):
    from data_pipeline_childcare_spark.operators.sketches import hll_distinct

    ev = eng.load_table(spark, "events", "/root/testdata/sf0.001")
    got = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(ev, ("event_type",), "user_id", p=8).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(
            F.count_distinct("user_id").alias("n")
        ).collect()
    }
    for et, n in exact.items():
        # σ/μ ≈ 1.04/√256 = 6.5%; allow 4σ (linear-counting branch is
        # far tighter, so this bound covers both regimes)
        assert abs(got[et] - n) / n < 4 * 1.04 / 16, (et, got[et], n)


def test_hll_registers_merge_by_max(spark):
    """Sketches of disjoint halves merged register-wise equal the
    whole-input sketch — the property that makes HLL mergeable across
    days/sources at 100 TB."""
    from data_pipeline_childcare_spark.operators.sketches import (
        hll_distinct,
        hll_estimate,
        hll_registers,
    )

    ev = eng.load_table(spark, "events", "/root/testdata/sf0.001")
    whole = sorted(
        map(tuple, hll_distinct(ev, ("event_type",), "user_id").collect())
    )
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    merged_regs = (
        hll_registers(half_a, ("event_type",), "user_id")
        .unionAll(hll_registers(half_b, ("event_type",), "user_id"))
        .groupBy("event_type", "_idx")
        .agg(F.max("_M").alias("_M"))
    )
    merged = sorted(
        map(tuple, hll_estimate(merged_regs, ("event_type",)).collect())
    )
    assert whole == merged


def test_hll_deterministic_across_runs(spark):
    from data_pipeline_childcare_spark.operators.sketches import hll_distinct

    ev = eng.load_table(spark, "events", "/root/testdata/sf0.001")
    a = sorted(map(tuple, hll_distinct(ev, ("event_type",), "user_id").collect()))
    b = sorted(map(tuple, hll_distinct(ev, ("event_type",), "user_id").collect()))
    assert a == b


def test_histogram_quantiles_within_half_bin_of_exact(spark):
    from data_pipeline_childcare_spark.operators.sketches import (
        histogram_quantiles,
    )

    ev = eng.load_table(spark, "events", "/root/testdata/sf0.001")
    got = {
        (r["event_type"], r["q"]): r["est_value"]
        for r in histogram_quantiles(ev, ("event_type",), "value", bins=256).collect()
    }
    by_type: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        width = (vals[-1] - vals[0]) / 256
        for q in (0.5, 0.9, 0.99):
            # the sketch uses percentile_disc rank semantics: the value
            # at rank ceil(q*n). That value lies inside the chosen bin,
            # so the bin-center estimate is within half a bin width.
            exact = vals[math.ceil(q * n) - 1]
            est = got[(et, q)]
            assert abs(est - exact) <= width / 2 + 1e-9, (et, q, est, exact)


def test_histogram_quantiles_constant_group(spark):
    from data_pipeline_childcare_spark.operators.sketches import (
        histogram_quantiles,
    )

    df = spark.createDataFrame([("a", 7.0)] * 10, "g string, v double")
    rows = histogram_quantiles(df, ("g",), "v").collect()
    assert all(r["est_value"] == 7.0 for r in rows)


def test_kmv_set_estimates_accuracy(spark):
    from data_pipeline_childcare_spark.operators.sketches import (
        kmv_set_estimates,
    )

    # |A|=600, |B|=600, |A∩B|=200 → union 1000, jaccard 0.2
    a = spark.createDataFrame([(i,) for i in range(600)], "v long")
    b = spark.createDataFrame([(i,) for i in range(400, 1000)], "v long")
    row = kmv_set_estimates(a, b, "v", k=256).collect()[0]
    assert abs(row["est_union"] - 1000) / 1000 < 3 / math.sqrt(254)
    assert abs(row["jaccard"] - 0.2) < 0.1
    assert abs(row["est_intersection"] - 200) < 0.5 * 200 + 20


def test_kmv_set_exact_below_k(spark):
    from data_pipeline_childcare_spark.operators.sketches import (
        kmv_set_estimates,
    )

    a = spark.createDataFrame([(i,) for i in range(30)], "v long")
    b = spark.createDataFrame([(i,) for i in range(20, 50)], "v long")
    row = kmv_set_estimates(a, b, "v", k=256).collect()[0]
    # under k distinct hashes: everything is exact
    assert row["est_union"] == 50.0
    assert row["jaccard"] == round(10 / 50, 6)
    assert row["est_intersection"] == 10.0


def test_histogram_quantiles_ignores_null_values(spark):
    """Rows with NULL value used to land in the top bin (floor(NULL)
    slipping past F.least) while being excluded from _n — the
    estimates must be identical with and without NULL rows."""
    from data_pipeline_childcare_spark.operators.sketches import histogram_quantiles

    clean = spark.createDataFrame(
        [("a", float(v)) for v in range(100)], "g string, v double"
    )
    noisy = clean.unionByName(
        spark.createDataFrame([("a", None)] * 7, "g string, v double")
    )
    got_clean = {
        (r["g"], r["q"]): r["est_value"]
        for r in histogram_quantiles(clean, ("g",), "v", bins=16).collect()
    }
    got_noisy = {
        (r["g"], r["q"]): r["est_value"]
        for r in histogram_quantiles(noisy, ("g",), "v", bins=16).collect()
    }
    assert got_clean == got_noisy
