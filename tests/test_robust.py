"""Median/MAD outliers and split conformal: hand-computed order
statistics, degenerate MAD, the conformal rank rule and coverage."""

from data_pipeline_childcare_spark.operators.robust import (
    conformal_interval,
    robust_outliers,
)


def test_median_mad_hand_case(spark):
    # values 1..7 plus an outlier 100: median 4.5->lower 4, deviations
    # from 4000m: [3000,2000,1000,0,1000,2000,3000,96000] -> MAD 2000
    vals = [1, 2, 3, 4, 5, 6, 7, 100]
    df = spark.createDataFrame(
        [("a", float(v)) for v in vals], "event_type string, value double"
    )
    r = robust_outliers(df, k=5).collect()[0]
    assert r["n"] == 8
    assert r["median_m"] == 4000  # lower median of 8 values: 4th smallest
    assert r["mad_m"] == 2000
    # only 100 deviates > 5*2000 = 10000 milli
    assert r["n_outliers"] == 1
    assert r["outlier_frac_u"] == 1_000_000 // 8


def test_mad_zero_degenerate(spark):
    # over half identical -> MAD 0 -> any deviation flags
    df = spark.createDataFrame(
        [("a", 5.0)] * 6 + [("a", 5.001)], "event_type string, value double"
    )
    r = robust_outliers(df, k=5).collect()[0]
    assert r["mad_m"] == 0
    assert r["n_outliers"] == 1


def test_conformal_rank_and_coverage(spark):
    # calibration |errors| (milli): 1000..9000, n=9 ->
    # rank = 10 - floor(10*0.1) = 9 -> qhat = 9000
    calib = spark.createDataFrame(
        [(float(i), 0.0) for i in range(1, 10)], "truth double, pred double"
    )
    test = spark.createDataFrame(
        [(5.0, 0.0), (12.0, 0.0)], "truth double, pred double"
    )
    r = conformal_interval(calib, test, alpha_u=100_000).collect()[0]
    assert r["n_calib"] == 9 and r["n_test"] == 2
    assert r["qhat_m"] == 9000
    assert r["coverage_u"] == 500_000  # |5| covered, |12| not
    assert r["guarantee_u"] == 900_000


def test_conformal_infinite_interval_null(spark):
    # n=2, alpha=0.1: rank = 3 - floor(3*0.1) = 3 > n -> null qhat
    calib = spark.createDataFrame(
        [(1.0, 0.0), (2.0, 0.0)], "truth double, pred double"
    )
    test = spark.createDataFrame([(1.0, 0.0)], "truth double, pred double")
    r = conformal_interval(calib, test, alpha_u=100_000).collect()[0]
    assert r["qhat_m"] is None
    assert r["coverage_u"] == 0  # e <= null is never true


def test_poisson_table_invariants():
    from data_pipeline_childcare_spark.operators.robust import poisson_table

    t = poisson_table()
    thrs = [x for x, _ in t]
    assert thrs == sorted(thrs) and t[-1][0] == 1_000_000
    assert [k for _, k in t] == list(range(len(t)))
    # mode mass at k=0 and k=1 roughly equal (lambda=1)
    assert abs(thrs[0] - (thrs[1] - thrs[0])) <= 1


def test_poisson_bootstrap_ci_brackets_mean(spark):
    from data_pipeline_childcare_spark.operators.robust import (
        poisson_bootstrap_mean,
    )

    rows = [(i, 10.0 + (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, value double")
    r = poisson_bootstrap_mean(df, "id", "value", n_replicas=40).collect()[0]
    assert r["n"] == 500 and r["n_replicas"] == 40
    assert r["ci_lo_u"] <= r["mean_u"] <= r["ci_hi_u"]
    # CI of a 500-row mean should be tight around 13 (values 10..16)
    assert 12_000_000 < r["ci_lo_u"] < r["ci_hi_u"] < 14_000_000


def test_poisson_bootstrap_deterministic(spark):
    from data_pipeline_childcare_spark.operators.robust import (
        poisson_bootstrap_mean,
    )

    rows = [(i, float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, value double")
    a = poisson_bootstrap_mean(df, "id", "value").collect()[0]
    b = poisson_bootstrap_mean(df, "id", "value").collect()[0]
    assert a == b  # seeded draw: bit-identical re-runs
    c = poisson_bootstrap_mean(df, "id", "value", salt="other").collect()[0]
    assert (c["ci_lo_u"], c["ci_hi_u"]) != (a["ci_lo_u"], a["ci_hi_u"])


def test_winsorize_audit_hand_case(spark):
    from data_pipeline_childcare_spark.operators.robust import winsorize_audit

    # 100 values 1..100: p10 rank = ceil(0.1*100)=10 -> value 10;
    # p90 rank = 90 -> value 90; clipped: 9 below + 10 above
    rows = [("a", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = winsorize_audit(df, lo_u=100_000, hi_u=900_000).collect()[0]
    assert r["p_lo_m"] == 10_000 and r["p_hi_m"] == 90_000
    assert r["n_clipped_lo"] == 9 and r["n_clipped_hi"] == 10
    assert r["clipped_frac_u"] == 190_000


def test_winsorize_single_value_group(spark):
    from data_pipeline_childcare_spark.operators.robust import winsorize_audit

    df = spark.createDataFrame([("a", 7.0)] * 3, "event_type string, value double")
    r = winsorize_audit(df).collect()[0]
    assert r["p_lo_m"] == r["p_hi_m"] == 7000
    assert r["n_clipped_lo"] == r["n_clipped_hi"] == 0


def test_impute_group_median_hand_case(spark):
    from data_pipeline_childcare_spark.operators.robust import (
        impute_group_median,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None), ("b", None)],
        "g string, value double",
    )
    rows = {r["g"]: r for r in impute_group_median(df, "g", "value").collect()}
    assert rows["a"]["fill_value_m"] == 2000  # median of observed {1,2,3}
    assert rows["a"]["n_missing"] == 1 and rows["a"]["n"] == 4
    assert rows["a"]["missing_frac_u"] == 250_000
    assert rows["b"]["fill_value_m"] is None  # nothing observed
    assert rows["b"]["missing_frac_u"] == 1_000_000
