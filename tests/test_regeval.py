"""Tests for operators/regeval.regression_eval — hand-computed MAE /
bias / wMAPE / MSE / R² values including the negative-R² and
degenerate branches."""

from data_pipeline_childcare_spark.operators.regeval import regression_eval


def _tp(spark, rows):
    return spark.createDataFrame(rows, "truth double, pred double")


def test_perfect_predictions(spark):
    r = regression_eval(_tp(spark, [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)])).collect()[0]
    assert (r["mae_u"], r["bias_u"], r["wmape_u"], r["mse_u"]) == (0, 0, 0, 0)
    assert r["r2_u"] == 1_000_000


def test_constant_positive_error(spark):
    # pred = truth + 1 → MAE 1, bias +1, wMAPE 3/6, MSE 1, R² = -0.5
    r = regression_eval(_tp(spark, [(1.0, 2.0), (2.0, 3.0), (3.0, 4.0)])).collect()[0]
    assert r["mae_u"] == 1_000_000
    assert r["bias_u"] == 1_000_000
    assert r["wmape_u"] == 500_000
    assert r["mse_u"] == 1_000_000
    assert r["r2_u"] == -500_000


def test_negative_bias_sign_exact(spark):
    r = regression_eval(_tp(spark, [(2.0, 1.0), (2.0, 1.0)])).collect()[0]
    assert r["bias_u"] == -1_000_000
    assert r["mae_u"] == 1_000_000


def test_constant_truth_r2_null_wmape_defined(spark):
    r = regression_eval(_tp(spark, [(2.0, 1.0), (2.0, 3.0)])).collect()[0]
    assert r["r2_u"] is None
    assert r["wmape_u"] == 500_000  # 2/4


def test_zero_truth_wmape_null(spark):
    r = regression_eval(_tp(spark, [(0.0, 1.0), (0.0, -1.0)])).collect()[0]
    assert r["wmape_u"] is None
    assert r["bias_u"] == 0
    assert r["mae_u"] == 1_000_000


def test_group_trend_exact_line(spark):
    from data_pipeline_childcare_spark.operators.regeval import group_trend

    # y = 2.5 + 0.5x over days 0..4: slope 0.5/day, r2 = 1
    rows = [("a", f"2024-01-0{d+1} 00:00:00", 2.5 + 0.5 * d) for d in range(5)]
    df = spark.createDataFrame(rows, "g string, ts string, value double").selectExpr(
        "g", "cast(ts as timestamp) as ts", "value"
    )
    r = group_trend(df, "g", "ts", "value").collect()[0]
    assert r["slope_u_per_day"] == 500_000
    assert r["r2_u"] == 1_000_000


def test_group_trend_negative_and_flat(spark):
    from data_pipeline_childcare_spark.operators.regeval import group_trend

    rows = [("dn", f"2024-01-0{d+1} 00:00:00", 10.0 - 2.0 * d) for d in range(4)]
    rows += [("flat", f"2024-01-0{d+1} 00:00:00", 7.0) for d in range(4)]
    rows += [("one", "2024-01-01 00:00:00", 3.0)]
    df = spark.createDataFrame(rows, "g string, ts string, value double").selectExpr(
        "g", "cast(ts as timestamp) as ts", "value"
    )
    out = {r["g"]: r for r in group_trend(df, "g", "ts", "value").collect()}
    assert out["dn"]["slope_u_per_day"] == -2_000_000
    assert out["dn"]["r2_u"] == 1_000_000
    assert out["flat"]["slope_u_per_day"] == 0
    assert out["flat"]["r2_u"] is None  # zero y-variance
    assert out["one"]["slope_u_per_day"] is None  # zero x-variance


def test_pairwise_signed_r2_hand_cases(spark):
    from data_pipeline_childcare_spark.operators.regeval import pairwise_signed_r2

    rows = [(float(i), float(2 * i), float(10 - i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = {
        (r["col_a"], r["col_b"]): r["signed_r2_u"]
        for r in pairwise_signed_r2(df, {"a": 1, "b": 1, "c": 1}).collect()
    }
    assert out[("a", "b")] == 1_000_000   # perfect positive
    assert out[("a", "c")] == -1_000_000  # perfect negative
    assert out[("b", "c")] == -1_000_000


def test_pairwise_signed_r2_zero_variance_null(spark):
    from data_pipeline_childcare_spark.operators.regeval import pairwise_signed_r2

    rows = [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = pairwise_signed_r2(df, {"a": 1, "b": 1}).collect()[0]
    assert r["signed_r2_u"] is None
