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
