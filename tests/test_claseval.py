"""Unit tests for operators/claseval.py — hand-computed confusion /
AUC / Brier / calibration values, including the tie-handling cases
that distinguish Mann-Whitney-with-average-ranks from naive pair
counting."""

import pytest

from data_pipeline_childcare_spark.operators.claseval import (
    binary_eval_summary,
    calibration_bins,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


def test_perfect_separation(spark):
    df = _scored(
        spark, [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
    )
    r = binary_eval_summary(df).collect()[0]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (2, 0, 2, 0)
    assert r["accuracy_u"] == 1_000_000
    assert r["precision_u"] == 1_000_000
    assert r["recall_u"] == 1_000_000
    assert r["f1_u"] == 1_000_000
    assert r["auc_u"] == 1_000_000


def test_reversed_scores(spark):
    df = _scored(
        spark, [(0.1, True), (0.2, True), (0.8, False), (0.9, False)]
    )
    r = binary_eval_summary(df).collect()[0]
    assert r["auc_u"] == 0
    assert r["recall_u"] == 0
    # both negatives score above threshold → tp=0, fp=2 → precision 0
    assert r["precision_u"] == 0
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (0, 2, 0, 2)


def test_all_tied_scores_auc_half(spark):
    df = _scored(spark, [(0.5, True), (0.5, False), (0.5, True), (0.5, False)])
    r = binary_eval_summary(df).collect()[0]
    assert r["auc_u"] == 500_000


def test_hand_computed_mixed_case(spark):
    # pos {0.8, 0.4}, neg {0.6, 0.4, 0.2}
    # asc ranks: 0.2→1, 0.4→{2,3} (avg 2.5), 0.6→4, 0.8→5
    # S_pos = 2.5 + 5 = 7.5, U = 7.5 - 3 = 4.5, AUC = 4.5/6 = 0.75
    df = _scored(
        spark,
        [(0.8, True), (0.4, True), (0.6, False), (0.4, False), (0.2, False)],
    )
    r = binary_eval_summary(df).collect()[0]
    assert (r["n"], r["n_pos"], r["n_neg"]) == (5, 2, 3)
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (1, 1, 2, 1)
    assert r["accuracy_u"] == 600_000
    assert r["precision_u"] == 500_000
    assert r["recall_u"] == 500_000
    assert r["f1_u"] == 500_000
    assert r["auc_u"] == 750_000
    # Brier = (0.04 + 0.36 + 0.36 + 0.16 + 0.04) / 5 = 0.192
    assert r["brier_u"] == 192_000


def test_single_class_auc_null(spark):
    df = _scored(spark, [(0.9, True), (0.1, True)])
    r = binary_eval_summary(df).collect()[0]
    assert r["auc_u"] is None
    assert r["recall_u"] == 500_000  # one above threshold


def test_calibration_bins(spark):
    df = _scored(
        spark,
        [(0.8, True), (0.4, True), (0.6, False), (0.4, False), (0.2, False)],
    )
    rows = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(rows) == {2, 4, 6, 8}
    b4 = rows[4]
    assert (b4["n"], b4["n_pos"]) == (2, 1)
    assert b4["mean_score_u"] == 400_000
    assert b4["frac_pos_u"] == 500_000
    assert rows[8]["frac_pos_u"] == 1_000_000


def test_calibration_top_bin_inclusive(spark):
    df = _scored(spark, [(1.0, True), (0.0, False)])
    rows = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(rows) == {0, 9}
    assert rows[9]["mean_score_u"] == 1_000_000


def test_threshold_is_inclusive(spark):
    # score exactly at threshold counts as predicted-positive
    df = _scored(spark, [(0.5, True), (0.49, False)])
    r = binary_eval_summary(df, threshold=0.5).collect()[0]
    assert (r["tp"], r["tn"]) == (1, 1)


def test_pr_curve_hand_case(spark):
    from data_pipeline_childcare_spark.operators.claseval import pr_curve

    df = _scored(
        spark,
        [(0.8, True), (0.4, True), (0.6, False), (0.4, False), (0.2, False)],
    )
    rows = {r["threshold_u"]: r for r in pr_curve(df).collect()}
    assert set(rows) == {200_000, 400_000, 600_000, 800_000}
    r8 = rows[800_000]
    assert (r8["tp"], r8["fp"], r8["fn"]) == (1, 0, 1)
    assert (r8["precision_u"], r8["recall_u"], r8["f1_u"]) == (
        1_000_000, 500_000, 666_666,
    )
    r4 = rows[400_000]
    assert (r4["tp"], r4["fp"], r4["fn"]) == (2, 2, 0)
    assert (r4["precision_u"], r4["recall_u"], r4["f1_u"]) == (
        500_000, 1_000_000, 666_666,
    )
    r2 = rows[200_000]
    assert (r2["precision_u"], r2["recall_u"], r2["f1_u"]) == (
        400_000, 1_000_000, 571_428,
    )


def test_pr_curve_recall_monotone_in_threshold(spark):
    from data_pipeline_childcare_spark.operators.claseval import pr_curve

    df = _scored(
        spark,
        [(s / 20.0, (s * 7) % 3 == 0) for s in range(20)],
    )
    rows = pr_curve(df).collect()  # ordered by threshold asc
    recalls = [r["recall_u"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    tps = [r["tp"] for r in rows]
    assert tps == sorted(tps, reverse=True)


def test_gini_stump_perfect_split(spark):
    from data_pipeline_childcare_spark.operators.claseval import gini_stump

    rows = [(0.1, 0)] * 5 + [(0.9, 1)] * 5
    df = spark.createDataFrame(rows, "score double, label int")
    r = gini_stump(df).collect()[0]
    assert r["best_threshold_u"] == 900_000  # left = score < 0.9
    assert r["child_gini_u"] == 0
    assert r["parent_gini_u"] == 500_000  # balanced parent
    assert r["gain_u"] == 500_000
    assert (r["left_n"], r["left_pos"], r["right_n"], r["right_pos"]) == (5, 0, 5, 5)


def test_gini_stump_hand_impurity(spark):
    from data_pipeline_childcare_spark.operators.claseval import gini_stump

    # scores 0.1(n=4: 1 pos), 0.5(n=4: 3 pos): best split at 0.5
    rows = [(0.1, 1)] + [(0.1, 0)] * 3 + [(0.5, 1)] * 3 + [(0.5, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    r = gini_stump(df).collect()[0]
    assert r["best_threshold_u"] == 500_000
    # left gini = 2*1/4*3/4 = 0.375; right same; weighted = 0.375
    assert r["child_gini_u"] == 375_000
    assert r["parent_gini_u"] == 500_000
    assert r["gain_u"] == 125_000


def test_gini_stump_tie_breaks_to_smallest_threshold(spark):
    from data_pipeline_childcare_spark.operators.claseval import gini_stump

    # constant labels: every split has gini 0 -> smallest threshold wins
    rows = [(0.1, 1), (0.2, 1), (0.3, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    r = gini_stump(df).collect()[0]
    assert r["best_threshold_u"] == 200_000  # smallest with non-empty left
    assert r["child_gini_u"] == 0 and r["gain_u"] == 0


def test_chi_square_independent_table_zero(spark):
    from data_pipeline_childcare_spark.operators.claseval import (
        chi_square_independence,
    )

    # perfectly independent 2x2: every cell = r*c/N exactly
    rows = (
        [("a", "x")] * 4 + [("a", "y")] * 4 + [("b", "x")] * 4 + [("b", "y")] * 4
    )
    df = spark.createDataFrame(rows, "r string, c string")
    r = chi_square_independence(df, "r", "c").collect()[0]
    assert r["chi2_u"] == 0
    assert r["dof"] == 1 and r["n"] == 16


def test_chi_square_hand_value(spark):
    from data_pipeline_childcare_spark.operators.claseval import (
        chi_square_independence,
    )

    # 2x2: [[10, 0], [0, 10]] -> chi2 = N = 20 (perfect association)
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    r = chi_square_independence(df, "r", "c").collect()[0]
    assert r["chi2_u"] == 20_000_000
    assert r["dof"] == 1


def test_gini_stump_cv_perfect_separation(spark):
    from data_pipeline_childcare_spark.operators.claseval import gini_stump_cv

    # perfectly separable: every fold learns threshold 0.9, labels
    # (0 left, 1 right), OOF accuracy 1.0
    rows = [(i, 0.1, 0) for i in range(50)] + [(i + 50, 0.9, 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, score double, label int")
    out = gini_stump_cv(df, id_col="doc_id", n_folds=5).collect()
    assert len(out) == 5
    for r in out:
        assert r["threshold_u"] == 900_000
        assert (r["left_label"], r["right_label"]) == (0, 1)
        assert r["oof_acc_u"] == 1_000_000
        assert r["oof_n"] == 20


def test_gini_stump_cv_counts_partition(spark):
    from data_pipeline_childcare_spark.operators.claseval import gini_stump_cv

    rows = [(i, (i % 10) / 10.0, i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, score double, label int")
    out = gini_stump_cv(df, id_col="doc_id", n_folds=5).collect()
    assert sum(r["oof_n"] for r in out) == 100  # folds partition the corpus
    assert all(0 <= r["oof_acc_u"] <= 1_000_000 for r in out)
