"""Tests for operators/skew.key_skew_profile — hand-computed Gini /
percentile / share values and the uniform-distribution degenerate."""

from data_pipeline_childcare_spark.operators.skew import key_skew_profile


def test_hand_case(spark):
    # keys: a×6, b×2, c×1, d×1 → counts sorted asc [1,1,2,6]
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_profile(df, ["k"], top_n=2).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (10, 4, 6)
    assert (r["p50_count"], r["p90_count"], r["p99_count"]) == (1, 6, 6)
    assert r["top1_share_u"] == 600_000
    assert r["topn_share_u"] == 800_000  # hottest 2 keys own 8/10 rows
    # S = 1·1 + 2·1 + 3·2 + 4·6 = 33; G = (66 − 5·10)/(4·10) = 0.4
    assert r["gini_u"] == 400_000
    assert r["hot_key_factor_u"] == 2_400_000  # 6 / (10/4)


def test_uniform_keys_gini_zero(spark):
    rows = [(f"k{i % 5}",) for i in range(25)]  # every key exactly 5 rows
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_profile(df, ["k"], top_n=2).collect()[0]
    assert r["gini_u"] == 0
    assert r["hot_key_factor_u"] == 1_000_000
    assert (r["p50_count"], r["p99_count"]) == (5, 5)
    assert r["topn_share_u"] == 400_000  # 2 of 5 equal keys


def test_topn_exceeding_key_count_is_full_share(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    r = key_skew_profile(df, ["k"], top_n=10).collect()[0]
    assert r["topn_share_u"] == 1_000_000


def test_single_key(spark):
    df = spark.createDataFrame([("a",)] * 7, "k string")
    r = key_skew_profile(df, ["k"]).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (7, 1, 7)
    assert r["gini_u"] == 0
    assert r["top1_share_u"] == 1_000_000
    assert r["hot_key_factor_u"] == 1_000_000


def test_join_advisor_broadcast_small_side(spark):
    from data_pipeline_childcare_spark.operators.skew import join_strategy_advisor

    left = spark.createDataFrame([(i % 100,) for i in range(2000)], "k long")
    right = spark.createDataFrame([(i,) for i in range(50)], "k long")
    r = join_strategy_advisor(left, right, ["k"], broadcast_row_limit=100).collect()[0]
    assert r["recommendation"] == "broadcast_right"
    assert r["salt_factor"] == 1
    assert (r["left_n_rows"], r["right_n_rows"]) == (2000, 50)


def test_join_advisor_salts_hot_key(spark):
    from data_pipeline_childcare_spark.operators.skew import join_strategy_advisor

    # one celebrity key owning ~95% of rows on the left
    left = spark.createDataFrame(
        [(0,)] * 950 + [(i,) for i in range(1, 51)], "k long"
    )
    right = spark.createDataFrame([(i % 50,) for i in range(1000)], "k long")
    r = join_strategy_advisor(
        left, right, ["k"], broadcast_row_limit=10, skew_factor_u=16_000_000
    ).collect()[0]
    assert r["recommendation"] == "salted_skew_join"
    # hot = 950 / (1000/51) = 48.45 → ceil = 49 salts
    assert r["salt_factor"] == 49


def test_join_advisor_uniform_goes_smj(spark):
    from data_pipeline_childcare_spark.operators.skew import join_strategy_advisor

    left = spark.createDataFrame([(i % 500,) for i in range(1000)], "k long")
    right = spark.createDataFrame([(i % 500,) for i in range(1500)], "k long")
    r = join_strategy_advisor(left, right, ["k"], broadcast_row_limit=100).collect()[0]
    assert r["recommendation"] == "sort_merge_join"
    assert r["salt_factor"] == 1


def test_join_cardinality_exact_prediction(spark):
    from data_pipeline_childcare_spark.operators.skew import (
        join_cardinality_estimate,
    )

    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("only_left",)], "k string"
    )
    right = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] + [("only_right",)] * 5, "k string"
    )
    r = join_cardinality_estimate(left, right, ["k"]).collect()[0]
    assert r["left_rows"] == 6 and r["right_rows"] == 10
    assert r["left_keys"] == 3 and r["right_keys"] == 3
    assert r["matching_keys"] == 2
    assert r["predicted_rows"] == 3 * 4 + 2 * 1
    assert r["actual_rows"] == r["predicted_rows"]


def test_join_cardinality_no_overlap(spark):
    from data_pipeline_childcare_spark.operators.skew import (
        join_cardinality_estimate,
    )

    left = spark.createDataFrame([("a",)], "k string")
    right = spark.createDataFrame([("b",)], "k string")
    r = join_cardinality_estimate(left, right, ["k"], certify=False).collect()[0]
    assert r["matching_keys"] == 0 and r["predicted_rows"] == 0
    assert "actual_rows" not in r.asDict()


def test_pareto_concentration_hand_case(spark):
    from data_pipeline_childcare_spark.operators.skew import pareto_concentration

    # revenues: 50, 30, 10, 10 (total 100)
    rows = [("a", 50.0), ("b", 30.0), ("c", 10.0), ("d", 10.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    r = pareto_concentration(df, ["k"], "value").collect()[0]
    assert r["n_keys"] == 4
    assert r["total_u"] == 100_000_000
    assert r["top1_share_u"] == 500_000
    assert r["n_for_50"] == 1   # 'a' alone reaches 50%
    assert r["n_for_80"] == 2   # a+b = 80%
    assert r["n_for_90"] == 3   # a+b+c = 90%


def test_pareto_two_level_matches_single_window(spark):
    """The bucketed two-level cumsum must equal the naive global
    order on data spanning many buckets (values up to 2^25 micro)."""
    import random

    from data_pipeline_childcare_spark.operators.skew import pareto_concentration

    rng = random.Random(7)
    rows = [(f"k{i}", rng.uniform(0.5, 40.0)) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, value double")
    r = pareto_concentration(df, ["k"], "value").collect()[0]
    # python model
    vals = sorted(
        (int(v * 1_000_000 + 0.5) for _, v in rows), reverse=True
    )
    total = sum(vals)
    def n_for(t_u):
        cum = 0; n = 0
        for v in vals:
            if cum * 1_000_000 < t_u * total:
                n += 1; cum += v
            else:
                break
        return n
    assert r["n_for_50"] == n_for(500_000)
    assert r["n_for_80"] == n_for(800_000)
    assert r["n_for_90"] == n_for(900_000)
    assert r["total_u"] == total
