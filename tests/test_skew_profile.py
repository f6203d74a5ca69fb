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
