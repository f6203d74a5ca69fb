"""Funnel and cohort retention: hand-computed conversions, the
strictly-after ordering rule, cohort-size pinning; KS hand cases."""

import pytest

from data_pipeline_childcare_spark.operators.drift import ks_statistic
from data_pipeline_childcare_spark.operators.funnel import cohort_retention, funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).selectExpr("user_id", "cast(ts as timestamp) as ts", "event_type")


def test_funnel_strictly_after_ordering(spark):
    df = _ev(
        spark,
        [
            # u1 full ordered funnel
            (1, "2024-01-01 00:00:00", "signup"),
            (1, "2024-01-01 01:00:00", "click"),
            (1, "2024-01-01 02:00:00", "purchase"),
            # u2: click BEFORE signup -> stops at step 1
            (2, "2024-01-01 01:00:00", "click"),
            (2, "2024-01-01 02:00:00", "signup"),
            # u3: signup+click, purchase SIMULTANEOUS with click -> not strictly after
            (3, "2024-01-01 00:00:00", "signup"),
            (3, "2024-01-01 01:00:00", "click"),
            (3, "2024-01-01 01:00:00", "purchase"),
            # u4 never signs up
            (4, "2024-01-01 00:00:00", "click"),
        ],
    )
    rows = {r["step"]: r for r in funnel(df, ["signup", "click", "purchase"]).collect()}
    assert (rows[1]["n_users"], rows[2]["n_users"], rows[3]["n_users"]) == (3, 2, 1)
    assert rows[1]["conv_from_prev_u"] is None
    assert rows[1]["conv_from_top_u"] == 1_000_000
    assert rows[2]["conv_from_prev_u"] == 2 * 1_000_000 // 3
    assert rows[3]["conv_from_prev_u"] == 500_000
    assert rows[3]["conv_from_top_u"] == 1_000_000 // 3
    assert [rows[s]["step_name"] for s in (1, 2, 3)] == ["signup", "click", "purchase"]


def test_funnel_requires_two_steps(spark):
    df = _ev(spark, [(1, "2024-01-01 00:00:00", "signup")])
    with pytest.raises(ValueError):
        funnel(df, ["signup"])


def test_cohort_retention_hand_case(spark):
    df = _ev(
        spark,
        [
            # cohort week of 2024-01-01 (epoch week 2817): u1, u2
            (1, "2024-01-01 00:00:00", "x"),
            (2, "2024-01-02 00:00:00", "x"),
            # u1 returns 1 week later (x2 events, counted once)
            (1, "2024-01-08 00:00:00", "x"),
            (1, "2024-01-09 00:00:00", "x"),
            # u3 first appears a week later -> its own cohort
            (3, "2024-01-10 00:00:00", "x"),
        ],
    )
    rows = {
        (r["cohort_week"], r["week_offset"]): r
        for r in cohort_retention(df).collect()
    }
    weeks = sorted({cw for cw, _ in rows})
    c0, c1 = weeks[0], weeks[1]
    assert c1 == c0 + 1
    assert rows[(c0, 0)]["n_users"] == 2
    assert rows[(c0, 0)]["cohort_size"] == 2
    assert rows[(c0, 0)]["retention_u"] == 1_000_000
    assert rows[(c0, 1)]["n_users"] == 1
    assert rows[(c0, 1)]["retention_u"] == 500_000
    assert rows[(c1, 0)]["n_users"] == 1


def _vals(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "value double")


def test_ks_identical_distributions_zero(spark):
    a = _vals(spark, [1, 2, 3, 4])
    r = ks_statistic(a, _vals(spark, [1, 2, 3, 4])).collect()[0]
    assert r["ks_u"] == 0


def test_ks_disjoint_distributions_one(spark):
    r = ks_statistic(_vals(spark, [1, 2]), _vals(spark, [10, 20])).collect()[0]
    assert r["ks_u"] == 1_000_000
    assert r["ks_at_value_m"] == 2000  # gap saturates at A's max


def test_ks_hand_value(spark):
    # A = {1,2,3,4}, B = {3,4,5,6}: max gap at v=2 -> |2/4 - 0/4| = 0.5
    r = ks_statistic(_vals(spark, [1, 2, 3, 4]), _vals(spark, [3, 4, 5, 6])).collect()[0]
    assert r["ks_u"] == 500_000
    assert r["ks_at_value_m"] == 2000
    assert (r["n_a"], r["n_b"]) == (4, 4)


def test_interarrival_dispersion_hand_case(spark):
    from data_pipeline_childcare_spark.operators.funnel import (
        interarrival_dispersion,
    )

    df = spark.createDataFrame(
        [
            # user 1, type a: gaps 10s, 20s
            (1, 1, "2024-01-01 00:00:00", "a"),
            (2, 1, "2024-01-01 00:00:10", "a"),
            (3, 1, "2024-01-01 00:00:30", "a"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) as ts", "event_type")
    r = interarrival_dispersion(df).collect()[0]
    assert r["n_gaps"] == 2
    assert r["mean_gap_s_u"] == 15_000_000
    # population var of [10,20] = 25 -> 25e6; dispersion = 25/225
    assert r["var_gap_s2_u"] == 25_000_000
    assert r["dispersion_u"] == 25 * 1_000_000 // 225


def test_association_rules_hand_case(spark):
    from data_pipeline_childcare_spark.operators.funnel import association_rules

    df = spark.createDataFrame(
        [
            (1, "a"), (1, "b"), (1, "b"),  # duplicate collapses
            (2, "a"), (2, "b"),
            (3, "a"),
            (4, "c"),
        ],
        "user_id long, event_type string",
    )
    rows = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df).collect()
    }
    ab = rows[("a", "b")]
    assert ab["n_both"] == 2 and ab["n_ante"] == 3 and ab["n_baskets"] == 4
    assert ab["support_u"] == 500_000
    assert ab["confidence_u"] == 2 * 1_000_000 // 3
    # lift = (2*4)/(3*2) = 4/3
    assert ab["lift_u"] == 8 * 1_000_000 // 6
    ba = rows[("b", "a")]
    assert ba["confidence_u"] == 1_000_000  # b always with a
    assert ba["lift_u"] == ab["lift_u"]  # lift is symmetric
    assert ("a", "c") not in rows  # never co-occur -> no pair row


def test_loo_target_encoding_hand_case(spark):
    from data_pipeline_childcare_spark.operators.funnel import loo_target_encoding

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 5.0)],
        "id long, cat string, y double",
    )
    rows = {r["id"]: r for r in loo_target_encoding(df, "id", "cat", "y").collect()}
    assert rows[1]["loo_enc_u"] == 25_000_000  # mean(20, 30)
    assert rows[2]["loo_enc_u"] == 20_000_000  # mean(10, 30)
    assert rows[3]["loo_enc_u"] == 15_000_000
    assert rows[4]["loo_enc_u"] is None  # singleton category
    assert rows[4]["n_category"] == 1


def test_rfm_segments_hand_case(spark):
    from data_pipeline_childcare_spark.operators.funnel import rfm_segments

    rows = [
        # 3 customers: clear tertiles on all three axes
        (1, "2024-01-10", 100.0),                       # recent, 1 order, small
        (2, "2024-01-05", 500.0), (2, "2024-01-06", 500.0),   # mid
        (3, "2024-01-01", 900.0), (3, "2024-01-02", 900.0), (3, "2024-01-03", 900.0),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string, o_totalprice double"
    ).selectExpr("o_custkey", "cast(o_orderdate as date) as o_orderdate", "o_totalprice")
    out = {r["o_custkey"]: r for r in rfm_segments(df).collect()}
    # recency: c1=0d (best), c2=4d, c3=7d; freq 1/2/3; monetary 100/1000/2700
    assert out[1]["r_score"] == 3 and out[1]["f_score"] == 1 and out[1]["m_score"] == 1
    assert out[2]["r_score"] == 2 and out[2]["f_score"] == 2 and out[2]["m_score"] == 2
    assert out[3]["r_score"] == 1 and out[3]["f_score"] == 3 and out[3]["m_score"] == 3
    assert out[1]["segment"] == "311" and out[3]["segment"] == "133"


def test_funnel_latency_hand_case(spark):
    from data_pipeline_childcare_spark.operators.funnel import funnel_latency

    df = _ev(
        spark,
        [
            (1, "2024-01-01 00:00:00", "a"),
            (1, "2024-01-01 00:00:10", "b"),  # 10s hop
            (2, "2024-01-01 00:00:00", "a"),
            (2, "2024-01-01 00:01:40", "b"),  # 100s hop
            (3, "2024-01-01 00:00:00", "a"),  # never converts
        ],
    )
    r = funnel_latency(df, ["a", "b"]).collect()[0]
    assert (r["step"], r["from_name"], r["to_name"]) == (2, "a", "b")
    assert r["n_converted"] == 2
    assert r["p50_s"] == 10  # ceil(0.5*2)=1st smallest
    assert r["p90_s"] == 100
    assert r["max_s"] == 100


def test_journey_ngrams_hand_case(spark):
    from data_pipeline_childcare_spark.operators.funnel import journey_ngrams

    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", "a"),
            (2, 1, "2024-01-01 00:01:00", "b"),
            (3, 1, "2024-01-01 00:02:00", "c"),
            (4, 1, "2024-01-01 00:03:00", "a"),
            (5, 2, "2024-01-01 00:00:00", "a"),
            (6, 2, "2024-01-01 00:01:00", "b"),
            (7, 2, "2024-01-01 00:02:00", "c"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) as ts", "event_type")
    rows = {r["path"]: r for r in journey_ngrams(df, n=3, top_k=10).collect()}
    assert rows["a>b>c"]["n_occurrences"] == 2
    assert rows["a>b>c"]["n_users"] == 2
    assert rows["a>b>c"]["rank"] == 1
    assert rows["b>c>a"]["n_occurrences"] == 1  # user 1 only
    assert len(rows) == 2  # no cross-user paths, no partial windows


def test_session_funnel_requires_same_session(spark):
    from data_pipeline_childcare_spark.operators.funnel import session_funnel

    df = spark.createDataFrame(
        [
            # u1: signup and click in ONE session (5 min apart)
            (1, 1, "2024-01-01 00:00:00", "a"),
            (2, 1, "2024-01-01 00:05:00", "b"),
            # u2: signup, then click 2 HOURS later -> different session
            (3, 2, "2024-01-01 00:00:00", "a"),
            (4, 2, "2024-01-01 02:00:00", "b"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) as ts", "event_type")
    rows = {r["step"]: r for r in session_funnel(df, ["a", "b"]).collect()}
    # sessions containing an 'a': u1-s1 and u2-s1 (u2's click opened a
    # NEW session two hours later, which has no 'a')
    assert rows[1]["n_sessions"] == 2
    assert rows[2]["n_sessions"] == 1  # only u1 converts in-session
    assert rows[2]["conv_from_top_u"] == 500_000


def test_session_funnel_zero_step_rows_present(spark):
    from data_pipeline_childcare_spark.operators.funnel import session_funnel

    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "a")],
        "event_id long, user_id long, ts string, event_type string",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) as ts", "event_type")
    rows = {r["step"]: r for r in session_funnel(df, ["a", "b", "c"]).collect()}
    assert len(rows) == 3
    assert rows[2]["n_sessions"] == 0 and rows[3]["n_sessions"] == 0
