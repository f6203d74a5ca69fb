"""Ranking-evaluation metrics (operators/raneval) against a
hand-computed model and a brute-force python replica."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import data_pipeline_childcare_spark as eng


@pytest.fixture(scope="module")
def spark():
    s = eng.get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _micro_dcg(pairs):  # [(gain, rank)]
    return sum(
        int(math.floor(g * 1_000_000 / math.log2(r + 1) + 0.5)) for g, r in pairs
    )


def test_ranking_eval_hand_case(spark):
    from data_pipeline_childcare_spark.operators.raneval import (
        ranking_eval,
        ranking_eval_summary,
    )

    # q1: gold = {a(2), b(1), z(1)}; run top-10 = a@1, x@2, b@4
    # q2: gold = {m(1)}; run = no gold hit inside k
    # q3: gold = {n(1)}; absent from the run entirely
    run = spark.createDataFrame(
        [
            ("q1", "a", 1), ("q1", "x", 2), ("q1", "y", 3), ("q1", "b", 4),
            ("q2", "u", 1), ("q2", "v", 2),
        ],
        "query_id string, item_id string, rank int",
    )
    gold = spark.createDataFrame(
        [
            ("q1", "a", 2), ("q1", "b", 1), ("q1", "z", 1),
            ("q2", "m", 1),
            ("q3", "n", 1),
        ],
        "query_id string, item_id string, gain int",
    )
    got = {r["query_id"]: r.asDict() for r in ranking_eval(run, gold, k=10).collect()}
    assert set(got) == {"q1", "q2", "q3"}

    q1 = got["q1"]
    assert q1["n_gold"] == 3 and q1["n_retrieved"] == 4 and q1["hits"] == 2
    assert q1["recall_micro"] == 2 * 1_000_000 // 3
    assert q1["precision_micro"] == 2 * 1_000_000 // 10
    assert q1["rr_micro"] == 1_000_000  # first relevant at rank 1
    dcg = _micro_dcg([(2, 1), (1, 4)])
    idcg = _micro_dcg([(2, 1), (1, 2), (1, 3)])  # gold by (gain desc, item)
    assert q1["ndcg_micro"] == dcg * 1_000_000 // idcg

    # no relevant retrieved → all zeros but the gold mass is reported
    for q in ("q2", "q3"):
        row = got[q]
        assert row["n_gold"] == 1 and row["hits"] == 0
        assert row["recall_micro"] == 0 and row["rr_micro"] == 0
        assert row["ndcg_micro"] == 0
    assert got["q3"]["n_retrieved"] == 0

    s = ranking_eval_summary(ranking_eval(run, gold, k=10)).collect()[0]
    assert s["n_queries"] == 3
    assert s["mrr_micro"] == (1_000_000 + 0 + 0) // 3
    assert s["mean_recall_micro"] == (q1["recall_micro"]) // 3


def test_ranking_eval_matches_bruteforce_and_partitioning(spark):
    """120 items / 6 queries pseudo-random run+gold vs a python
    replica; fixed-point output is partition-invariant."""
    from data_pipeline_childcare_spark.operators.raneval import ranking_eval

    run_rows, gold_rows = [], []
    for i in range(120):
        q = f"q{i % 6}"
        run_rows.append((q, f"d{i}", i // 6 + 1))
        if i % 4 == 0:
            gold_rows.append((q, f"d{i}", 1 + i % 3))
    run = spark.createDataFrame(run_rows, "query_id string, item_id string, rank int")
    gold = spark.createDataFrame(gold_rows, "query_id string, item_id string, gain int")
    k = 7

    # python replica
    from collections import defaultdict

    by_q_run = defaultdict(dict)
    for q, d, r in run_rows:
        if r <= k:
            by_q_run[q][d] = r
    by_q_gold = defaultdict(dict)
    for q, d, g in gold_rows:
        by_q_gold[q][d] = g
    expect = {}
    for q, golds in by_q_gold.items():
        hits = [(d, by_q_run[q][d]) for d in golds if d in by_q_run[q]]
        ideal = sorted(golds.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        idcg = _micro_dcg([(g, i + 1) for i, (_, g) in enumerate(ideal)])
        dcg = _micro_dcg([(golds[d], r) for d, r in hits])
        expect[q] = {
            "n_gold": len(golds),
            "hits": len(hits),
            "recall_micro": len(hits) * 1_000_000 // len(golds),
            "precision_micro": len(hits) * 1_000_000 // k,
            "rr_micro": (1_000_000 // min(r for _, r in hits)) if hits else 0,
            "ndcg_micro": (dcg * 1_000_000 // idcg) if hits else 0,
        }

    def grab(df):
        return {
            r["query_id"]: {
                f: r[f]
                for f in (
                    "n_gold", "hits", "recall_micro", "precision_micro",
                    "rr_micro", "ndcg_micro",
                )
            }
            for r in df.collect()
        }

    got = grab(ranking_eval(run, gold, k=k))
    assert got == expect
    again = grab(ranking_eval(run.repartition(7), gold.repartition(3), k=k))
    assert again == expect
