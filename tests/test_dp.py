"""DP release mechanism: inverse-CDF table invariants, the seeded
draw replicated in pure Python, suppression and clipping."""

import hashlib
import math

import pytest

from data_pipeline_childcare_spark.operators.dp import (
    MICRO,
    dp_noisy_counts,
    dp_noisy_sum,
    two_sided_geometric_table,
)


def _py_draw(salt: str, key: str) -> int:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15]
    return int(h, 16) % MICRO


def _py_noise(u: int, epsilon: float) -> int:
    for thr, z in two_sided_geometric_table(epsilon):
        if u < thr:
            return z
    return two_sided_geometric_table(epsilon)[-1][1]


def test_table_invariants():
    t = two_sided_geometric_table(1.0)
    thrs = [thr for thr, _ in t]
    assert thrs == sorted(thrs)
    assert t[-1][0] == MICRO
    zs = [z for _, z in t]
    assert zs == list(range(zs[0], zs[-1] + 1))
    # symmetric support, mode at 0 (widest threshold gap)
    gaps = [thrs[0]] + [b - a for a, b in zip(thrs, thrs[1:])]
    assert zs[gaps.index(max(gaps))] == 0


def test_table_epsilon_validation():
    with pytest.raises(ValueError):
        two_sided_geometric_table(0.0)


def test_noisy_counts_match_python_model(spark):
    df = spark.createDataFrame(
        [("a",)] * 100 + [("b",)] * 40, "event_type string"
    )
    rows = {
        r["event_type"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["event_type"], epsilon=1.0).collect()
    }
    for k, n in (("a", 100), ("b", 40)):
        assert rows[k] == n + _py_noise(_py_draw("dp-release-1", k), 1.0)


def test_suppression_drops_small_groups(spark):
    df = spark.createDataFrame(
        [("big",)] * 500 + [("tiny",)], "event_type string"
    )
    # noise is bounded by the table's clamp (|z| <= 14 at eps=1), so
    # 1 + z can never reach 100 and 500 + z can never fall below it
    out = dp_noisy_counts(df, ["event_type"], epsilon=1.0, suppress_below=100)
    assert [r["event_type"] for r in out.collect()] == ["big"]


def test_noisy_sum_clips_contributions(spark):
    df = spark.createDataFrame(
        [("a", 1000.0), ("a", 3.4), ("a", -5.0)], "g string, value double"
    )
    r = dp_noisy_sum(df, ["g"], "value", clip=10, epsilon=10.0).collect()[0]
    # clipped contributions: 10 + 3 + 0 = 13
    expected = 13 + _py_noise(_py_draw("dp-release-1:sum", "a"), 1.0)
    assert r["noisy_sum"] == expected
    assert r["clip_bound"] == 10
    assert r["epsilon_u"] == 10_000_000


def test_noisy_sum_clip_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, value double")
    with pytest.raises(ValueError):
        dp_noisy_sum(df, ["g"], "value", clip=0)
