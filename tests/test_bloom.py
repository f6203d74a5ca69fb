"""Bloom-filter join pruning: no false negatives (the semantic
guarantee), measured false-positive pruning power, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

import data_pipeline_childcare_spark as eng
from data_pipeline_childcare_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
    bloom_semi_join,
)

SF = "/root/testdata/sf0.001"


def test_bloom_prefilter_never_drops_a_match(spark):
    orders = eng.load_table(spark, "orders", SF)
    cust = eng.load_table(spark, "customer", SF)
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bitmap = bloom_build(building, "c_custkey")
    pruned_keys = {
        r["o_custkey"]
        for r in bloom_prefilter(orders, "o_custkey", bitmap)
        .select("o_custkey")
        .distinct()
        .collect()
    }
    true_keys = {r["c_custkey"] for r in building.collect()}
    order_keys = {r["o_custkey"] for r in orders.select("o_custkey").distinct().collect()}
    # every true match survives the prefilter
    assert (true_keys & order_keys) <= pruned_keys


def test_bloom_semi_join_equals_plain_semi_join(spark):
    orders = eng.load_table(spark, "orders", SF)
    cust = eng.load_table(spark, "customer", SF)
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    via_bloom = sorted(
        r["o_orderkey"]
        for r in bloom_semi_join(orders, "o_custkey", building, "c_custkey")
        .select("o_orderkey")
        .collect()
    )
    plain = sorted(
        r["o_orderkey"]
        for r in orders.join(
            building, orders["o_custkey"] == building["c_custkey"], "left_semi"
        )
        .select("o_orderkey")
        .collect()
    )
    assert via_bloom == plain


def test_bloom_prunes_most_non_matches(spark):
    """With m=8192 bits and a small key set, the false-positive rate
    is well under the theoretical (1 - e^(-kn/m))^k bound's ~1% —
    check the prefilter actually removes the bulk of non-matching
    rows (this is the 100 TB shuffle saving)."""
    orders = eng.load_table(spark, "orders", SF)
    cust = eng.load_table(spark, "customer", SF)
    few = cust.filter(F.col("c_custkey") % 37 == 0).select("c_custkey")
    bitmap = bloom_build(few, "c_custkey")
    kept = bloom_prefilter(orders, "o_custkey", bitmap).count()
    matches = orders.join(
        few, orders["o_custkey"] == few["c_custkey"], "left_semi"
    ).count()
    total = orders.count()
    false_pos = kept - matches
    assert false_pos >= 0
    # prefilter keeps matches + a small fraction of the rest
    assert false_pos <= 0.02 * (total - matches), (kept, matches, total)


def test_bloom_bitmap_deterministic(spark):
    cust = eng.load_table(spark, "customer", SF)
    keys = cust.select("c_custkey")
    a = bloom_build(keys, "c_custkey").collect()[0]["_bloom"]
    b = bloom_build(keys, "c_custkey").collect()[0]["_bloom"]
    assert dict(a) == dict(b)


def test_bloom_build_ignores_null_keys(spark):
    """NULL keys can never match an equi-join, so the build side drops
    them — previously explode produced a NULL word and
    map_from_entries aborted the job with NULL_MAP_KEY."""
    build = spark.createDataFrame(
        [(1,), (None,), (7,), (None,)], "k long"
    )
    probe = spark.createDataFrame([(1,), (2,), (None,), (7,)], "p long")
    via_bloom = sorted(
        r["p"] for r in bloom_semi_join(probe, "p", build, "k").collect()
    )
    plain = sorted(
        r["p"]
        for r in probe.join(
            build, probe["p"] == build["k"], "left_semi"
        ).collect()
    )
    assert via_bloom == plain == [1, 7]
