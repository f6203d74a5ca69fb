"""Physical-plan contracts: the plan shapes PLANS.md documents are
asserted here so a refactor that silently degrades a plan (broadcast
→ sort-merge, agg → Expand, a stray cartesian) fails CI instead of
surfacing as a 100 TB incident.

Checks run on the executed plan string at sf0.001 with the engine's
default session — small data, but join strategy / Expand / cartesian
choices are structural, not data-dependent, once stats are known.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

# query -> (max hashpartitioning exchanges, forbid SortMergeJoin,
# forbid Expand). The exchange budget excludes the presentation
# ORDER BY (rangepartitioning) and one-row SinglePartition exchanges.
CONTRACTS = {
    "q5_nation_revenue": (1, True, True),
    "min_cost_part_suppliers": (2, True, True),
    "order_priority_late_counts": (1, True, True),
    "supplier_variety_by_part": (2, True, True),
    "bulk_suppliers_for_parts": (1, True, True),
    "suppliers_kept_waiting": (3, True, True),
    "hll_distinct_users_by_type": (2, True, True),
    "bloom_filtered_building_revenue": (2, True, True),
    "events_value_quantile_sketch": (3, True, True),
    "salted_supplier_quantity": (2, True, True),
    "user_event_transitions": (2, True, True),
}


@pytest.mark.parametrize("name", sorted(CONTRACTS))
def test_plan_contract(spark, name):
    max_hash_ex, no_smj, no_expand = CONTRACTS[name]
    df = entry_mod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if no_smj:
        assert "SortMergeJoin" not in plan, name
    if no_expand:
        assert not re.search(r"\bExpand\b", plan), name
    hash_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert hash_ex <= max_hash_ex, (name, hash_ex, max_hash_ex)


def test_no_driver_actions_while_building_plans(spark):
    """Building every contract query's plan runs ZERO Spark jobs — a
    hidden .collect()/.count() inside a query builder would register
    a job in the tracked group and fail here."""
    sc = spark.sparkContext
    group = "plan-build-audit"
    sc.setJobGroup(group, "plan construction must not execute")
    try:
        qs = entry_mod.queries()
        for name in CONTRACTS:
            df = qs[name](spark, SF)
            assert df.columns  # force analysis (not execution)
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        sc.setJobGroup("", "")
    assert jobs == [], f"plan construction ran Spark jobs: {jobs}"


def test_partition_pruning_on_partitioned_sink(spark, tmp_path):
    """write_partitioned → filtered read hits PartitionFilters, not a
    full scan: the §2.1 per-key sink actually prunes at read time —
    the property that makes per-province/year layouts pay off at
    100 TB."""
    import data_pipeline_childcare_spark as eng
    from data_pipeline_childcare_spark.io import write_partitioned

    ev = eng.load_table(spark, "events", SF)
    path = str(tmp_path / "by_type")
    write_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path).filter("event_type = 'click'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1][:120]
    # pruning is real: only the click partition's rows are read
    clicks = ev.filter("event_type = 'click'").count()
    assert back.count() == clicks
