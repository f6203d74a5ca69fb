"""Search-query planning (SURVEY.md §3.1) as column expressions.

Re-expresses the reference's query assembly (多数据源获取链接.py):
  - query templating `"{school}" AND "{major}" site:edu.cn`
    (:488-500, 522-558) → format_string over a crossJoin;
  - filtered-query building (:561-640): regional site patterns,
    exclude/include site lists — MUTUALLY EXCLUSIVE modes, matching
    the reference's if/elif structure — plus `after:`/`before:` time
    suffixes for web-class search types;
  - distinct query-set generation (A10, retrieve.py:1538-1559).

Everything is a narrow projection over a (usually tiny) query dim —
the crossJoin fan-out IS the parallelism plan for the connector stage.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class SearchStrategy:
    """Per-search-type assembly config (SEARCH_STRATEGY_CONFIG shape)."""

    search_type: str = "web"
    includes: list[str] = field(default_factory=list)   # "site:gov.cn" …
    excludes: list[str] = field(default_factory=list)   # "-site:zhihu.com" …
    regional_patterns: list[str] = field(default_factory=list)  # "site:{scope}.gov.cn"
    supports_time: bool = True


def build_filtered_query(
    query_col: Column,
    strategy: SearchStrategy,
    regional_scope_domain: str | None = None,
    after: dt.date | None = None,
    before: dt.date | None = None,
) -> Column:
    """original query → final provider query string.

    Mode precedence is the reference's mutually exclusive chain:
    regional patterns ⊃ excludes ⊃ includes; time suffix composes on
    top for time-capable search types.
    """
    q = query_col
    if regional_scope_domain and strategy.regional_patterns:
        sites = " OR ".join(
            p.format(scope=regional_scope_domain) for p in strategy.regional_patterns
        )
        q = F.format_string("%s (%s)", q, F.lit(sites))
    elif strategy.excludes:
        q = F.format_string("%s %s", q, F.lit(" ".join(strategy.excludes)))
    elif strategy.includes:
        q = F.format_string("%s (%s)", q, F.lit(" OR ".join(strategy.includes)))
    if strategy.supports_time and after:
        q = F.format_string("%s after:%s", q, F.lit(after.isoformat()))
    if strategy.supports_time and before:
        q = F.format_string("%s before:%s", q, F.lit(before.isoformat()))
    return q


def school_major_queries(schools: DataFrame, majors: DataFrame) -> DataFrame:
    """`"{school}" AND "{major}" site:edu.cn` template fan-out
    (多数据源获取链接.py:488-500): crossJoin of two small dims."""
    return schools.crossJoin(majors).select(
        F.format_string('"%s" AND "%s" site:edu.cn', F.col("school"), F.col("major")).alias(
            "query"
        )
    )


def build_search_queries(
    local_queries: DataFrame,
    rule_strings: DataFrame,
    query_col: str = "query",
    rule_col: str = "rule_string",
) -> DataFrame:
    """Distinct (rule × local-query) combinations (A10,
    retrieve.py:1538-1559): crossJoin + concat + distinct."""
    combined = local_queries.crossJoin(rule_strings).select(
        F.trim(F.concat_ws(" ", F.col(rule_col), F.col(query_col))).alias("query")
    )
    bare_rules = rule_strings.select(F.col(rule_col).alias("query"))
    return combined.unionByName(bare_rules).distinct()


def assign_providers(
    tasks: DataFrame, providers: list[str], order_col: str = "query"
) -> DataFrame:
    """Deterministic round-robin provider assignment (the reference
    cycles an iterator, 多数据源获取链接.py:1218-1223): row_number over
    a stable order, modulo the provider list.

    The window is intentionally global: ``tasks`` is a plan-sized
    task list (tens of rows by contract), and round-robin NEEDS one
    total order. partitionBy(lit(0)) makes the single-partition
    intent explicit and silences WindowExec's "No Partition Defined"
    warning in real-scale logs."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(0)).orderBy(order_col)
    idx = F.row_number().over(w) - 1
    prov = F.element_at(
        F.array(*[F.lit(p) for p in providers]), (idx % len(providers) + 1).cast("int")
    )
    return tasks.withColumn("provider", prov)
