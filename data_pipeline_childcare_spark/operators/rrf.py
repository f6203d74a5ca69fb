"""Reciprocal Rank Fusion as a plain aggregation.

Reference semantics (retrieve.py:154-181): over N ranked lists,
``score[item] += 1 / (k + rank)`` with k=60, rank starting at 1; emit
items sorted by fused score descending; the first-seen payload wins.

Spark-first restatement: the ranked lists are rows
``(list_id, item_id, rank, payload…)``; RRF is
``groupBy(item_id).agg(sum(1/(k+rank)))`` — fully map-side combinable,
one shuffle on item_id, no state. At 100 TB this is the cheapest
possible shape: partial aggregation collapses each partition's
contribution before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60


def rrf_fuse(
    ranked: DataFrame,
    item_col: str = "item_id",
    rank_col: str = "rank",
    list_col: str = "list_id",
    k: int = RRF_K,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Fuse ranked lists into one RRF-scored ranking.

    ``ranked`` holds one row per (list, item) with a 1-based rank.
    Returns (item_id, rrf_score, n_lists [, payload…]) sorted by score
    desc with item_id as deterministic tie-break. Payload columns take
    the value from the list where the item ranked best ("first seen" in
    reference iteration order ≈ best-ranked here, made deterministic).
    """
    aggs = [
        F.sum(1.0 / (F.lit(k) + F.col(rank_col))).alias("rrf_score"),
        F.count_distinct(F.col(list_col)).alias("n_lists"),
    ]
    if payload_cols:
        best = F.min_by(F.struct(*payload_cols), F.col(rank_col))
        fused = (
            ranked.groupBy(item_col)
            .agg(*aggs, best.alias("_payload"))
            .select(item_col, "rrf_score", "n_lists", "_payload.*")
        )
    else:
        fused = ranked.groupBy(item_col).agg(*aggs)
    return fused.orderBy(F.desc("rrf_score"), F.col(item_col))


def attach_rerank_scores(
    candidates: DataFrame,
    scores: DataFrame,
    order_col: str = "rrf_score",
    index_col: str = "index",
    score_col: str = "relevance_score",
) -> DataFrame:
    """Positional rerank backfill (SURVEY §2.3 J4): an external
    reranker returns (index, relevance_score) pairs positional to the
    candidate order; re-derive the position with a row_number over the
    same ordering and join on it.

    The window is intentionally global: the candidate frame is
    rerank-cap bounded by contract (≤ ~100 rows — the reranker itself
    saw the whole list in one call). The constant partitionBy(lit(0))
    makes that single-partition intent explicit and keeps real-scale
    logs free of WindowExec's "No Partition Defined" warning."""
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc(order_col))
    indexed = candidates.withColumn(index_col, F.row_number().over(w) - 1)
    return indexed.join(
        F.broadcast(scores.select(index_col, score_col)), index_col, "left"
    ).drop(index_col)


def rank_lists(
    df: DataFrame, list_col: str, score_col: str, item_col: str
) -> DataFrame:
    """Turn per-list scores into 1-based ranks (ties broken by item id),
    the input shape ``rrf_fuse`` expects."""
    w = Window.partitionBy(list_col).orderBy(F.desc(score_col), F.col(item_col))
    return df.withColumn("rank", F.row_number().over(w))
