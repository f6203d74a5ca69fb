"""Ranking-evaluation metrics — recall@k / precision@k / MRR / nDCG@k
over a ranked run vs graded gold labels.

Every retrieval stage in this engine (BM25, cosine top-k, hybrid RRF,
the X-Pilot rerank ladder; reference retrieve.py's hosted search) ships
results whose QUALITY someone eventually has to measure against
labeled relevance — this operator is that measurement, the
trec_eval-shaped reduction done Spark-side:

- input ``run``: one row per (query, item) with a 1-based ``rank``
  (use :func:`operators.rrf.rank_lists` to turn scores into ranks);
- input ``gold``: one row per (query, item, gain) with integer
  ``gain`` ≥ 0 (binary relevance = gain 1);
- output: one row per query — (query, n_gold, n_retrieved@k, hits@k,
  recall_micro, precision_micro, rr_micro, ndcg_micro) — plus
  :func:`ranking_eval_summary` for the corpus-level mean row.

Scale shape: ONE broadcast-able join of the rank-capped run against
gold on (query, item) + one query-keyed aggregate for the hit-side
sums + one query-keyed aggregate over gold for the ideal DCG — no
window over the full run, no per-query collect; linear in |run| at
any query count.

Determinism / oracle (the fixed-point discipline): every metric is an
INTEGER micro value. Ratios are exact integer arithmetic
(``hits·1e6 div n``); the DCG discounts need log2, so each gain
term is floored to micros FIRST — ``floor(gain·1e6 / log2(rank+1) +
0.5)`` — and summed as BIGINT, making DCG, ideal DCG and their final
ratio engine-portable (same half-up pin the tokenizer costs use;
DuckDB's log2 and Java's agree to well beyond the 1e-6 quantum on
these small integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _dcg_term(gain, rank) -> F.Column:
    """floor(gain·1e6 / log2(rank+1) + 0.5) — one ranked item's
    discounted gain, pinned to integer micros before summation."""
    return F.floor(
        gain * F.lit(float(MICRO)) / F.log2(rank + F.lit(1.0)) + F.lit(0.5)
    ).cast("long")


def ranking_eval(
    run: DataFrame,
    gold: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
    gain_col: str = "gain",
) -> DataFrame:
    """Per-query metrics at cutoff ``k`` →
    (query, n_gold, n_retrieved, hits, recall_micro, precision_micro,
    rr_micro, ndcg_micro).

    Queries present in ``gold`` but absent from the run (or with no
    retrieved gold item) score zero across the board — the honest
    accounting; queries in the run with NO gold row are dropped
    (nothing to measure against), mirroring trec_eval.
    """
    q, it = F.col(query_col), F.col(item_col)
    capped = run.filter(F.col(rank_col) <= k).select(
        q.alias("query"), it.alias("_item"), F.col(rank_col).alias("_rank")
    )
    g = gold.filter(F.col(gain_col) > 0).select(
        q.alias("query"), it.alias("_item"), F.col(gain_col).cast("long").alias("_gain")
    )
    # per-query gold mass + ideal DCG: gold ranked by (gain DESC, item)
    iw = Window.partitionBy("query").orderBy(F.desc("_gain"), F.col("_item"))
    ideal = (
        g.withColumn("_ir", F.row_number().over(iw))
        .filter(F.col("_ir") <= k)
        .groupBy("query")
        .agg(F.sum(_dcg_term(F.col("_gain"), F.col("_ir"))).alias("_idcg"))
    )
    n_gold = g.groupBy("query").agg(F.count(F.lit(1)).alias("n_gold"))
    n_ret = capped.groupBy("query").agg(F.count(F.lit(1)).alias("n_retrieved"))
    hits = (
        capped.join(g, ["query", "_item"])
        .groupBy("query")
        .agg(
            F.count(F.lit(1)).alias("hits"),
            F.min("_rank").alias("_first_rank"),
            F.sum(_dcg_term(F.col("_gain"), F.col("_rank"))).alias("_dcg"),
        )
    )
    out = (
        n_gold.join(ideal, "query")
        .join(n_ret, "query", "left")
        .join(hits, "query", "left")
        .select(
            F.col("query").alias(query_col),
            "n_gold",
            F.coalesce(F.col("n_retrieved"), F.lit(0)).alias("n_retrieved"),
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            F.expr(f"coalesce(hits, 0) * {MICRO} div n_gold").alias(
                "recall_micro"
            ),
            F.expr(f"coalesce(hits, 0) * {MICRO} div {k}").alias("precision_micro"),
            F.coalesce(
                F.expr(f"{MICRO} div _first_rank"), F.lit(0).cast("long")
            ).alias("rr_micro"),
            F.coalesce(
                F.expr(f"_dcg * {MICRO} div _idcg"), F.lit(0).cast("long")
            ).alias("ndcg_micro"),
        )
    )
    return out


def ranking_eval_summary(per_query: DataFrame, query_col: str = "query_id") -> DataFrame:
    """Corpus roll-up of :func:`ranking_eval` → one row:
    (n_queries, mean_recall_micro, mean_precision_micro, mrr_micro,
    mean_ndcg_micro) — integer micro means (sum div count), the
    floor-mean convention every fixed-point aggregate here uses."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.expr("sum(recall_micro) div count(1)").alias("mean_recall_micro"),
        F.expr("sum(precision_micro) div count(1)").alias("mean_precision_micro"),
        F.expr("sum(rr_micro) div count(1)").alias("mrr_micro"),
        F.expr("sum(ndcg_micro) div count(1)").alias("mean_ndcg_micro"),
    )
