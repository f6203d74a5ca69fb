"""Corpus keyword extraction — TextRank over a token co-occurrence graph.

TextRank (Mihalcea & Tarau 2004, "TextRank: Bringing Order into
Texts") ranks words by running PageRank over a graph whose vertices
are tokens and whose edges connect tokens co-occurring within a small
sliding window. It is the standard unsupervised keyword extractor for
corpus summarization and curation dashboards — the reference pipeline
surfaces per-industry keyword summaries in its report generator
(生成行业调研报告.py keyword sections); this operator is the
corpus-scale generalization of that signal.

Scale design — everything is linear in corpus size, then
vocabulary-sized:

- Window pairs are built PER ROW with ``zip_with`` over shifted array
  slices of the token array — pure whole-stage-codegen expressions,
  no positional explode + self-join (which would shuffle |tokens|
  rows per doc and re-join them on position). A doc with t tokens
  emits ≤ t·window pairs, flat-mapped in place.
- One hash aggregate collapses pairs to (token_a, token_b, weight):
  the ONLY corpus-sized shuffle. Everything downstream (the rank
  iterations) operates on the vocabulary co-occurrence graph, which
  is sub-linear in corpus size (vocab saturates; weights grow).
- The rank loop is :func:`~data_pipeline_childcare_spark.operators.
  graph.weighted_pagerank`: integer fixed-point with per-source
  weight fractions pre-quantized to 1e-6 — bit-exact under any
  partitioning/engine, unbounded-weight-safe (stop-token edge weights
  at 100 TB exceed any per-node rank).
- Top-k is TakeOrdered (orderBy + limit on (rank desc, token)), never
  a full global sort of the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.text import tokenize
from data_pipeline_childcare_spark.operators.graph import weighted_pagerank

__all__ = ["cooccurrence_edges", "textrank_keywords"]


def cooccurrence_edges(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
) -> DataFrame:
    """Undirected token co-occurrence graph → (token_a, token_b,
    weight) with token_a < token_b, weight = number of (doc, position)
    co-occurrences at distance 1..window across the corpus.

    Pair construction is per-row array algebra: for each offset j the
    token array is zipped with its own j-shifted slice, so a position
    pair (i, i+j) becomes one struct — no positional self-join. Equal
    tokens (a word next to itself) carry no graph information and are
    dropped, matching the TextRank formulation.
    """
    toks = tokenize(F.col(text_col))
    pairs = F.expr(
        f"""
        flatten(transform(sequence(1, {int(window)}), j ->
            if(size(_tr_toks) > j,
               zip_with(slice(_tr_toks, 1, size(_tr_toks) - j),
                        slice(_tr_toks, j + 1, size(_tr_toks) - j),
                        (a, b) -> named_struct('a', a, 'b', b)),
               array())))
        """
    )
    return (
        docs.select(toks.alias("_tr_toks"))
        .select(F.explode(pairs).alias("p"))
        .filter(F.col("p.a") != F.col("p.b"))
        .select(
            F.least("p.a", "p.b").alias("token_a"),
            F.greatest("p.a", "p.b").alias("token_b"),
        )
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
    n_iter: int = 5,
    top_k: int = 20,
    damping_pct: int = 85,
) -> DataFrame:
    """Top-``top_k`` corpus keywords by TextRank score.

    Composition: :func:`cooccurrence_edges` → symmetrize →
    :func:`weighted_pagerank` → deterministic top-k (rank desc, token
    asc — a TakeOrdered, not a vocabulary-wide sort).

    Returns (token, wdeg, rank_scaled, rank): ``wdeg`` is the node's
    total incident co-occurrence weight, ``rank_scaled`` the BIGINT
    fixed-point TextRank mass (sums to ~1e12 across the vocabulary),
    ``rank`` the 1-based position.
    """
    und = cooccurrence_edges(docs, text_col=text_col, window=window)
    directed = und.select(
        F.col("token_a").alias("src"),
        F.col("token_b").alias("dst"),
        "weight",
    ).unionByName(
        und.select(
            F.col("token_b").alias("src"),
            F.col("token_a").alias("dst"),
            "weight",
        )
    )
    ranked = weighted_pagerank(
        directed, n_iter=n_iter, damping_pct=damping_pct
    )
    top = (
        ranked.orderBy(F.desc("rank_scaled"), F.col("id"))
        .limit(int(top_k))
        .select(F.col("id").alias("token"), "wdeg", "rank_scaled")
    )
    # Unpartitioned Window on a frame BOUNDED BY CONSTRUCTION: the
    # preceding .limit(top_k) caps the input at top_k (≤ tens) rows,
    # so the single-partition WindowExec (and its log warning) is
    # intentional — same discipline as the skew-profile rollups.
    # Pinned by test_textrank_global_window_input_bounded.
    w = Window.orderBy(F.desc("rank_scaled"), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
