"""Corpus-level TF-IDF — the classic relevance weight, engine-native.

Shapes (all hash aggregates / joins on uniform keys):

- term frequencies: one groupBy (doc, token) over the exploded
  tokens — map-side combinable;
- document frequencies: one groupBy (token) over the SAME distinct
  (doc, token) rows — no re-tokenization;
- doc lengths: re-aggregated from the tf rows (sum of counts), again
  avoiding a second pass over text;
- the corpus size N is a single count() reduced to a literal — the
  one driver-side scalar, standard for global normalizers.

idf = ln((N + 1) / (df + 1)) + 1 (smoothed, strictly positive).
Scores are rounded BEFORE ranking so the (score, token) order —
and therefore the top-k cut — is identical in any engine.

At 100 TB: vocabulary skew (stopwords appear in every doc) affects
only the (token)-keyed df aggregate, which is map-side combined to
one row per token per task before the exchange; no all-pairs
structure anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.text import tokenize
from data_pipeline_childcare_spark.io import spread_partitions


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    (id, tok, tfidf, rank)."""
    n_docs = docs.count()
    tf = (
        spread_partitions(docs, id_col)
        .select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("_c"))
    )
    doc_len = tf.groupBy(id_col).agg(F.sum("_c").alias("_n_toks"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("_df"))
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("_df") + 1.0)) + 1.0
    scored = (
        tf.join(doc_len, id_col)
        .join(dfreq, "tok")
        .select(
            id_col,
            "tok",
            F.round((F.col("_c") / F.col("_n_toks")) * idf, ndigits).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
