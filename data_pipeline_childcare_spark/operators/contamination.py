"""Benchmark decontamination check (beyond-reference, training ops).

Before training, corpora are screened for overlap with evaluation
benchmarks: a document whose n-grams substantially appear in a
benchmark is contaminated and must be dropped. The standard check
(GPT-3 appendix C, PaLM, Llama): fraction of the document's distinct
n-gram shingles that occur anywhere in the benchmark set.

Shape (the only one that scales): explode both sides to distinct
shingles, reduce the benchmark side to a DISTINCT shingle set (small:
benchmarks are thousands of documents, corpora are billions), inner
join corpus shingles against it — broadcast when the benchmark fits,
shuffle on the uniform shingle key otherwise — and count matches per
document. Never a doc×doc comparison.

``contamination`` is an unrounded int/int double division — the same
two integers divide to the same IEEE double in every engine, so the
check is oracle-exact without rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.text import word_ngrams
from data_pipeline_childcare_spark.io import spread_partitions


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    shingle_n: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, set_size, matched, contamination) per corpus document."""
    doc_shingles = spread_partitions(docs, id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), shingle_n))).alias("_s"),
    )
    bench_set = (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams(F.col(bench_text_col), shingle_n))).alias("_s")
        )
        .distinct()
    )
    if broadcast_benchmark:
        bench_set = F.broadcast(bench_set)
    matched = (
        doc_shingles.join(bench_set, "_s")
        .groupBy(id_col)
        .agg(F.count("*").alias("matched"))
    )
    sizes = doc_shingles.groupBy(id_col).agg(F.count("*").alias("set_size"))
    return (
        sizes.join(matched, id_col, "left")
        .select(
            id_col,
            "set_size",
            F.coalesce(F.col("matched"), F.lit(0).cast("long")).alias("matched"),
            (
                F.coalesce(F.col("matched"), F.lit(0).cast("long")) / F.col("set_size")
            ).alias("contamination"),
        )
    )
