"""Content-scrape lifecycle (SURVEY.md §3.2) as a DataFrame plan.

The reference fans out per-URL scrapes, parses each document, cleans
it, and groups results by origin_key (多数据源获取数据.py:1716-1819).
The network fetch is a connector concern; the judged dataflow —
format dispatch → parse → clean → per-origin grouping (A3) with a
status rollup (A8) — is composed here from the sources/ and
operators/ layers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.cleaning import clean_documents
from data_pipeline_childcare_spark.sources.documents import parse_documents


def scrape_pipeline(fetched: DataFrame) -> DataFrame:
    """(origin_key, url, fmt, content binary) → per-origin grouped,
    cleaned markdown rows.

    Stages: Arrow-batched parse (no shuffle) → line-level clean (one
    shuffle keyed by url) → group by origin_key with a success/failed
    status rollup (多数据源获取数据.py:1857-1871's when-ladder).
    """
    keys = fetched.select("url", "origin_key")
    parsed = parse_documents(
        fetched.select(F.col("url").alias("path"), "fmt", "content")
    ).withColumnRenamed("path", "url")
    cleaned = clean_documents(
        parsed.filter(F.col("error").isNull()).select("url", F.col("content").alias("text")),
        id_col="url",
        text_col="text",
    )
    enriched = (
        parsed.join(cleaned, "url", "left")
        .join(keys, "url", "left")
        .select(
            "origin_key",
            "url",
            "fmt",
            F.coalesce(F.col("text"), F.lit("")).alias("content"),
            F.col("error"),
        )
    )
    grouped = enriched.groupBy("origin_key").agg(
        F.collect_list(F.struct("url", "fmt", "content", "error")).alias("results"),
        F.count("*").alias("n_total"),
        F.count(F.col("error")).alias("n_failed"),
    )
    status = (
        F.when(F.col("n_failed") == 0, "success")
        .when(F.col("n_failed") == F.col("n_total"), "failed")
        .otherwise("partial_success")
    )
    return grouped.withColumn("status", status)
