"""Incremental corpus ingest (Auto-Loader pattern).

Batch scrapers in the reference dump page files per run
(moe_majors_scraper.py:175-180); the streaming analog watches the dump
directory and processes only NEW files — ``spark.readStream`` file
source tracks progress in the checkpoint, so history is never
re-scanned. Delivery to ``batch_fn`` is AT-LEAST-ONCE: a crash after
``batch_fn`` returns but before the checkpoint commits replays the
same batch with the SAME batch_id — exactly-once OUTPUT therefore
requires an idempotent sink keyed on batch_id (the pattern this
package's CDC merge/SCD2 stores implement: versioned snapshot dirs
named by batch id, so a replay rebuilds the same version instead of
appending twice).

foreachBatch reuses the BATCH cleaning pipeline verbatim — one code
path for both modes; each micro-batch is a normal DataFrame so every
operator (kv parse, rule filter, dedup) composes unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from data_pipeline_childcare_spark.sources.record_blocks import RECORD_SEP


def stream_record_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of ``read_record_blocks``: one row per `^_^`
    record block, incrementally over new files in ``path``."""
    df = (
        spark.readStream.option("lineSep", RECORD_SEP)
        .option("maxFilesPerTrigger", 64)  # bounded micro-batches
        .text(path)
    )
    return df.select(F.trim(F.col("value")).alias("block")).filter(F.col("block") != "")


def incremental_ingest(
    stream: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Drive a stream through a batch-pipeline function.

    ``available_now=True`` processes the backlog then stops — the
    batch-job-with-streaming-bookkeeping mode that replaces manual
    "which files did I already scrape" state in the reference.
    """
    writer = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
