"""Streaming CDC merge: a continuously-maintained latest-wins table.

The streaming twin of ``operators.merge.merge_changes``: a change
stream (rows + ``op`` in {'I','U','D'} + monotonically increasing
``seq``) is applied to a parquet snapshot by a ``foreachBatch`` head
— the same pattern Delta/Iceberg sinks use for MERGE INTO, expressed
against plain parquet so it runs anywhere.

Correctness across batch boundaries: the stored snapshot keeps each
key's ``op`` and ``seq`` (i.e. DELETE TOMBSTONES are retained), so a
change arriving in a later micro-batch with a LOWER seq than what the
table already applied loses, exactly as it would in one big batch.
``read_merged`` serves the live view by filtering tombstones out.

Scale shape: each micro-batch shuffles only (stored keys + batch
keys) once for the latest-wins window; the rewrite is the full
snapshot here (plain parquet has no partition-level replace) — at
100 TB you partition the snapshot by key range and rewrite only
partitions containing batch keys, or point the same ``foreachBatch``
body at a MERGE-capable table format; the merge logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def merge_change_log(
    stored: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Fold ``changes`` into the stored change-state (both carrying
    ``op``+``seq``): per key, the highest-seq row wins — including
    delete tombstones, which must persist so late lower-seq changes
    cannot resurrect a deleted key."""
    combined = stored.unionByName(changes)
    w = Window.partitionBy(key_col).orderBy(F.desc(seq_col))
    return (
        combined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def streaming_merge_to_path(
    changes: DataFrame,
    target: str,
    checkpoint: str,
    key_col: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> StreamingQuery:
    """Maintain a latest-wins table at ``target`` from a change
    stream. Runs with an ``availableNow`` trigger — drain everything
    currently available, then stop — the right shape both for tests
    and for the periodic "catch the table up" production cadence;
    the checkpoint makes successive runs resume where the last ended.
    Returns the started query."""
    schema = changes.schema

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        stored = _read_state(spark, target, schema)
        merged = merge_change_log(stored, batch_df, key_col, op_col, seq_col)
        # cut lineage before overwriting the path we just read
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(target)

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _read_state(
    spark: SparkSession, target: str, schema: StructType
) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(target)
    except AnalysisException as exc:
        # ONLY path-not-found means "first batch, no snapshot yet".
        # Any other failure (corruption, permissions, transient IO)
        # must abort the batch — treating it as empty state would
        # silently reset the table to just this batch's changes.
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return spark.createDataFrame([], schema)
        raise


def read_merged(
    spark: SparkSession, target: str, op_col: str = "op", seq_col: str = "seq"
) -> DataFrame:
    """The live view: stored state minus tombstones and bookkeeping."""
    return (
        spark.read.parquet(target)
        .filter(F.col(op_col) != "D")
        .drop(op_col, seq_col)
    )
