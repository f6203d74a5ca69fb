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

Crash safety: each micro-batch writes a NEW versioned snapshot
directory ``target/v{batch_id}`` instead of overwriting in place, so
a crash mid-write can never destroy the previous state — the partial
version has no ``_SUCCESS`` marker and is ignored; a replayed batch
(same batch id, via the stream checkpoint) rebuilds the version in a
``_staging_*`` dir and SWAPS it into place, so even a replay of an
already-complete version never exposes a partially-written v{N} to a
concurrent reader (the previous retained version serves reads during
the instantaneous swap). Readers always see the latest COMPLETE
version; older versions are pruned after a successful write (a
poor-man's Delta/Iceberg commit log, built from parquet's own
success marker). Single WRITER per target by contract (foreachBatch
batches are sequential within a query).

Scale shape: each micro-batch shuffles only (stored keys + batch
keys) once for the latest-wins window; the rewrite is the full
snapshot here (plain parquet has no partition-level replace) — at
100 TB you partition the snapshot by key range and rewrite only
partitions containing batch keys, or point the same ``foreachBatch``
body at a MERGE-capable table format; the merge logic is unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

_KEEP_VERSIONS = 2


def merge_change_log(
    stored: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str = "seq",
) -> DataFrame:
    """Fold ``changes`` into the stored change-state (both carrying
    the op + seq columns): per key, the highest-``seq`` row wins —
    including delete tombstones, which must persist so late lower-seq
    changes cannot resurrect a deleted key. (The op column rides
    along untouched; only ``read_merged`` interprets it.)"""
    combined = stored.unionByName(changes)
    w = Window.partitionBy(key_col).orderBy(F.desc(seq_col))
    return (
        combined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _complete_versions(target: str) -> list[int]:
    """Version ids under ``target`` whose parquet write finished
    (``_SUCCESS`` marker present), ascending. Local-FS directory
    listing — swap for the Hadoop FileSystem API on HDFS/object
    stores (where the same marker convention holds)."""
    if not os.path.isdir(target):
        return []
    out = []
    for name in os.listdir(target):
        if name.startswith("v") and name[1:].isdigit():
            if os.path.exists(os.path.join(target, name, "_SUCCESS")):
                out.append(int(name[1:]))
    return sorted(out)


def _read_state(
    spark: SparkSession, target: str, schema: StructType, before_batch: int
) -> DataFrame:
    """Latest complete snapshot STRICTLY BEFORE ``before_batch`` —
    on a crash-replay of batch N, any (complete or partial) vN from
    the interrupted attempt must not feed into its own re-merge."""
    prior = [v for v in _complete_versions(target) if v < before_batch]
    if not prior:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        os.path.join(target, f"v{prior[-1]}")
    )


def _publish_version(df: DataFrame, target: str, batch_id: int) -> None:
    """Write snapshot ``v{batch_id}`` via stage-then-swap: the frame
    lands in a ``_staging_*`` dir (invisible to ``_complete_versions``
    — only ``v*`` names count), then swaps into place. A crash-REPLAY
    of an already-complete batch would otherwise overwrite v{N} in
    place, emptying it for the whole rewrite while a concurrent
    reader that just resolved v{N} as latest-complete reads a
    partial directory; with the swap, the exposure shrinks to the
    rmtree+rename instant, during which the PREVIOUS retained
    complete version still serves readers (pruning keeps
    ``_KEEP_VERSIONS`` and runs only after the new version is up)."""
    import uuid

    staging = os.path.join(target, f"_staging_v{batch_id}_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(staging)
    final = os.path.join(target, f"v{batch_id}")
    shutil.rmtree(final, ignore_errors=True)
    os.replace(staging, final)


def _prune_versions(target: str) -> None:
    """Drop all but the newest ``_KEEP_VERSIONS`` complete snapshots,
    plus any orphaned staging dirs from crashed attempts. Shared by
    the CDC merge and SCD2 stores (one retention policy — a
    crash-replay of batch N needs v{N-1} to still exist)."""
    done = _complete_versions(target)
    for v in done[:-_KEEP_VERSIONS]:
        shutil.rmtree(os.path.join(target, f"v{v}"), ignore_errors=True)
    if os.path.isdir(target):
        for name in os.listdir(target):
            if name.startswith("_staging_"):
                shutil.rmtree(os.path.join(target, name), ignore_errors=True)


def streaming_merge_to_path(
    changes: DataFrame,
    target: str,
    checkpoint: str,
    key_col: str,
    seq_col: str = "seq",
) -> StreamingQuery:
    """Maintain a latest-wins table under ``target`` from a change
    stream. Runs with an ``availableNow`` trigger — drain everything
    currently available, then stop — the right shape both for tests
    and for the periodic "catch the table up" production cadence;
    the checkpoint makes successive runs resume where the last ended.
    Returns the started query."""
    schema = changes.schema

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        stored = _read_state(spark, target, schema, before_batch=batch_id)
        merged = merge_change_log(stored, batch_df, key_col, seq_col)
        _publish_version(merged, target, batch_id)
        _prune_versions(target)

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_merged(
    spark: SparkSession, target: str, op_col: str = "op", seq_col: str = "seq"
) -> DataFrame:
    """The live view: latest complete snapshot minus tombstones and
    bookkeeping."""
    versions = _complete_versions(target)
    if not versions:
        raise FileNotFoundError(f"no complete merge snapshot under {target}")
    return (
        spark.read.parquet(os.path.join(target, f"v{versions[-1]}"))
        .filter(F.col(op_col) != "D")
        .drop(op_col, seq_col)
    )
