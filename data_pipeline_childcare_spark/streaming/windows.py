"""Event-time windows + session windows with watermarks.

Streaming analogs of the batch window/session operators. Both
functions accept static OR streaming DataFrames — the expressions are
identical; only the watermark matters in streaming mode (it bounds the
state store and defines late-data drop).

State sizing at scale: tumbling windows keep one row of state per
(key, window); session windows merge on arrival — state is per OPEN
session, so the watermark delay directly caps state size. Keys are
user ids (uniform) ⇒ no skew in the state-store shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    streaming: bool | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time counts per event_type."""
    df = events
    is_streaming = df.isStreaming if streaming is None else streaming
    ts = F.col(ts_col).cast("timestamp")
    df = df.withColumn("_ts", ts)
    if is_streaming:
        df = df.withWatermark("_ts", watermark_delay)
    win = F.window("_ts", window_duration, slide) if slide else F.window("_ts", window_duration)
    return df.groupBy(win.alias("win"), F.col("event_type")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


def windowed_counts_with_late_drop(
    spark,
    batch_a: DataFrame,
    batch_b: DataFrame,
    tmp_dir: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "1 hour",
    name_prefix: str = "late_drop",
) -> DataFrame:
    """Watermark late-data DROP certification — the fifth certified
    stream==batch family: two REAL availableNow runs against one
    checkpoint, append output mode, so the watermark persisted by run
    1 governs run 2's late-row filter exactly as it would across a
    production restart.

    Phase 1 ingests ``batch_a`` (the on-time history): its only data
    micro-batch runs at watermark 0 (nothing dropped), then the
    no-data batch advances the watermark to
    W1 = floor_ms(max event time in A) − delay and EMITS every window
    with end ≤ W1 (append mode finalization). Phase 2 ingests
    ``batch_b`` with W1 restored from the checkpoint: rows whose
    window end ≤ W1 are DROPPED (their state was already finalized
    and evicted — the documented late-data rule: a window is
    maintained only until the watermark passes its end), rows in
    still-open windows aggregate even when their own timestamps lag
    the watermark, and the closing no-data batch emits windows with
    end ≤ W2 = floor_ms(global max event time) − delay.

    The union of the two phase outputs is therefore, exactly:
    every (window, key) aggregate over A ∪ {b ∈ B : window_end(b) >
    W1} restricted to window_end ≤ W2 — one batch-SQL predicate pair,
    which is what the DuckDB twin replays (watermarks are
    millisecond-floored: Spark's EventTimeStats tracks max event time
    in whole milliseconds). Emitted windows of the two phases are
    disjoint (end ≤ W1 vs W1 < end ≤ W2), so the union never
    double-counts.

    Sink choice: both phases write through ONE parquet FILE SINK
    (same output dir, same checkpoint) — the memory sink cannot
    recover from a checkpoint in append mode (AnalysisException at
    restart), but the file sink is fault-tolerant by design: phase 2
    resumes from phase 1's offsets/state/watermark and appends its
    finalized windows into the same `_spark_metadata` transaction
    log (which, like the checkpoint, must be continuous from batch
    0 — per-phase dirs would break its read path). The emitted
    window sets are disjoint by the frontier argument above, so the
    single dir IS the union the function returns.

    Scale shape: identical to ``windowed_event_counts`` — state is
    one row per open (window, event_type); the watermark bounds state
    and late-row retention identically at any corpus size. The
    two-phase file-arrival harness costs two extra file listings and
    exists only to pin the drop semantics hermetically.
    """
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    in_dir = os.path.join(tmp_dir, "in")
    ckpt = os.path.join(tmp_dir, "ckpt")
    os.makedirs(in_dir, exist_ok=True)

    def land(df: DataFrame, fname: str) -> None:
        stage = os.path.join(tmp_dir, f"stage_{fname}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            p for p in os.listdir(stage) if p.endswith(".parquet") and p.startswith("part-")
        )
        shutil.move(os.path.join(stage, part), os.path.join(in_dir, fname))
        shutil.rmtree(stage)

    out_dir = os.path.join(tmp_dir, "out")

    def run_phase(qname: str, schema) -> None:
        for q in spark.streams.active:
            if q.name == qname:
                q.stop()
        ev = spark.readStream.schema(schema).parquet(in_dir)
        counted = windowed_event_counts(
            ev, window_duration, watermark_delay=watermark_delay
        )
        query = (
            counted.writeStream.format("parquet")
            .queryName(qname)
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()

    land(batch_a, "a.parquet")
    schema = spark.read.parquet(in_dir).schema
    run_phase(f"{name_prefix}_phase1", schema)
    land(batch_b, "b.parquet")
    run_phase(f"{name_prefix}_phase2", schema)

    # explicit read schema: a run that finalizes zero windows leaves
    # only `_spark_metadata` in the dir — schema inference would fail
    out_schema = windowed_event_counts(
        spark.read.schema(schema).parquet(in_dir),
        window_duration,
        watermark_delay=watermark_delay,
        streaming=False,
    ).schema
    return spark.read.schema(out_schema).parquet(out_dir)


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    streaming: bool | None = None,
) -> DataFrame:
    """Session windows (gap-merged) per user — the streaming twin of
    ``operators.sessions.sessionize`` (same gap semantics, state-store
    merged instead of window-ranked)."""
    df = events
    is_streaming = df.isStreaming if streaming is None else streaming
    df = df.withColumn("_ts", F.col(ts_col).cast("timestamp"))
    if is_streaming:
        df = df.withWatermark("_ts", watermark_delay)
    return df.groupBy(
        F.session_window(F.col("_ts"), gap).alias("sw"), F.col(user_col)
    ).agg(F.count("*").alias("n_events")).select(
        F.col(user_col),
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
    )
