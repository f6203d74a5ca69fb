"""Streaming surface: incremental file ingest (exactly-once over new
files) and event-time/session windows."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from data_pipeline_childcare_spark.streaming import (
    incremental_ingest,
    stream_record_blocks,
    streaming_sessions,
    windowed_event_counts,
)


def test_incremental_ingest_processes_only_new_files(spark, tmp_path):
    src = tmp_path / "dump"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    out: list[tuple[int, int]] = []

    def batch_fn(df, epoch_id):
        out.append((epoch_id, df.count()))

    (src / "page1.txt").write_text("r1：a^_^r2：b", encoding="utf-8")
    q = incremental_ingest(stream_record_blocks(spark, str(src)), batch_fn, str(ckpt))
    q.awaitTermination(60)
    first_total = sum(n for _, n in out)
    assert first_total == 2

    # second run: only the NEW file is processed (checkpoint bookkeeping)
    (src / "page2.txt").write_text("r3：c", encoding="utf-8")
    q2 = incremental_ingest(stream_record_blocks(spark, str(src)), batch_fn, str(ckpt))
    q2.awaitTermination(60)
    assert sum(n for _, n in out) == 3


def _events(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, "click", 1.0),
        (1, t0 + dt.timedelta(minutes=10), "click", 2.0),
        (1, t0 + dt.timedelta(minutes=90), "view", 3.0),
        (2, t0 + dt.timedelta(minutes=5), "click", 4.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")


def test_windowed_event_counts_batch_semantics(spark):
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in windowed_event_counts(_events(spark), "1 hour").collect()
    }
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    assert got[(t0, "click")] == 3
    assert got[(dt.datetime(2024, 1, 1, 11, 0, 0), "view")] == 1


def test_streaming_sessions_gap_merge(spark):
    rows = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in streaming_sessions(_events(spark), gap="30 minutes").collect()
    }
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # user 1: two clicks merge into one session; the +90min view is separate
    assert rows[(1, t0)] == 2
    assert rows[(1, t0 + dt.timedelta(minutes=90))] == 1
    assert rows[(2, t0 + dt.timedelta(minutes=5))] == 1


def test_streaming_window_query_end_to_end(spark, tmp_path):
    """True streaming run: parquet file stream → watermarked windowed
    agg → memory sink, availableNow."""
    src = tmp_path / "ev"
    _events(spark).write.parquet(str(src))
    stream = spark.readStream.schema(_events(spark).schema).parquet(str(src))
    agg = windowed_event_counts(stream, "1 hour", watermark_delay="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_type"]: r["n_events"] for r in spark.sql(
        "SELECT event_type, sum(n_events) AS n_events FROM win_counts GROUP BY event_type"
    ).collect()}
    assert got == {"click": 3, "view": 1}


def test_streaming_dedup_batch_and_stream_agree(spark, tmp_path):
    """Watermarked streaming dedup == batch dropDuplicates when dups
    arrive inside the watermark horizon."""
    from data_pipeline_childcare_spark.streaming import streaming_dedup

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, "click", 1.0),
        (1, t0 + dt.timedelta(minutes=5), "click", 9.0),   # dup key
        (2, t0 + dt.timedelta(minutes=1), "click", 2.0),
        (1, t0 + dt.timedelta(minutes=2), "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in streaming_dedup(df, ["user_id", "event_type"]).collect()
    }
    assert batch_keys == {(1, "click"), (2, "click"), (1, "view")}

    src = tmp_path / "dedup_src"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        streaming_dedup(stream, ["user_id", "event_type"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    stream_keys = {
        (r["user_id"], r["event_type"]) for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    assert stream_keys == batch_keys


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """True stream-stream join (two file streams, watermarks both
    sides) produces exactly the batch interval-join rows."""
    from data_pipeline_childcare_spark.streaming import stream_stream_click_purchase

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    clicks = spark.createDataFrame(
        [(1, t0, "click", 0.0), (2, t0 + dt.timedelta(minutes=3), "click", 0.0)],
        "user_id long, ts timestamp, event_type string, value double",
    )
    purchases = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(minutes=10), "purchase", 42.0),   # in horizon
            (1, t0 + dt.timedelta(minutes=50), "purchase", 99.0),   # outside 30m
            (2, t0 + dt.timedelta(minutes=4), "purchase", 7.0),     # in horizon
            (3, t0 + dt.timedelta(minutes=5), "purchase", 5.0),     # no click
        ],
        "user_id long, ts timestamp, event_type string, value double",
    )
    batch = {
        (r["user_id"], r["purchase_value"])
        for r in stream_stream_click_purchase(clicks, purchases).collect()
    }
    assert batch == {(1, 42.0), (2, 7.0)}

    c_src, p_src = tmp_path / "clicks", tmp_path / "purch"
    clicks.write.parquet(str(c_src))
    purchases.write.parquet(str(p_src))
    c_stream = spark.readStream.schema(clicks.schema).parquet(str(c_src))
    p_stream = spark.readStream.schema(purchases.schema).parquet(str(p_src))
    q = (
        stream_stream_click_purchase(c_stream, p_stream)
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (r["user_id"], r["purchase_value"]) for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    assert stream_rows == batch


def test_streaming_cms_counters_match_batch_sketch(spark, tmp_path):
    """The continuously-maintained CMS equals the batch sketch on the
    same data — fixed depth×width state regardless of stream length."""
    from data_pipeline_childcare_spark.operators.sketches import cms_counters
    from data_pipeline_childcare_spark.streaming import streaming_cms_counters

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (u, t0 + dt.timedelta(minutes=i), "click", float(i))
        for i, u in enumerate([1, 2, 1, 3, 1, 2, 4, 1, 5, 2] * 5)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    batch = sorted(map(tuple, cms_counters(df, "user_id", depth=4, width=64).collect()))

    src = tmp_path / "cms_src"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        streaming_cms_counters(stream, "user_id", depth=4, width=64)
        .writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        map(tuple, spark.sql("SELECT d, bucket, cnt FROM cms_out").collect())
    )
    assert streamed == batch


def test_streaming_hll_registers_match_batch_sketch(spark, tmp_path):
    """The continuously-maintained HLL registers equal the batch
    sketch — so the served estimates are identical too."""
    from data_pipeline_childcare_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from data_pipeline_childcare_spark.streaming import streaming_hll_registers

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (u, t0 + dt.timedelta(minutes=i), "click" if u % 2 else "view", float(i))
        for i, u in enumerate(range(300))
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    batch = sorted(
        map(tuple, hll_registers(df, ("event_type",), "user_id").collect())
    )

    src = tmp_path / "hll_src"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        streaming_hll_registers(stream, ("event_type",), "user_id")
        .writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    streamed_regs = spark.sql("SELECT event_type, _idx, _M FROM hll_out")
    assert sorted(map(tuple, streamed_regs.collect())) == batch
    est_stream = sorted(
        map(tuple, hll_estimate(streamed_regs, ("event_type",)).collect())
    )
    est_batch = sorted(
        map(
            tuple,
            hll_estimate(
                hll_registers(df, ("event_type",), "user_id"), ("event_type",)
            ).collect(),
        )
    )
    assert est_stream == est_batch


def test_streaming_merge_matches_batch_merge(spark, tmp_path):
    """The foreachBatch-maintained table equals merging the whole
    change log in one batch — including cross-batch latest-wins and
    tombstones beating late lower-seq updates."""
    from data_pipeline_childcare_spark.streaming import (
        read_merged,
        streaming_merge_to_path,
    )

    schema = "k long, val string, op string, seq long"
    # batch 1: insert k1..k3; batch 2 (separate file): update k2 with
    # HIGHER seq, delete k3, and a LATE LOWER-seq update of k1 that
    # must lose to batch 1's seq-3 row
    b1 = [(1, "a", "I", 3), (2, "b", "I", 2), (3, "c", "I", 4)]
    b2 = [(2, "b2", "U", 10), (3, None, "D", 11), (1, "stale", "U", 1)]
    src = tmp_path / "chg_src"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    stream = (
        spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*/")
    )
    target = str(tmp_path / "merged")
    q = streaming_merge_to_path(
        stream, target, str(tmp_path / "merge_ckpt"), "k"
    )
    q.awaitTermination(120)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(src / "f2.parquet")
    )
    q2 = streaming_merge_to_path(
        stream, target, str(tmp_path / "merge_ckpt"), "k"
    )
    q2.awaitTermination(120)

    got = sorted(map(tuple, read_merged(spark, target).collect()))
    # expected: k1 keeps "a" (seq 3 beats late seq 1), k2 -> "b2",
    # k3 deleted
    assert got == [(1, "a"), (2, "b2")]


def test_streaming_bloom_words_match_batch(spark, tmp_path):
    """Bloom word-state maintained over a stream equals the batch
    build, so a prefilter served from the streaming sink behaves
    identically (no false negatives)."""
    from data_pipeline_childcare_spark.operators.bloom import bloom_words
    from data_pipeline_childcare_spark.streaming import streaming_bloom_words

    df = spark.createDataFrame([(i * 37,) for i in range(200)], "k long")
    batch = sorted(map(tuple, bloom_words(df, "k").collect()))

    src = tmp_path / "bloom_src"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        streaming_bloom_words(stream, "k")
        .writeStream.format("memory")
        .queryName("bloom_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "bloom_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        map(tuple, spark.sql("SELECT _word, _bits FROM bloom_out").collect())
    )
    assert streamed == batch


def test_streaming_scd2_matches_batch_history(spark, tmp_path):
    """foreachBatch-maintained SCD2 equals the one-shot batch build —
    including a LATER batch carrying an out-of-order backfill dated
    BEFORE intervals the first batch already closed (the case
    interval-patching implementations get wrong)."""
    import datetime

    from pyspark.sql import functions as F

    from data_pipeline_childcare_spark.operators.scd import scd2_history
    from data_pipeline_childcare_spark.streaming.scd2 import (
        read_scd2_history,
        streaming_scd2_to_path,
    )

    def d(day):
        return datetime.datetime(2024, 1, day)

    schema = "k long, status string, ts timestamp, seq long"
    b1 = [(1, "O", d(1), 1), (1, "F", d(5), 2), (2, "P", d(2), 3)]
    # backfill: k1 was 'P' on day 3 — splits the [1,5) 'O' interval
    b2 = [(1, "P", d(3), 4), (3, "O", d(1), 5)]
    src = tmp_path / "obs_src"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*/")
    )
    target = str(tmp_path / "scd2")
    args = (target, str(tmp_path / "scd2_ckpt"), "k", ["status"], "ts", "seq")
    q = streaming_scd2_to_path(stream, *args)
    q.awaitTermination(120)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(src / "f2.parquet")
    )
    q2 = streaming_scd2_to_path(stream, *args)
    q2.awaitTermination(120)

    all_obs = spark.createDataFrame(b1 + b2, schema)
    expect = sorted(
        map(tuple, scd2_history(all_obs, "k", ["status"], "ts", "seq").collect())
    )
    hist_schema = scd2_history(all_obs, "k", ["status"], "ts", "seq").schema
    got = sorted(
        map(tuple, read_scd2_history(spark, target, hist_schema).collect())
    )
    assert got == expect
    # the backfill genuinely split the interval: k1 has 3 versions
    assert sum(1 for r in got if r[0] == 1) == 3


def test_session_window_gap_boundary_semantics(spark):
    """Exactly-gap-apart events MERGE (touching session windows
    coalesce — measured Spark behavior); one microsecond OVER the
    gap breaks. Pins the strictly-greater break rule the
    streaming_sessionize_events oracle encodes."""
    from data_pipeline_childcare_spark.streaming.windows import streaming_sessions

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:30:00.000001"),  # just over the gap -> breaks
            (2, "2024-01-01 00:00:00"),
            (2, "2024-01-01 00:30:00"),  # exactly 30 min -> merges
        ],
        "user_id long, ts string",
    ).selectExpr("user_id", "cast(ts as timestamp) as ts")
    rows = streaming_sessions(df, gap="30 minutes", streaming=False).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 2
    assert len(per_user[2]) == 1
    assert per_user[2][0]["n_events"] == 2
    # session_end = last event + gap
    merged = per_user[2][0]
    assert (merged["session_end"] - merged["session_start"]).total_seconds() == 3600


def test_late_drop_two_phase_watermark(spark, tmp_path):
    """windowed_counts_with_late_drop: phase-2 rows in windows already
    finalized by phase 1's persisted watermark are DROPPED; late rows
    in still-open windows aggregate; emission stops at the final
    watermark. Hand-built timeline (1h windows, 1h delay):

      A: 10:05, 10:10, 12:30  -> W1 = 12:30 - 1h = 11:30
         phase 1 emits [10,11) (end 11:00 <= 11:30); [12,13) stays open
      B: 10:20 (late, window end 11:00 <= W1 -> DROPPED)
         12:05 (late ts < W1? no: 12:05 > 11:30 irrelevant — window
                [12,13) end 13:00 > W1 -> aggregates into open state)
         14:45 (on-time) -> W2 = 14:45 - 1h = 13:45
         phase 2 emits [12,13) (end 13:00 <= 13:45) with BOTH the
         phase-1 12:30 row and the surviving 12:05 row; [14,15) is
         never emitted (end 15:00 > W2)
    """
    from data_pipeline_childcare_spark.streaming.windows import (
        windowed_counts_with_late_drop,
    )

    def ev(rows):
        return spark.createDataFrame(
            rows, "event_id long, event_type string, ts string, value double"
        ).selectExpr(
            "event_id", "event_type",
            "cast(ts as timestamp_ntz) as ts", "value"
        )

    a = ev([
        (1, "click", "2024-03-01 10:05:00", 1.0),
        (2, "click", "2024-03-01 10:10:00", 2.0),
        (3, "click", "2024-03-01 12:30:00", 4.0),
    ])
    b = ev([
        (4, "click", "2024-03-01 10:20:00", 8.0),    # late, finalized window -> drop
        (5, "click", "2024-03-01 12:05:00", 16.0),   # late-ish, open window -> keep
        (6, "click", "2024-03-01 14:45:00", 32.0),   # on-time, beyond final frontier
    ])
    out = windowed_counts_with_late_drop(
        spark, a, b, str(tmp_path / "ld"), "1 hour", "1 hour",
        name_prefix="late_drop_test",
    )
    rows = {str(r["window_start"]): r for r in out.collect()}
    assert set(rows) == {"2024-03-01 10:00:00", "2024-03-01 12:00:00"}
    w10 = rows["2024-03-01 10:00:00"]
    assert w10["n_events"] == 2 and w10["total_value"] == 3.0  # row 4 dropped
    w12 = rows["2024-03-01 12:00:00"]
    assert w12["n_events"] == 2 and w12["total_value"] == 20.0  # row 5 kept


def test_left_outer_null_rows_emit_only_after_expiry(spark, tmp_path):
    """stream_stream_click_purchase_left: the null-extended row for an
    unmatched click emits ONLY after the global watermark passes the
    end of its join window — never in the batch that ingested it.
    Two REAL availableNow runs share one checkpoint + file sink:

      A: click u1 10:00 (never matches), click u2 10:05 +
         purchase u2 10:15 (match). W1 = min(10:05, 10:15) − 1h =
         09:05 — u1's window end 10:30 is NOT < 09:05, so phase 1
         emits ONLY the u2 match: no null rows yet.
      B: click u3 13:00 + purchase u3 13:10 (match) advance the
         watermark to W2 = min(13:00, 13:10) − 1h = 12:00; click u4
         11:30:00.000 sits exactly ON the frontier (11:30 + 30min ==
         W2). Phase 2 emits the u3 match AND u1's null row (10:30 <
         12:00), while u4 stays in state un-emitted — the STRICT
         boundary the registry oracle mirrors.
    """
    import os

    from data_pipeline_childcare_spark.streaming.dedup_join import (
        stream_stream_click_purchase_left,
    )

    def ev(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).selectExpr("user_id", "cast(ts as timestamp) as ts", "value")

    c_dir, p_dir = str(tmp_path / "c"), str(tmp_path / "p")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def land(df, d, fname):
        stage = str(tmp_path / f"stage_{fname}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        os.makedirs(d, exist_ok=True)
        part = next(
            p for p in os.listdir(stage)
            if p.endswith(".parquet") and p.startswith("part-")
        )
        os.rename(os.path.join(stage, part), os.path.join(d, fname))

    schema = "user_id long, ts timestamp, value double"

    def run_phase(qname):
        for q in spark.streams.active:
            if q.name == qname:
                q.stop()
        c = spark.readStream.schema(schema).parquet(c_dir)
        p = spark.readStream.schema(schema).parquet(p_dir)
        joined = stream_stream_click_purchase_left(
            c, p, horizon="30 minutes", watermark_delay="1 hour"
        )
        q = (
            joined.writeStream.format("parquet")
            .queryName(qname)
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    land(ev([(1, "2024-03-01 10:00:00", 0.0),
             (2, "2024-03-01 10:05:00", 0.0)]), c_dir, "a.parquet")
    land(ev([(2, "2024-03-01 10:15:00", 42.0)]), p_dir, "a.parquet")
    run_phase("ljx_phase1")
    out_schema = (
        "user_id long, click_ts timestamp, purchase_ts timestamp,"
        " purchase_value double"
    )
    phase1 = spark.read.schema(out_schema).parquet(out_dir).collect()
    assert {(r.user_id, r.purchase_value) for r in phase1} == {(2, 42.0)}
    assert all(r.purchase_ts is not None for r in phase1)  # no nulls yet

    land(ev([(3, "2024-03-01 13:00:00", 0.0),
             (4, "2024-03-01 11:30:00", 0.0)]), c_dir, "b.parquet")
    land(ev([(3, "2024-03-01 13:10:00", 7.0)]), p_dir, "b.parquet")
    run_phase("ljx_phase2")
    rows = spark.read.schema(out_schema).parquet(out_dir).collect()
    got = {(r.user_id, r.purchase_value) for r in rows}
    # u1's null row arrived with phase 2; u4 (frontier-exact) did not
    assert got == {(2, 42.0), (3, 7.0), (1, None)}
    nulls = [r for r in rows if r.purchase_ts is None]
    assert [(r.user_id, str(r.click_ts)) for r in nulls] == [
        (1, "2024-03-01 10:00:00")
    ]


def test_left_outer_empty_side_emits_no_null_rows(spark, tmp_path):
    """Self-review round 11: with ZERO purchases the purchase-side
    watermark never initializes, Spark's min-policy global watermark
    stays at epoch 0, and no null-extended rows may emit — the
    NULL-strict min the registry oracle mirrors (DuckDB's least()
    would otherwise skip the NULL side and emit every old click)."""
    from data_pipeline_childcare_spark.streaming.dedup_join import (
        stream_stream_click_purchase_left,
    )

    clicks = spark.createDataFrame(
        [(1, "2024-01-02 06:00:00", 0.0), (2, "2024-01-02 23:00:00", 0.0)],
        "user_id long, ts string, value double",
    ).selectExpr("user_id", "cast(ts as timestamp) as ts", "value")
    empty = clicks.filter("user_id < 0")
    c_dir, p_dir = str(tmp_path / "c"), str(tmp_path / "p")
    clicks.write.parquet(c_dir)
    empty.write.parquet(p_dir)
    c = spark.readStream.schema(clicks.schema).parquet(c_dir)
    p = spark.readStream.schema(clicks.schema).parquet(p_dir)
    q = (
        stream_stream_click_purchase_left(c, p)
        .writeStream.format("memory")
        .queryName("lj_empty_side")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("lj_empty_side").count() == 0


def test_full_outer_two_sided_null_emission(spark, tmp_path):
    """stream_stream_click_purchase_full: BOTH sides' null-extended
    rows gate on the global watermark, with ASYMMETRIC frontiers.
    Two REAL availableNow runs share one checkpoint + file sink:

      A: click u2 10:05 + purchase u2 10:15 (match); click u7 10:00
         (never matches); purchase u1 10:00 (never matches). W1 =
         min(10:05, 10:15) − 1h = 09:05 — nothing expires; phase 1
         emits ONLY the u2 match.
      B: click u3 13:00 + purchase u3 13:10 (match) advance the
         watermark to W2 = min(13:00, 13:10) − 1h = 12:00. Click
         frontier (STRICT, horizon-shifted): u7's null row emits
         (10:30 < 12:00); click u4 11:30:00.000 sits exactly ON it
         (11:30 + 30min == W2) and stays in state. Purchase frontier
         (NON-strict, no horizon): u1 (10:00) and u5 (12:00:00.000,
         exactly AT W2) emit null rows; u6 (12:00:00.001, 1 ms past)
         stays in state — the strictness FLIP between the two sides
         the registry oracle mirrors.
    """
    import os

    from data_pipeline_childcare_spark.streaming.dedup_join import (
        stream_stream_click_purchase_full,
    )

    def ev(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).selectExpr("user_id", "cast(ts as timestamp) as ts", "value")

    c_dir, p_dir = str(tmp_path / "c"), str(tmp_path / "p")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def land(df, d, fname):
        stage = str(tmp_path / f"stage_{fname}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        os.makedirs(d, exist_ok=True)
        part = next(
            p for p in os.listdir(stage)
            if p.endswith(".parquet") and p.startswith("part-")
        )
        os.rename(os.path.join(stage, part), os.path.join(d, fname))

    schema = "user_id long, ts timestamp, value double"

    def run_phase(qname):
        for q in spark.streams.active:
            if q.name == qname:
                q.stop()
        c = spark.readStream.schema(schema).parquet(c_dir)
        p = spark.readStream.schema(schema).parquet(p_dir)
        joined = stream_stream_click_purchase_full(
            c, p, horizon="30 minutes", watermark_delay="1 hour"
        )
        q = (
            joined.writeStream.format("parquet")
            .queryName(qname)
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    land(ev([(2, "2024-03-01 10:05:00", 0.0),
             (7, "2024-03-01 10:00:00", 0.0)]), c_dir, "a.parquet")
    land(ev([(2, "2024-03-01 10:15:00", 42.0),
             (1, "2024-03-01 10:00:00", 5.0)]), p_dir, "a.parquet")
    run_phase("fjx_phase1")
    out_schema = (
        "user_id long, click_ts timestamp, purchase_ts timestamp,"
        " purchase_value double"
    )
    phase1 = spark.read.schema(out_schema).parquet(out_dir).collect()
    assert {(r.user_id, r.purchase_value) for r in phase1} == {(2, 42.0)}
    assert all(
        r.purchase_ts is not None and r.click_ts is not None for r in phase1
    )  # no nulls on either side yet

    land(ev([(3, "2024-03-01 13:00:00", 0.0),
             (4, "2024-03-01 11:30:00", 0.0)]), c_dir, "b.parquet")
    land(ev([(3, "2024-03-01 13:10:00", 7.0),
             (5, "2024-03-01 12:00:00", 1.0),
             (6, "2024-03-01 12:00:00.001", 2.0)]), p_dir, "b.parquet")
    run_phase("fjx_phase2")
    rows = spark.read.schema(out_schema).parquet(out_dir).collect()
    got = {(r.user_id, str(r.click_ts), str(r.purchase_ts)) for r in rows}
    assert got == {
        (2, "2024-03-01 10:05:00", "2024-03-01 10:15:00"),   # match A
        (3, "2024-03-01 13:00:00", "2024-03-01 13:10:00"),   # match B
        (7, "2024-03-01 10:00:00", "None"),                  # click-side null
        (1, "None", "2024-03-01 10:00:00"),                  # purchase-side null
        (5, "None", "2024-03-01 12:00:00"),                  # AT W: emits (non-strict)
        # u4 (click frontier-exact) and u6 (1 ms past W) stay in state
    }
    # user_id is taken from whichever side is present
    assert all(r.user_id is not None for r in rows)


def test_stream_stream_join_state_plateaus_within_horizon(spark, tmp_path):
    """State-store SIZE evidence for the stream-stream join family
    (round-11 ask): under a long availableNow run (one file per
    micro-batch, event time advancing 10 min per file), the join
    state must PLATEAU at the watermark horizon, not grow with
    stream length. With delay 1h + horizon 30min the engine can only
    be holding rows from the last 90 event-minutes = 9 steps × 4
    rows/step = 36 — measured: state climbs 4, 8, ... to exactly 36
    and stays flat for the remaining ~30 batches while 144 rows
    stream through. The assert gives headroom for bookkeeping rows
    but fails any linear-growth regression by construction."""
    import os
    from datetime import datetime, timedelta

    from data_pipeline_childcare_spark.streaming.dedup_join import (
        stream_stream_click_purchase_full,
    )

    def ev(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).selectExpr("user_id", "cast(ts as timestamp) as ts", "value")

    c_dir, p_dir = str(tmp_path / "c"), str(tmp_path / "p")

    def land(df, d, fname):
        stage = str(tmp_path / f"stage_{fname}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        os.makedirs(d, exist_ok=True)
        part = next(
            p for p in os.listdir(stage)
            if p.endswith(".parquet") and p.startswith("part-")
        )
        os.rename(os.path.join(stage, part), os.path.join(d, fname))

    t0 = datetime(2024, 3, 1, 0, 0, 0)
    n_steps = 36
    for i in range(n_steps):
        s = (t0 + timedelta(minutes=10 * i)).strftime("%Y-%m-%d %H:%M:%S")
        land(ev([(100 + i, s, 0.0), (200 + i, s, 0.0)]), c_dir, f"s{i:03d}.parquet")
        land(ev([(100 + i, s, 1.0), (300 + i, s, 2.0)]), p_dir, f"s{i:03d}.parquet")

    schema = "user_id long, ts timestamp, value double"
    c = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(c_dir)
    p = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(p_dir)
    j = stream_stream_click_purchase_full(
        c, p, horizon="30 minutes", watermark_delay="1 hour"
    )
    qname = "state_plateau_probe"
    for q in spark.streams.active:
        if q.name == qname:
            q.stop()
    q = (
        j.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    hist = [
        pr["stateOperators"][0]["numRowsTotal"]
        for pr in q.recentProgress
        if pr["stateOperators"]
    ]
    assert len(hist) >= n_steps  # one micro-batch per file pair
    total_input = n_steps * 4
    horizon_rows = 9 * 4  # 90 event-minutes of input = the horizon
    # plateau: the max ever held is the horizon's worth (+small
    # bookkeeping headroom), nowhere near the full stream
    assert max(hist) <= horizon_rows * 2, hist
    assert max(hist) < total_input / 2
    # flat tail: the last third of the run holds no more than the
    # plateau reached by mid-run (eviction keeps pace with ingest)
    mid_plateau = max(hist[: len(hist) // 2])
    assert all(h <= mid_plateau for h in hist[-len(hist) // 3:]), hist
