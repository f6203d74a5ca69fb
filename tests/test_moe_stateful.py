"""S3 MOE HTML extraction and the custom stateful streaming operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_childcare_spark.sources.moe_html import extract_moe_rows, moe_rows_to_rag_blocks
from data_pipeline_childcare_spark.sources.record_blocks import parse_blocks
from data_pipeline_childcare_spark.streaming.stateful import running_user_stats

HTML = """
<html><body><table>
<tr class="table_list" onmouseout="x"><td>四川</td><td><a>520802</a></td>
<td>婴幼儿托育服务与管理</td><td>4151012345</td><td><b>四川幼儿师范高等专科学校</b></td>
<td>三年</td><td></td></tr>
<tr class="table_list"><td>四川</td><td>520801</td><td>早期教育</td><td>4151099999</td>
<td>另一学校</td><td>三年</td><td>备注A</td></tr>
<tr class="other"><td>skip</td></tr>
<tr class="table_list"><td>short</td><td>row</td></tr>
</table></body></html>
"""


def test_extract_moe_rows_s3(spark):
    pages = spark.createDataFrame([(2021, HTML)], "year int, html string")
    rows = extract_moe_rows(pages).collect()
    assert len(rows) == 2  # non-table_list and short rows dropped
    r0 = rows[0]
    assert r0["province"] == "四川"
    assert r0["major_code"] == "520802"  # inner <a> tag stripped
    assert r0["school_name"] == "四川幼儿师范高等专科学校"  # <b> stripped
    assert r0["year"] == 2021  # passthrough column preserved


def test_moe_blocks_roundtrip_through_corpus_parser(spark):
    """The generated rag block must parse back as a MOE record through
    the engine's own corpus reader — producer/consumer agreement."""
    pages = spark.createDataFrame([(2021, HTML)], "year int, html string")
    blocks = moe_rows_to_rag_blocks(extract_moe_rows(pages))
    parsed = parse_blocks(blocks, block_col="block")
    rows = parsed.select("record_type", F.col("rec").getItem("开设专业").alias("major")).collect()
    assert all(r["record_type"] == "moe" for r in rows)
    assert "婴幼儿托育服务与管理 (520802)" in {r["major"] for r in rows}


def test_running_user_stats_state_across_batches(spark, tmp_path):
    """State must carry across micro-batches: two files, one per
    trigger, second batch emits CUMULATIVE totals."""
    t0 = dt.datetime(2024, 1, 1, 10)
    batch1 = spark.createDataFrame([(1, t0, 2.0), (2, t0, 5.0)], "user_id long, ts timestamp, value double")
    batch2 = spark.createDataFrame([(1, t0, 3.0)], "user_id long, ts timestamp, value double")
    src = tmp_path / "ev"
    batch1.write.parquet(str(src / "f1"))
    batch2.write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM user_stats").collect()
    # last emission per user must be cumulative
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (2, 5.0)  # 2.0 + 3.0 across two batches
    assert final[2] == (1, 5.0)

def test_running_user_stats_exact_multi_batch_equals_batch_aggregate(spark, tmp_path):
    """Integer-micros state is batch-split-invariant: the final state
    after a 2-batch availableNow run equals the one-shot batch GROUP
    BY on the same rows — the property the registry certification
    (streaming_user_stats_events) rests on. Values chosen so float
    accumulation order WOULD differ (0.1/0.2-style doubles)."""
    from pyspark.sql import functions as F

    from data_pipeline_childcare_spark.streaming.stateful import (
        running_user_stats_exact,
    )

    t0 = dt.datetime(2024, 1, 1, 10)
    batch1 = spark.createDataFrame(
        [(1, t0, 0.1), (1, t0, 0.2), (2, t0, 1.005)],
        "user_id long, ts timestamp, value double",
    )
    batch2 = spark.createDataFrame(
        [(1, t0, 0.3), (2, t0, -2.5)], "user_id long, ts timestamp, value double"
    )
    src = tmp_path / "ev"
    batch1.write.parquet(str(src / "f1"))
    batch2.write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        running_user_stats_exact(stream)
        .writeStream.format("memory")
        .queryName("user_stats_exact")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_exact"))
        .start()
    )
    q.awaitTermination(120)
    final = {
        r["user_id"]: (r["n_events"], r["total_value_u"])
        for r in spark.sql(
            "SELECT user_id, max_by(n_events, n_events) AS n_events,"
            " max_by(total_value_u, n_events) AS total_value_u"
            " FROM user_stats_exact GROUP BY user_id"
        ).collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["t"])
        for r in batch1.unionByName(batch2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
            ).alias("t"),
        )
        .collect()
    }
    assert final == expected
    assert final[1] == (3, 600000)       # 0.1+0.2+0.3 exact in micros
    assert final[2] == (2, -1495000)     # 1.005 → 1005000, -2.5 → -2500000
