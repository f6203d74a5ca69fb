"""Timeline/subtitle operators — expectations transcribed from the
reference's own unit test (test_transformation.py:65-83: cumulative
00:03/00:18 endpoints, subtitle absolute-time repair), plus the new
connector-normalization layer and J4 rerank backfill."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.text import extract_video_id, url_to_source_id
from data_pipeline_childcare_spark.operators.rrf import attach_rerank_scores
from data_pipeline_childcare_spark.operators.timeline import outline, scenes_from_json, subtitles
from data_pipeline_childcare_spark.sources.connectors import (
    FakeSearchProvider,
    normalize_result,
    run_search_tasks,
)

SCRIPT = json.dumps(
    {
        "scenes": [
            {
                "id": "s1",
                "type": "normal",
                "title": "行星运动的轨迹",
                "estimated_duration_seconds": 3,
                "scene_knowledge": "开普勒定律",
                "subtitles": [],
            },
            {
                "id": "s2",
                "type": "normal",
                "title": "",
                "estimated_duration_seconds": 15,
                "subtitles": [
                    {"id": "sub1", "start_time_seconds": 0, "end_time_seconds": 5, "text": "Hello world"}
                ],
            },
        ]
    }
)


def _scenes(spark):
    df = spark.createDataFrame([("v1", SCRIPT)], "video_id string, script string")
    return scenes_from_json(df, "script")


def test_outline_cumulative_times(spark):
    rows = outline(_scenes(spark)).orderBy("index").collect()
    assert len(rows) == 2
    assert rows[0]["title"] == "行星运动的轨迹"
    assert (rows[0]["startTime"], rows[0]["endTime"]) == ("00:00", "00:03")
    # reference expectation: scene 2 spans 00:03 → 00:18 (3 + 15)
    assert (rows[1]["startTime"], rows[1]["endTime"]) == ("00:03", "00:18")
    assert rows[1]["title"] == "场景 2"  # missing-title fallback


def test_subtitle_relative_time_repair(spark):
    rows = subtitles(_scenes(spark)).collect()
    assert len(rows) == 1
    # raw start 0 < scene start 3 ⇒ relative ⇒ shifted to 00:03
    assert rows[0]["startTime"] == "00:03"
    assert rows[0]["endTime"] == "00:08"
    assert rows[0]["text"] == "Hello world"


def test_video_id_extraction(spark):
    df = spark.createDataFrame(
        [
            ("https://www.douyin.com/video/712345678901",),
            ("https://www.bilibili.com/video/BV1xx411c7mD",),
            ("https://example.com/article",),
        ],
        "url string",
    )
    got = [r["v"] for r in df.select(extract_video_id("url").alias("v")).collect()]
    assert got == ["712345678901", "BV1xx411c7mD", ""]


def test_url_to_source_id(spark):
    df = spark.createDataFrame([("https://ex.com/a b/c?x=1",)], "url string")
    assert df.select(url_to_source_id("url").alias("v")).first()["v"] == "ex.com_a_b_c_x_1"


def test_connector_normalization_p1():
    raw = {
        "tavily_url": "https://t.example/x",
        "tavily_title": "T",
        "tavily_snippet": "S",
        "query": "q1",
    }
    rec = normalize_result(raw, origin_key="grp")
    assert rec["provider"] == "tavily"
    assert rec["url"] == "https://t.example/x"
    assert rec["result_type"] == "web"
    assert rec["origin_key"] == "grp"


def test_fake_provider_pipeline(spark):
    providers = {"searchapi": FakeSearchProvider("searchapi"), "jina": FakeSearchProvider("jina")}
    df = run_search_tasks(
        spark,
        [("托育 政策", "searchapi", "k1"), ("托育 政策", "jina", "k1")],
        providers,
        n_results=3,
    )
    assert df.count() == 6
    by_provider = {
        r["provider"]: r["n"]
        for r in df.groupBy("provider").agg(F.count("*").alias("n")).collect()
    }
    assert by_provider == {"searchapi": 3, "jina": 3}
    # determinism
    df2 = run_search_tasks(spark, [("托育 政策", "searchapi", "k1")], providers, n_results=3)
    assert sorted(r["url"] for r in df2.collect()) == sorted(
        r["url"] for r in df.filter(F.col("provider") == "searchapi").collect()
    )


def test_rerank_positional_backfill(spark):
    cands = spark.createDataFrame(
        [("c1", 0.9), ("c2", 0.8), ("c3", 0.7)], "chunk_id string, rrf_score double"
    )
    scores = spark.createDataFrame(
        [(0, 0.1), (1, 0.99), (2, 0.5)], "index int, relevance_score double"
    )
    got = {r["chunk_id"]: r["relevance_score"] for r in attach_rerank_scores(cands, scores).collect()}
    assert got == {"c1": 0.1, "c2": 0.99, "c3": 0.5}
