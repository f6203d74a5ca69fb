"""Survey→RAG formatting: markdown shape, label decoding, metadata
flattening, and the round-trip back through the survey parser."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.text import pipe_header_to_map
from data_pipeline_childcare_spark.plans.survey_rag import survey_to_markdown
from data_pipeline_childcare_spark.schemas import SURVEY_SCHEMA

SURVEY = {
    "institution_info": {
        "city": "成都",
        "institution_nature": "1",
        "is_puhui": True,
        "total_capacity": 80,
        "service_modes": ["全日托", "半日托"],
    },
    "personal_info": {
        "job_role": "1",
        "education_level": "2",
        "major": "婴幼儿托育",
        "years_of_experience": "3-5年",
    },
    "employment_info": {
        "recruitment_channels": ["线上招聘", "校企合作"],
        "shortage_positions": [{"position": "1", "shortage_level": "严重"}],
    },
    "position_details": {
        "salary_range": "2",
        "satisfaction_matrix": {"r1": "c1", "r2": "c2"},
    },
    "manager_specific_info": {"staff_count": 12, "turnover_rate": "10%"},
}


def _df(spark, payload=SURVEY):
    raw = spark.createDataFrame([(1, json.dumps(payload, ensure_ascii=False))], "id long, raw string")
    return raw.withColumn("survey", F.from_json("raw", SURVEY_SCHEMA))


def test_markdown_header_and_sections(spark):
    out = survey_to_markdown(_df(spark)).first()
    md = out["markdown"]
    assert md.startswith("城市：成都 | 岗位：保育员 | 学历：大专")
    assert "## 1. 机构信息" in md and "- **性质**: 营利性" in md
    assert "- **普惠**: 是" in md
    assert "- **薪资范围**: 3000-5000" in md
    assert "- 职业道德: **非常重要**" in md  # matrix decoded rows+cols
    assert "- 保育员: 严重" in md  # array-of-struct shortage decoded
    assert "- **员工数**: 12" in md


def test_metadata_flat_and_nonempty(spark):
    meta = survey_to_markdown(_df(spark)).first()["metadata"]
    assert meta["city"] == "成都"
    assert meta["position"] == "保育员"
    assert meta["org_nature"] == "营利性"
    assert "unknown" not in meta


def test_missing_sections_degrade(spark):
    minimal = {"personal_info": {"job_role": "3"}}
    out = survey_to_markdown(_df(spark, minimal)).first()
    md = out["markdown"]
    assert md.startswith("城市：N/A | 岗位：教师 | 学历：N/A")
    assert "紧缺岗位" not in md and "素质素养" not in md
    assert dict(out["metadata"]) == {"position": "教师"}


def test_roundtrip_through_survey_parser(spark):
    """The generated header must parse back through the engine's own
    pipe-header parser (the retrieval side's survey reader)."""
    df = survey_to_markdown(_df(spark))
    header = F.element_at(F.split(F.col("markdown"), r"\n"), 1)
    rec = df.select(pipe_header_to_map(header).alias("rec")).first()["rec"]
    assert rec == {"城市": "成都", "岗位": "保育员", "学历": "大专"}
