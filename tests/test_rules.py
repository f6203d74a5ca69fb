"""Table-driven tests for the rule engine — one case per reference
branch (retrieve.py:1356-1499), per SURVEY.md §7.3 "rule-engine
fidelity" mitigation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.dates import parse_ts_multi
from data_pipeline_childcare_spark.operators.rules import (
    RegionalRule,
    check_rule,
    education_predicate,
    moe_vocational_gate,
    parse_location,
    record_type_col,
    region_predicate,
    time_predicate,
)


# records: (id, type, location, level, major, name, registered_at)
RECORDS = [
    (1, "institution", "四川省成都市锦江区", "", "托育机构", "成都天使托育园", "2021-05-10 12:00:00"),
    (2, "institution", "北京市朝阳区", "", "托育机构", "北京阳光托育", "2024-03-01"),
    (3, "institution", "吉林省吉林市船营区", "", "托育机构", "吉林雪花托育", "2025-01-15"),
    (4, "moe", "四川", "高职", "婴幼儿托育服务与管理 (520802)", "四川幼儿师范高等专科学校", ""),
    (5, "survey", "成都", "大专", "保育员", "", ""),
]
SCHEMA = "id long, rtype string, loc string, level string, major string, name string, reg string"


def run_rule(spark, rule: RegionalRule) -> set[int]:
    df = spark.createDataFrame(RECORDS, SCHEMA)
    cond = check_rule(
        rule,
        record_type=F.col("rtype"),
        location_col=F.col("loc"),
        level_col=F.col("level"),
        major_col=F.col("major"),
        name_col=F.col("name"),
        alias_col=None,
        ts_col=parse_ts_multi(F.col("reg")),
    )
    return {r["id"] for r in df.filter(cond).collect()}


def test_parse_location_city_vs_province():
    assert parse_location("成都") == ("四川", "成都", None)
    assert parse_location("四川") == ("四川", None, None)
    assert parse_location("四川省成都市") == ("四川", "成都", None)
    # 吉林 ambiguity: bare name resolves as the PROVINCE
    assert parse_location("吉林") == ("吉林", None, None)
    assert parse_location("北京") == ("北京", None, None)
    # unparseable → raw substring fallback
    assert parse_location("火星基地") == (None, None, "火星基地")


def test_region_rule_province_matches_city_records(spark):
    # province rule accepts records in any of its cities; the MOE
    # record (4) is gated out because no vocational level is requested
    assert run_rule(spark, RegionalRule(scope="四川")) == {1, 5}


def test_region_rule_city_exact(spark):
    assert run_rule(spark, RegionalRule(scope="成都")) == {1, 5}


def test_region_rule_jilin_province_catches_jilin_city(spark):
    assert run_rule(spark, RegionalRule(scope="吉林")) == {3}


def test_major_substring_containment(spark):
    # major applies to survey+MOE only; institutions pass through.
    # With level=大专 the MOE gate opens: 托育 ⊂ record 4's 开设专业,
    # 保育 ⊂ record 5's 保育员.
    assert run_rule(spark, RegionalRule(scope="四川", level="大专", major="托育")) == {1, 4}
    assert run_rule(spark, RegionalRule(scope="四川", level="大专", major="保育")) == {1, 5}
    # institutions are immune to the major predicate entirely
    assert run_rule(spark, RegionalRule(scope="四川", major="不存在专业")) == {1}


def test_education_bidirectional_containment(spark):
    df = spark.range(1)
    # 高职 and 大专 both normalize to 高等职业教育（专科）
    assert df.select(education_predicate(F.lit("高职"), "大专").alias("v")).first()["v"]
    assert df.select(education_predicate(F.lit("专科"), "高等职业教育（专科）").alias("v")).first()["v"]
    assert not df.select(education_predicate(F.lit("本科"), "大专").alias("v")).first()["v"]


def test_moe_vocational_gate():
    assert moe_vocational_gate("大专")
    assert moe_vocational_gate("高职")
    assert not moe_vocational_gate("本科")
    assert not moe_vocational_gate("硕士")


def test_level_rule_gates_moe_records(spark):
    # requesting 本科: MOE record 4 rejected by the vocational gate
    # (P6); survey record 5 (大专) fails bidirectional containment;
    # institution record 1 is never level-filtered
    assert run_rule(spark, RegionalRule(scope="四川", level="本科")) == {1}
    # requesting 大专: MOE passes the gate, survey matches
    assert run_rule(spark, RegionalRule(scope="四川", level="大专")) == {1, 4, 5}


def test_school_rule_applies_to_moe_only(spark):
    # school filter must NOT reject institution or survey records (P7)
    assert run_rule(
        spark, RegionalRule(scope="四川", level="大专", school="幼儿师范")
    ) == {1, 4, 5}
    assert run_rule(
        spark, RegionalRule(scope="四川", level="大专", school="不存在学校")
    ) == {1, 5}


def test_strict_time_rejects_dateless_but_exempts_survey(spark):
    # 近两年 from 2026 ⇒ [2024-01-01, now]; record 1 (2021) out,
    # records 2,3 in; MOE record 4 has no date → strict reject;
    # survey record 5 exempt from time filtering entirely (P8)
    assert run_rule(spark, RegionalRule(scope="四川", time_filter="近两年")) == {5}
    assert run_rule(spark, RegionalRule(scope="北京", time_filter="近两年")) == {2}


def test_time_predicate_nonstrict_keeps_dateless(spark):
    df = spark.createDataFrame([(1, "2024-05-01"), (2, None)], "id long, d string")
    ts = parse_ts_multi(F.col("d"))
    strict = df.filter(time_predicate(ts, "近两年", strict=True)).count()
    loose = df.filter(time_predicate(ts, "近两年", strict=False)).count()
    assert (strict, loose) == (1, 2)


def test_record_type_dispatch(spark):
    df = spark.createDataFrame(
        [
            (1, {"学校标识码": "415101", "开设专业": "x"}),
            (2, {"统一社会信用代码": "91", "备案及完成时间": "2021"}),
            (3, {"岗位": "保育员", "开设专业": "x"}),
            (4, {"其他": "y"}),
        ],
        "id long, rec map<string,string>",
    )
    got = {r["id"]: r["t"] for r in df.select("id", record_type_col(F.col("rec")).alias("t")).collect()}
    assert got == {1: "moe", 2: "institution", 3: "survey", 4: "survey"}


def test_region_unparseable_substring_fallback(spark):
    df = spark.createDataFrame([(1, "火星基地一号"), (2, "地球")], "id long, loc string")
    got = {r["id"] for r in df.filter(region_predicate(F.col("loc"), "火星基地")).collect()}
    assert got == {1}


# --- full-gazetteer coverage (reference retrieve.py:1027-1062) ---

def test_gazetteer_is_reference_complete():
    from data_pipeline_childcare_spark.dims import CHINA_REGIONS, city_to_province

    assert len(CHINA_REGIONS) == 34  # 31 mainland + 台湾/香港/澳门
    assert sum(len(v) for v in CHINA_REGIONS.values()) >= 340
    for prov in CHINA_REGIONS:
        # every province name resolves province-first
        assert parse_location(prov) == (prov, None, None)
    # every city resolves to a province via the reverse index
    c2p = city_to_province()
    for prov, cities in CHINA_REGIONS.items():
        for c in cities:
            assert c in c2p


@pytest.mark.parametrize(
    "scope, expected",
    [
        ("邵阳", ("湖南", "邵阳", None)),       # city flagged absent in round 1
        ("秦皇岛", ("河北", "秦皇岛", None)),
        ("秦皇岛市", ("河北", "秦皇岛", None)),
        ("台北", ("台湾", "台北", None)),
        ("香港", ("香港", None, None)),
        ("澳门", ("澳门", None, None)),
        ("儋州", ("海南", "儋州", None)),
        ("大兴安岭", ("黑龙江", "大兴安岭", None)),
        # 海南 is both a province and a 青海 autonomous prefecture:
        # province-first probing wins, same as the reference
        ("海南", ("海南", None, None)),
        # 河北 is both a province and a 天津 district: province wins
        ("河北", ("河北", None, None)),
    ],
)
def test_parse_location_full_gazetteer(scope, expected):
    assert parse_location(scope) == expected


def test_ambiguous_city_last_writer_wins():
    # 朝阳 is a 北京 district AND a 辽宁 prefecture city; the reverse
    # index is built in reference dict order so the later province wins
    # (retrieve.py:1064-1072 last-writer-wins semantics)
    from data_pipeline_childcare_spark.dims import city_to_province

    assert city_to_province()["朝阳"] == "辽宁"


def test_county_level_city_matches_via_province_substring(spark):
    # 定州 is county-level — absent from the prefecture gazetteer (as in
    # the reference). A record naming the province still matches the
    # province rule; a bare county name falls through, matching the
    # reference's behavior exactly.
    df = spark.createDataFrame(
        [(1, "河北省定州市中心街"), (2, "定州市中心街")], "id long, loc string"
    )
    got = {r["id"] for r in df.filter(region_predicate(F.col("loc"), "河北")).collect()}
    assert got == {1}


def test_education_map_reference_alignment(spark):
    from data_pipeline_childcare_spark.dims import EDUCATION_MAP
    from data_pipeline_childcare_spark.operators.rules import _normalize_level

    # canonical values match reference retrieve.py:999-1022
    assert _normalize_level("硕士") == "硕士研究生"
    assert _normalize_level("研究生") == "硕士研究生"
    assert _normalize_level("master_degree") == "硕士研究生"
    assert _normalize_level("本科及以上") == "普通本科"
    assert _normalize_level("undergraduate") == "普通本科"
    assert _normalize_level("高职（专科）") == "高等职业教育（专科）"
    assert _normalize_level("vocational_college") == "高等职业教育（专科）"
    assert _normalize_level("高中/中职") == "中等职业教育"
    assert EDUCATION_MAP["senior_high_school"] == "中等职业教育"
    # predicate equivalence across synonym families
    df = spark.range(1)
    assert df.select(education_predicate(F.lit("硕士"), "研究生").alias("v")).first()["v"]
    assert df.select(education_predicate(F.lit("本科"), "本科及以上").alias("v")).first()["v"]
    assert not df.select(education_predicate(F.lit("硕士"), "大专").alias("v")).first()["v"]
