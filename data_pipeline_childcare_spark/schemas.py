"""Typed schemas for the five record families (SURVEY.md §1.4).

The reference is schema-on-read (Python dicts); here every family gets
a declared StructType so scans prune columns and predicates push down.
The survey schema is a direct transcription of the reference's
survey_schema.json:1-172 (enums/booleans/ints/string-arrays/
array-of-struct/matrix-map shapes).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# 托育机构备案信息 (institution registration; retrieve.py:909-934)
INSTITUTION_SCHEMA = StructType(
    [
        StructField("name", StringType()),          # 机构名称
        StructField("alias", StringType()),         # 别名
        StructField("credit_code", StringType()),   # 统一社会信用代码
        StructField("institution_type", StringType()),  # 机构类型
        StructField("address", StringType()),       # 详细地址
        StructField("registered_at", TimestampNTZType()),  # 备案及完成时间
        StructField("region_code", StringType()),   # 区域编号 (12-digit)
    ]
)

# MOE school-major records (moe_majors_scraper.py:149-157)
MOE_SCHEMA = StructType(
    [
        StructField("school_name", StringType()),   # 机构名称
        StructField("province", StringType()),      # 省份
        StructField("school_code", StringType()),   # 学校标识码
        StructField("major_name", StringType()),    # 开设专业 name part
        StructField("major_code", StringType()),    # 开设专业 (code) part
        StructField("duration", StringType()),      # 修业年限
        StructField("year", IntegerType()),         # 年份
        StructField("remark", StringType()),        # 备注
    ]
)

# Survey JSON documents (survey_schema.json:1-172)
SURVEY_SCHEMA = StructType(
    [
        StructField(
            "institution_info",
            StructType(
                [
                    StructField("city", StringType()),
                    StructField("institution_nature", StringType()),
                    StructField("is_puhui", BooleanType()),
                    StructField("total_capacity", IntegerType()),
                    StructField("service_modes", ArrayType(StringType())),
                ]
            ),
        ),
        StructField(
            "personal_info",
            StructType(
                [
                    StructField("job_role", StringType()),
                    StructField("education_level", StringType()),
                    StructField("major", StringType()),
                    StructField("years_of_experience", StringType()),
                ]
            ),
        ),
        StructField(
            "employment_info",
            StructType(
                [
                    StructField("recruitment_channels", ArrayType(StringType())),
                    StructField(
                        "shortage_positions",
                        ArrayType(
                            StructType(
                                [
                                    StructField("position", StringType()),
                                    StructField("shortage_level", StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        StructField(
            "position_details",
            StructType(
                [
                    StructField("salary_range", StringType()),
                    StructField("satisfaction_matrix", MapType(StringType(), StringType())),
                ]
            ),
        ),
        StructField(
            "manager_specific_info",
            StructType(
                [
                    StructField("staff_count", IntegerType()),
                    StructField("turnover_rate", StringType()),
                ]
            ),
        ),
    ]
)

# Chunk/segment records (retrieve.py:128-145)
CHUNK_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("chunk_id", StringType()),
        StructField("content", StringType()),
        StructField("score", StringType()),
        StructField("database_id", StringType()),
        StructField("document_id", StringType()),
        StructField("document_name", StringType()),
        StructField("position", IntegerType()),
        StructField("doc_metadata", MapType(StringType(), StringType())),
    ]
)

# Normalized search/scrape-result records (多数据源获取数据.py:156-207)
SEARCH_RESULT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("source", StringType()),
        StructField("snippet", StringType()),
        StructField("provider", StringType()),
        StructField("query", StringType()),
        StructField("origin_key", StringType()),
        StructField("result_type", StringType()),  # web | video
        StructField("video_id", StringType()),
        StructField("embed_url", StringType()),
        StructField("thumbnail_url", StringType()),
    ]
)

SCRAPED_CONTENT_SCHEMA = StructType(
    [
        StructField("type", StringType()),
        StructField("source_id", StringType()),
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("source", StringType()),
        StructField("snippet", StringType()),
        StructField("query", StringType()),
        StructField("content", StringType()),
    ]
)
