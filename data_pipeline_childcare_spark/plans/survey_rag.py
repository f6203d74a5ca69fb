"""Survey JSON → RAG-ready Markdown + flat metadata (SURVEY.md §1.1
shape 5; reference format_survey_for_rag.py:200-450 and
transform_survey_data.py).

One narrow projection per document: the survey struct (declared
schema) decodes through literal label maps (J3) and assembles into

- a ``城市：X | 岗位：Y | 学历：Z`` pipe header + sectioned Markdown
  body (the exact shape `parse_survey_content` reads back,
  retrieve.py:855-907), and
- a flat MAP<STRING,STRING> metadata column for vector-store
  filtering (extract_metadata, :407-448 — empty values dropped).

Everything is concat/transform column math; at 100 TB this pipeline
is a pure map stage that runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.labels import decode_array, decode_matrix, decode_scalar

# Label maps regex-parsed from formConfig.ts in the reference
# (transform_survey_data.py:5-66); carried here as literal dims.
GENDER_MAP = {"1": "男", "2": "女"}
EDUCATION_MAP_CODES = {"1": "高中及以下", "2": "大专", "3": "本科", "4": "硕士及以上"}
POSITION_MAP = {"1": "保育员", "2": "育婴员", "3": "教师", "4": "园长/负责人", "5": "其他"}
SALARY_MAP = {"1": "3000以下", "2": "3000-5000", "3": "5000-8000", "4": "8000以上"}
NATURE_MAP = {"1": "营利性", "2": "非营利性"}
PUHUI_MAP = {"true": "是", "false": "否"}
COMPETENCY_ROWS = {"r1": "职业道德", "r2": "保育技能", "r3": "沟通能力"}
COMPETENCY_COLS = {"c1": "非常重要", "c2": "重要", "c3": "一般"}


def _line(label: str, value: Column) -> Column:
    """`- **label**: value` line, empty when the value is null."""
    return F.when(
        value.isNotNull() & (value.cast("string") != ""),
        F.concat(F.lit(f"- **{label}**: "), value.cast("string")),
    )


def survey_to_markdown(df: DataFrame, survey_col: str = "survey") -> DataFrame:
    """survey struct → (markdown, metadata MAP) columns."""
    s = F.col(survey_col)
    inst, pers = s["institution_info"], s["personal_info"]
    emp, pos = s["employment_info"], s["position_details"]
    mgr = s["manager_specific_info"]

    city = inst["city"]
    position = decode_scalar(pers["job_role"], POSITION_MAP)
    education = decode_scalar(pers["education_level"], EDUCATION_MAP_CODES)
    nature = decode_scalar(inst["institution_nature"], NATURE_MAP)
    puhui = decode_scalar(inst["is_puhui"].cast("string"), PUHUI_MAP)
    salary = decode_scalar(pos["salary_range"], SALARY_MAP)

    header = F.concat_ws(
        " | ",
        F.concat(F.lit("城市："), F.coalesce(city, F.lit("N/A"))),
        F.concat(F.lit("岗位："), F.coalesce(position, F.lit("N/A"))),
        F.concat(F.lit("学历："), F.coalesce(education, F.lit("N/A"))),
    )

    modes = F.when(
        inst["service_modes"].isNotNull(),
        F.concat_ws(", ", decode_array(inst["service_modes"], {})),
    )
    scale = F.when(
        inst["total_capacity"].isNotNull(),
        F.concat(F.lit("托位 "), inst["total_capacity"].cast("string")),
    )
    matrix = F.when(
        pos["satisfaction_matrix"].isNotNull(),
        F.concat_ws(
            "\n",
            F.transform(
                F.map_entries(
                    decode_matrix(pos["satisfaction_matrix"], COMPETENCY_ROWS, COMPETENCY_COLS)
                ),
                lambda e: F.concat(F.lit("- "), e["key"], F.lit(": **"), e["value"], F.lit("**")),
            ),
        ),
    )
    channels = F.when(
        emp["recruitment_channels"].isNotNull(),
        F.concat_ws(", ", emp["recruitment_channels"]),
    )
    shortage = F.when(
        emp["shortage_positions"].isNotNull(),
        F.concat_ws(
            "\n",
            F.transform(
                emp["shortage_positions"],
                lambda p: F.concat(
                    F.lit("- "),
                    decode_scalar(p["position"], POSITION_MAP),
                    F.lit(": "),
                    F.coalesce(p["shortage_level"], F.lit("")),
                ),
            ),
        ),
    )

    body = F.concat_ws(
        "\n",
        F.filter(
            F.array(
                F.lit("## 1. 机构信息"),
                _line("性质", nature),
                _line("普惠", puhui),
                _line("服务模式", modes),
                _line("规模", scale),
                F.lit("\n## 2. 受访者画像"),
                _line("学历", education),
                _line("专业", pers["major"]),
                _line("当前岗位", position),
                _line("薪资范围", salary),
                F.when(channels.isNotNull(), F.concat(F.lit("\n## 3. 用工情况\n- **招聘渠道**: "), channels)),
                F.when(shortage.isNotNull(), F.concat(F.lit("### 紧缺岗位\n"), shortage)),
                F.when(matrix.isNotNull(), F.concat(F.lit("\n### 素质素养要求\n"), matrix)),
                F.when(
                    mgr["staff_count"].isNotNull(),
                    F.concat(F.lit("\n## 4. 管理视角\n- **员工数**: "), mgr["staff_count"].cast("string")),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
    )

    markdown = F.concat(header, F.lit("\n\n"), body)

    # flat metadata map, empty values dropped (extract_metadata :443-447)
    meta_entries = [
        ("city", city),
        ("org_nature", nature),
        ("is_puhui", puhui),
        ("education", education),
        ("major", pers["major"]),
        ("position", position),
        ("salary_range", salary),
    ]
    metadata = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k, _ in meta_entries]),
            F.array(*[v.cast("string") for _, v in meta_entries]),
        ),
        lambda _, v: v.isNotNull() & (v != ""),
    )
    return df.withColumn("markdown", markdown).withColumn("metadata", metadata)
