"""`^_^`-separated key-value corpus reader (SURVEY.md §1.1 shape 1).

The reference writes flat text corpora: one record per block of
`key：value` lines, blocks joined by the literal `^_^`
(moe_majors_scraper.py:171; parsed back by retrieve.py:909-974).

Spark-first: ``spark.read.text`` with ``lineSep='^_^'`` yields ONE ROW
PER RECORD straight off the scan — no wholetext file slurp, so a
100 TB corpus splits normally across executors and never materializes
a file in one task. Parsing is `str_to_map`-style pure column work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.text import (
    extract_major_code,
    extract_major_name,
    kv_block_to_map,
)
from data_pipeline_childcare_spark.functions.dates import parse_ts_multi
from data_pipeline_childcare_spark.operators.rules import record_type_col

RECORD_SEP = "^_^"


def read_record_blocks(
    spark: SparkSession, path: str, with_file: bool = True
) -> DataFrame:
    """path (file/dir/glob of corpus .txt) → (block [, src_file])."""
    df = spark.read.option("lineSep", RECORD_SEP).text(path)
    df = df.select(F.trim(F.col("value")).alias("block")).filter(F.col("block") != "")
    if with_file:
        df = df.withColumn("src_file", F.input_file_name())
    return df


def parse_blocks(blocks: DataFrame, block_col: str = "block") -> DataFrame:
    """block text → (rec MAP<k,v>, record_type) via content sniffing
    (auto_parse, retrieve.py:976-986)."""
    rec = kv_block_to_map(F.col(block_col))
    return blocks.withColumn("rec", rec).withColumn("record_type", record_type_col(F.col("rec")))


def _g(field: str) -> Column:
    return F.col("rec").getItem(field)


def institution_records(parsed: DataFrame) -> DataFrame:
    """Typed projection → INSTITUTION_SCHEMA columns
    (fields per data/split_txts_by_year/*.txt:1-7)."""
    return parsed.filter(F.col("record_type") == "institution").select(
        _g("机构名称").alias("name"),
        _g("别名").alias("alias"),
        _g("统一社会信用代码").alias("credit_code"),
        _g("机构类型").alias("institution_type"),
        _g("详细地址").alias("address"),
        parse_ts_multi(_g("备案及完成时间")).alias("registered_at"),
        _g("区域编号").alias("region_code"),
    )


def moe_records(parsed: DataFrame) -> DataFrame:
    """Typed projection → MOE_SCHEMA columns (moe_majors_scraper.py:
    149-157; major name/(code) split per retrieve.py:951-959)."""
    return parsed.filter(F.col("record_type") == "moe").select(
        _g("机构名称").alias("school_name"),
        _g("省份").alias("province"),
        _g("学校标识码").alias("school_code"),
        extract_major_name(_g("开设专业")).alias("major_name"),
        extract_major_code(_g("开设专业")).alias("major_code"),
        _g("修业年限").alias("duration"),
        _g("年份").cast("int").alias("year"),
        _g("备注").alias("remark"),
    )


def write_record_blocks(
    df: DataFrame, path: str, text_col: str = "block", partition_cols: list[str] | None = None
) -> None:
    """Inverse sink (reference S20): text rows out as `^_^`-joined
    files, optionally partitioned per key (vs. the reference's
    hand-grouped per-province files)."""
    w = df.select(F.col(text_col).alias("value"), *(partition_cols or []))
    writer = w.write.mode("overwrite").option("lineSep", RECORD_SEP)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.text(path)
