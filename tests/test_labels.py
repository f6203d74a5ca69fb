"""Code→label decoding (J3) — scalar, array, and matrix forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.labels import (
    decode_array,
    decode_matrix,
    decode_scalar,
)

OPTS = {"1": "是", "2": "否"}
ROWS = {"r1": "工资", "r2": "福利"}
COLS = {"c1": "满意", "c2": "不满意"}


def test_decode_scalar_with_passthrough(spark):
    df = spark.createDataFrame([("1",), ("2",), ("99",)], "code string")
    got = [r["v"] for r in df.select(decode_scalar("code", OPTS).alias("v")).collect()]
    assert got == ["是", "否", "99"]


def test_decode_array(spark):
    df = spark.createDataFrame([(["1", "2", "x"],)], "codes array<string>")
    got = df.select(decode_array("codes", OPTS).alias("v")).first()["v"]
    assert got == ["是", "否", "x"]


def test_decode_matrix(spark):
    df = spark.createDataFrame(
        [({"r1": "c1", "r2": "c2", "rx": "cx"},)], "m map<string,string>"
    )
    got = df.select(decode_matrix("m", ROWS, COLS).alias("v")).first()["v"]
    assert got == {"工资": "满意", "福利": "不满意", "rx": "cx"}
