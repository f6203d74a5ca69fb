"""MOE registry HTML table extraction (SURVEY.md §2.1 S3).

The reference regex-scrapes `<tr class="table_list">` rows and their
`<td>` cells into 7-column records (moe_majors_scraper.py:55-70).
Spark-first restatement: the fetched page HTML is a column; row/cell
extraction is `regexp_extract_all` + `transform` — the whole parse
compiles to JVM column expressions, one narrow pass per page, so a
million fetched pages parse at scan speed with no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROW_RE = r'(?s)<tr[^>]*class="table_list"[^>]*>(.*?)</tr>'
_CELL_RE = r"(?s)<td[^>]*>(.*?)</td>"

MOE_COLUMNS = (
    "province",
    "major_code",
    "major_name",
    "school_code",
    "school_name",
    "duration",
    "remark",
)


def _clean_cell(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"<[^>]+>", ""))


def extract_moe_rows(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(… , html) → one row per registry record with the 7 projected
    columns; rows with fewer than 7 cells are dropped (reference
    guard, :61)."""
    rows = F.regexp_extract_all(F.col(html_col), F.lit(_ROW_RE), 1)
    exploded = pages.withColumn("_row_html", F.explode(rows))
    cells = F.transform(
        F.regexp_extract_all(F.col("_row_html"), F.lit(_CELL_RE), 1), _clean_cell
    )
    keep = [c for c in pages.columns if c != html_col]
    return (
        exploded.withColumn("_cells", cells)
        .filter(F.size("_cells") >= 7)
        .select(
            *keep,
            *[F.col("_cells").getItem(i).alias(name) for i, name in enumerate(MOE_COLUMNS)],
        )
    )


def moe_rows_to_rag_blocks(rows: DataFrame, year_col: str = "year") -> DataFrame:
    """Records → the kv text block the corpus stores (rag_block,
    moe_majors_scraper.py:149-157): ready for write_record_blocks."""
    block = F.concat_ws(
        "\n",
        F.concat(F.lit("机构名称："), F.col("school_name")),
        F.concat(F.lit("省份："), F.col("province")),
        F.concat(F.lit("学校标识码："), F.col("school_code")),
        F.concat(
            F.lit("开设专业："), F.col("major_name"), F.lit(" ("), F.col("major_code"), F.lit(")")
        ),
        F.concat(F.lit("修业年限："), F.col("duration")),
        F.concat(F.lit("年份："), F.col(year_col).cast("string")),
        F.concat(F.lit("备注："), F.coalesce(F.col("remark"), F.lit("无"))),
    )
    return rows.withColumn("block", block)
