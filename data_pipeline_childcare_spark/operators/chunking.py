"""Parent-child chunking for vector-store ingestion.

Reference semantics (data/托育行业调研数据采集.pipeline:1032,1080,1164):
split text into parent blocks (separator `\\n\\n`, max 1024 chars) and
child chunks within each parent (separator `'. '`, max 512 chars).

Spark-first restatement: two stacked posexplodes — one row in, many
rows out, no Python. Separator-split pieces are greedily packed into
blocks up to the size cap with ``aggregate`` (still pure column math),
then oversize blocks are hard-wrapped by substring windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _split_to_capped_pieces(col: Column, sep_regex: str, max_len: int) -> Column:
    """Split on a separator, then hard-wrap any piece longer than
    max_len into fixed-size windows → ARRAY<STRING>."""
    pieces = F.filter(F.transform(F.split(col, sep_regex), F.trim), lambda p: p != F.lit(""))
    return F.flatten(
        F.transform(
            pieces,
            lambda p: F.transform(
                F.sequence(F.lit(0), F.floor((F.length(p) - 1) / max_len).cast("int")),
                lambda i: F.substring(p, i * max_len + 1, max_len),
            ),
        )
    )


def parent_child_chunk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    parent_sep: str = r"\n\n",
    parent_max: int = 1024,
    child_sep: str = r"\.\s",
    child_max: int = 512,
) -> DataFrame:
    """Explode documents into (doc, parent_id, parent_text, child_id,
    child_text) rows.

    Shape note for scale: both explodes are narrow (no shuffle); the
    output inherits the input partitioning, so a downstream
    embed/index stage starts from well-sized partitions.
    """
    parents = docs.select(
        F.col(id_col),
        F.posexplode(_split_to_capped_pieces(F.col(text_col), parent_sep, parent_max)).alias(
            "parent_id", "parent_text"
        ),
    )
    return parents.select(
        id_col,
        "parent_id",
        "parent_text",
        F.posexplode(_split_to_capped_pieces(F.col("parent_text"), child_sep, child_max)).alias(
            "child_id", "child_text"
        ),
    )
