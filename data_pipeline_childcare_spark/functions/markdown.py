"""Markdown image-reference handling (SURVEY.md §2.1 S15, §2.3 J6).

The reference extracts embedded images, uploads them, and rewrites
`data:` URIs / local refs to served URLs (多数据源获取数据.py:352-445,
1078-1178), matching filenames case-insensitively with and without
extension (J6, :1156-1177). The upload itself is a side-effect sink
(connector concern); the dataflow parts — ref extraction, the ≤25 cap,
and the rewrite joins — are pure column ops here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IMG_RE = r"!\[[^\]]*\]\(([^)\s]+)[^)]*\)"

MAX_IMAGE_REFS = 25  # reference cap (多数据源获取数据.py:571)


def extract_image_refs(col: Column | str, cap: int = MAX_IMAGE_REFS) -> Column:
    """All markdown image URLs in reading order, capped → ARRAY<STRING>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(F.regexp_extract_all(c, F.lit(_IMG_RE), 1), 1, cap)


def _name_key(url: Column) -> Column:
    """Case-insensitive basename without extension (J6 match key)."""
    base = F.element_at(F.split(url, "/"), -1)
    return F.lower(F.regexp_replace(base, r"\.[A-Za-z0-9]+$", ""))


def rewrite_image_refs(
    docs: DataFrame,
    uploads: DataFrame,
    text_col: str = "text",
    name_col: str = "filename",
    url_col: str = "served_url",
) -> DataFrame:
    """Rewrite local/inline image refs to uploaded URLs.

    ``uploads`` is a small (filename, served_url) dim: it becomes a
    literal replacement pass via an exploded broadcast join — one
    narrow projection over the docs, the uploads side broadcast.
    """
    up = uploads.select(
        _name_key(F.col(name_col)).alias("_key"), F.col(url_col).alias("_served")
    )
    refs = docs.select(
        "*", F.explode_outer(extract_image_refs(F.col(text_col))).alias("_ref")
    ).withColumn("_ref_key", _name_key(F.col("_ref")))
    joined = refs.join(F.broadcast(up), refs["_ref_key"] == up["_key"], "left")
    # fold the per-doc (ref → served) pairs back and apply them with
    # replace — aggregate(map) keeps the whole rewrite in one pass
    group_cols = [c for c in docs.columns]
    pairs = joined.groupBy(*group_cols).agg(
        F.collect_list(
            F.when(
                F.col("_served").isNotNull(), F.struct(F.col("_ref"), F.col("_served"))
            )
        ).alias("_repl")
    )
    rewritten = F.aggregate(
        F.col("_repl"),
        F.col(text_col),
        lambda acc, r: F.replace(acc, r["_ref"], r["_served"]),
    )
    return pairs.withColumn(text_col, rewritten).drop("_repl")


def drop_image_refs(col: Column | str) -> Column:
    """Strip all markdown image tags (the reference's dead-ref removal
    P13, minus the network validation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"!\[[^\]]*\]\([^)]*\)", "")
