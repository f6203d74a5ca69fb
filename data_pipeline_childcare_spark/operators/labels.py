"""Code→label decoding (SURVEY.md §2.3 J3).

The reference decodes survey answer codes into human labels using
option maps and matrix row/col maps regex-parsed from a Vue form
config (transform_survey_data.py:68-101, format_survey_for_rag.py:
110-149). Values may be scalars, arrays of codes, or matrix maps
{row_code: col_code}.

Spark-first restatement: the maps are tiny dims → literal
``create_map`` expressions evaluated JVM-side (cheaper than a
broadcast join — zero exchange, inlined into codegen). Arrays decode
via ``transform``; matrices via ``transform_keys``+``transform_values``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lit_map(mapping: dict[str, str]) -> Column:
    entries = []
    for k, v in mapping.items():
        entries.append(F.lit(k))
        entries.append(F.lit(v))
    return F.create_map(*entries)


def decode_scalar(col: Column | str, mapping: dict[str, str], keep_unknown: bool = True) -> Column:
    """code → label; unknown codes pass through (reference keeps the
    raw value when no mapping matches)."""
    c = F.col(col) if isinstance(col, str) else col
    if not mapping:  # empty map literal is map<void,void> — passthrough
        return c if keep_unknown else F.lit(None).cast("string")
    m = _lit_map(mapping)
    decoded = m[c]
    return F.coalesce(decoded, c) if keep_unknown else decoded


def decode_array(col: Column | str, mapping: dict[str, str]) -> Column:
    """ARRAY<code> → ARRAY<label> (transform_survey_data.py:82-87)."""
    c = F.col(col) if isinstance(col, str) else col
    if not mapping:
        return c
    m = _lit_map(mapping)
    return F.transform(c, lambda x: F.coalesce(m[x], x))


def decode_matrix(
    col: Column | str, row_map: dict[str, str], col_map: dict[str, str]
) -> Column:
    """MAP<row_code,col_code> → MAP<row_label,col_label>
    (transform_survey_data.py:90-99)."""
    c = F.col(col) if isinstance(col, str) else col
    rm, cm = _lit_map(row_map), _lit_map(col_map)
    rekeyed = F.transform_keys(c, lambda k, _: F.coalesce(rm[k], k))
    return F.transform_values(rekeyed, lambda _, v: F.coalesce(cm[v], v))
