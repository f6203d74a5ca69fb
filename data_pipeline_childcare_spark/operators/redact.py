"""PII detection/redaction for training corpora (beyond-reference).

Standard pre-training hygiene: find and mask emails, phone numbers
and national-id numbers before a corpus ships to training. All
patterns are RE2-compatible (no lookaround, no backreferences) so the
SAME regex runs in Spark's Java engine, DuckDB's RE2 oracle, and any
other engine — counts and redacted text match bit for bit.

Everything is built-in `regexp_extract_all` / `regexp_replace`
column expressions: JVM-side, codegen-friendly, one narrow pass over
the text column, no shuffle at all (embarrassingly parallel at any
scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns, ordered most-specific first so replacement
# cascades can't double-mask (an id-card digit run would otherwise
# partially match the phone pattern).
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative charset, no quoted-locals
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # PRC resident id: 17 digits + check digit (digit or X)
    "idcard": r"[0-9]{17}[0-9Xx]",
    # PRC mobile: 1[3-9] + 9 digits
    "phone": r"1[3-9][0-9]{9}",
}


def pii_counts(text_col: Column | str) -> list[Column]:
    """One count column per PII class (leftmost non-overlapping match
    semantics — identical in Java regex and RE2 for these patterns).

    Counts CASCADE like redaction does: each pattern counts on text
    with the more-specific earlier patterns already masked, so an
    id-card digit run can't also count as a phone number — counts and
    redaction always agree."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # BIGINT counts: engines disagree on count-int widths (Spark size()
    # is int32, DuckDB len() is int64) and value-hash gates see dtypes
    out = []
    for name, pat in PII_PATTERNS.items():
        out.append(
            F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        )
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return out


def redact_text(text_col: Column | str) -> Column:
    """Mask every PII class with a typed placeholder, most-specific
    patterns first."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return c


def scrub_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_email, n_idcard, n_phone, redacted_len): per-document
    PII inventory plus the post-redaction length — the audit frame a
    corpus release pipeline records."""
    return df.select(
        F.col(id_col),
        *pii_counts(text_col),
        F.length(redact_text(text_col)).cast("long").alias("redacted_len"),
    )


def pii_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB oracle twin of :func:`scrub_pii`, emitted from the same
    pattern table."""
    count_parts, stage = [], text_col
    for name, pat in PII_PATTERNS.items():
        count_parts.append(f"len(regexp_extract_all({stage}, '{pat}')) AS n_{name}")
        stage = f"regexp_replace({stage}, '{pat}', '[{name.upper()}]', 'g')"
    counts = ",\n                   ".join(count_parts)
    redacted = stage
    return f"""
            SELECT {id_col},
                   {counts},
                   length({redacted}) AS redacted_len
            FROM {table}
    """
