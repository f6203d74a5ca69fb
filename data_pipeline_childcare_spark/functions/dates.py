"""Date/time scalar functions.

Re-expresses the reference's multi-format date layer (SURVEY.md §2.8):
  - multi-format normalization `YYYY-MM-DD` / `/` / `.` / `年月日` /
    `YYYYMMDD` (多数据源获取链接.py:29-58)
  - relative dates "N天/周/月/年前" (多数据源获取链接.py:61-95)
  - two-format registration timestamps (retrieve.py:1329-1345)
  - seconds → MM:SS (dify_transformation.py:93-103)
  - time-filter expressions "近三年", explicit ranges, bare years
    (retrieve.py:1280-1326) — parsed driver-side into plan literals.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_DATE_FORMATS = [
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "yyyy.MM.dd",
    "yyyy年MM月dd日",
    "yyyyMMdd",
    "yyyy-M-d",
    "yyyy/M/d",
]

_TS_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy年MM月dd日 HH:mm:ss",
]


def parse_date_multi(col: Column | str) -> Column:
    """First-success multi-format date parse → DATE (null when none fit)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)).cast("date") for fmt in _DATE_FORMATS])


def parse_ts_multi(col: Column | str) -> Column:
    """Registration-timestamp parse: `YYYY-MM-DD HH:MM:SS` then date-only
    (reference retrieve.py:1329-1345)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in _TS_FORMATS])


def relative_date(col: Column | str, anchor: Column | None = None) -> Column:
    """Resolve `N天前 / N周前 / N个月前 / N年前` relative expressions.

    Reference semantics (多数据源获取链接.py:61-95): months = 30 days,
    years = 365 days. ``anchor`` defaults to current_date() but should be
    pinned to a literal in tests/oracle comparisons.
    """
    c = F.col(col) if isinstance(col, str) else col
    base = anchor if anchor is not None else F.current_date()
    n = F.regexp_extract(c, r"(\d+)", 1).cast("int")
    unit = F.regexp_extract(c, r"\d+\s*(天|日|周|个月|月|年)", 1)
    days = (
        F.when(unit.isin("天", "日"), n)
        .when(unit == "周", n * 7)
        .when(unit.isin("个月", "月"), n * 30)
        .when(unit == "年", n * 365)
    )
    return F.when(days.isNotNull(), F.date_sub(base, days))


def seconds_to_mmss(col: Column | str) -> Column:
    """Float seconds → zero-padded `MM:SS` (dify_transformation.py:93-103)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.floor(c).cast("int")
    return F.format_string("%02d:%02d", (total / 60).cast("int"), total % 60)


# ---------------------------------------------------------------------------
# Driver-side time-filter expression parsing (plan literals, not columns)
# ---------------------------------------------------------------------------

_CN_NUM = {"一": 1, "二": 2, "两": 2, "三": 3, "四": 4, "五": 5, "六": 6, "七": 7, "八": 8, "九": 9, "十": 10}


def parse_time_filter(expr: str, today: dt.date | None = None) -> tuple[dt.datetime, dt.datetime] | None:
    """Parse a time-filter expression into a [start, end] datetime range.

    Mirrors reference retrieve.py:1280-1326:
      - "近三年" / "近3年"  → (Jan 1 of year-3, now)
      - "YYYY-MM-DD - YYYY-MM-DD" (separators -, ~, to, 至) → range
      - single date → (date, now)
      - bare year "2014" → full-year span
    Returns None when unparseable (⇒ no time predicate).
    """
    today = today or dt.date.today()
    now = dt.datetime.combine(today, dt.time(23, 59, 59))
    s = (expr or "").strip()
    if not s:
        return None

    m = re.match(r"^近\s*([一二两三四五六七八九十\d]+)\s*年$", s)
    if m:
        raw = m.group(1)
        n = int(raw) if raw.isdigit() else _CN_NUM.get(raw, 0)
        if n <= 0:
            return None
        return dt.datetime(today.year - n, 1, 1), now

    m = re.match(r"^(\d{4})$", s)
    if m:
        y = int(m.group(1))
        return dt.datetime(y, 1, 1), dt.datetime(y, 12, 31, 23, 59, 59)

    date_pat = r"(\d{4})[-/.年](\d{1,2})[-/.月](\d{1,2})日?"
    dates = re.findall(date_pat, s)
    if len(dates) >= 2 and re.search(r"[-~至]|to", s[len(dates[0][0]) :]):
        d1 = dt.datetime(*map(int, dates[0]))
        d2 = dt.datetime(*map(int, dates[1]), 23, 59, 59)
        return d1, d2
    if len(dates) == 1:
        d1 = dt.datetime(*map(int, dates[0]))
        return d1, now
    return None
