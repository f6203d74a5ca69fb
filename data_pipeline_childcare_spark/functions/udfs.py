"""Python/pandas UDFs — the quarantined slow path.

Only semantics that built-in column expressions genuinely cannot
express live here (SURVEY.md §2.10): robust JSON extraction/repair of
LLM output (reference 数据提取.py:133-247) and markdown-fenced JSON
extraction (dify_transformation.py:21-26). Everything is Arrow-batched
(pandas UDF), never row-at-a-time.

The reference depends on the ``json_repair`` package; this is a
self-contained re-implementation of the behaviors the reference
actually exercises: fenced-block stripping, double-escape decoding,
balanced-span candidate extraction, trailing-comma/quote repair, and
largest-candidate selection.
"""

from __future__ import annotations

import json
import re
from typing import Any

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FENCE_RE = re.compile(r"```(?:json|JSON|echarts)?\s*(.*?)```", re.DOTALL)


def strip_code_fences(s: str) -> str:
    """Prefer the content of a ```json fenced block when present."""
    m = _FENCE_RE.search(s)
    return m.group(1).strip() if m else s


def _decode_double_escaped(s: str) -> str:
    """`{\\"k\\": 1}` → `{"k": 1}` via a JSON string-literal round trip
    (reference 数据提取.py V3.3 preprocessing)."""
    if '\\"' not in s:
        return s
    try:
        tmp = s.replace("\n", "\\n").replace("\r", "")
        decoded = json.loads(f'"{tmp}"')
        if isinstance(decoded, str) and decoded.strip().startswith(("{", "[")):
            return decoded
    except Exception:  # noqa: BLE001
        pass
    return s


def _balanced_spans(s: str) -> list[str]:
    """All top-level balanced {...} / [...] spans, string-aware."""
    spans: list[str] = []
    stack: list[str] = []
    start = -1
    in_str = False
    esc = False
    for i, ch in enumerate(s):
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
            continue
        if ch == '"':
            in_str = not in_str
            continue
        if in_str:
            continue
        if ch in "{[":
            if not stack:
                start = i
            stack.append(ch)
        elif ch in "}]":
            if stack and ((ch == "}" and stack[-1] == "{") or (ch == "]" and stack[-1] == "[")):
                stack.pop()
                if not stack:
                    spans.append(s[start : i + 1])
    return spans


_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")
_PY_LITERALS = [(re.compile(r"\bTrue\b"), "true"), (re.compile(r"\bFalse\b"), "false"), (re.compile(r"\bNone\b"), "null")]
_SINGLE_QUOTED_KEY_RE = re.compile(r"'([^'\\]*)'\s*:")


def _try_parse(candidate: str) -> Any | None:
    try:
        return json.loads(candidate)
    except Exception:  # noqa: BLE001
        pass
    fixed = _TRAILING_COMMA_RE.sub(r"\1", candidate)
    for pat, rep in _PY_LITERALS:
        fixed = pat.sub(rep, fixed)
    fixed = _SINGLE_QUOTED_KEY_RE.sub(r'"\1":', fixed)
    try:
        return json.loads(fixed)
    except Exception:  # noqa: BLE001
        return None


def extract_json(raw: str | None) -> Any | None:
    """Best-effort extraction of the most significant JSON value from
    noisy LLM output: fences stripped, double escapes decoded, all
    balanced spans parsed, the LARGEST (by serialized length) wins —
    reference 数据提取.py's candidate-selection rule."""
    if raw is None:
        return None
    s = strip_code_fences(str(raw).strip())
    s = _decode_double_escaped(s)
    if not s:
        return None
    direct = _try_parse(s)
    if direct is not None and isinstance(direct, (dict, list)):
        return direct
    best: Any | None = None
    best_len = -1
    for span in _balanced_spans(s):
        parsed = _try_parse(span)
        if parsed is None:
            continue
        ser = len(json.dumps(parsed, ensure_ascii=False))
        if ser > best_len:
            best, best_len = parsed, ser
    return best


def _repair_batch(raw: pd.Series) -> pd.Series:
    def one(v: str | None) -> str | None:
        parsed = extract_json(v)
        return None if parsed is None else json.dumps(parsed, ensure_ascii=False, sort_keys=True)

    return raw.map(one)


def repair_json_str(col):
    """Arrow-batched repair: noisy text → canonical JSON string (null
    when nothing parseable). Compose with ``from_json`` downstream so
    the schema projection stays JVM-side. (The udf object is built
    lazily — pandas_udf needs an active session to parse its type.)"""
    return pandas_udf(_repair_batch, "string")(col)


def parse_json_column(col, schema: str):
    """repair + from_json in one step: the Python batch only
    canonicalizes text; the typed projection runs in the JVM."""
    return F.from_json(repair_json_str(col), schema)
