"""Rule-based predicate engine (the reference's check_rules).

Re-expresses retrieve.py:1356-1499 as composable Column builders over a
typed record DataFrame instead of per-dict Python:

- record-type dispatch (P2): materialized `record_type` column.
- major predicate (P3): substring containment, NOT equality.
- hierarchical region predicate (P4): rule scope parsed driver-side to
  (province, city); doc location resolved via broadcast gazetteer;
  city rule ⇒ exact city; province rule ⇒ province equality OR city ∈
  province; unparseable ⇒ raw substring fallback.
- education-level predicate (P5): normalize both sides via the
  education map, accept equality or bidirectional containment.
- MOE vocational gate (P6), school predicate scoped to MOE (P7).
- time-range predicate (P8): strict mode rejects dateless records when
  a time filter exists; questionnaires exempt from time filtering.

All predicates are Column expressions ⇒ Catalyst pushes them to the
scan where possible; the gazetteer/education lookups are driver-side
literal maps (tiny dims), so no join is needed at all — the cheapest
possible plan at any scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.dims import CHINA_REGIONS, EDUCATION_MAP, city_to_province
from data_pipeline_childcare_spark.functions.dates import parse_time_filter

_SUFFIX_RE = re.compile(r"(自治区|自治州|特别行政区|地区|省|市|区|县)$")


def _strip_suffix(name: str) -> str:
    s = _SUFFIX_RE.sub("", name)
    return s if len(s) >= 2 else name


def parse_location(scope: str) -> tuple[str | None, str | None, str | None]:
    """Parse a rule scope into (province, city, raw_fallback).

    Mirrors retrieve.py:1095-1152 including the 吉林 disambiguation:
    a bare "吉林" is treated as the PROVINCE (matching the reference's
    province-first probing); "吉林市" is the city.
    """
    s = (scope or "").strip()
    if not s:
        return None, None, None
    c2p = city_to_province()

    # explicit "province city" compound e.g. 四川省成都市
    for prov in CHINA_REGIONS:
        for pv in (prov + "省", prov + "市", prov):
            if s.startswith(pv) and len(s) > len(pv):
                rest = _strip_suffix(s[len(pv):])
                if rest in CHINA_REGIONS.get(prov, []):
                    return prov, rest, None
    base = _strip_suffix(s)
    if s.endswith("市") and base in c2p and base not in CHINA_REGIONS:
        return c2p[base], base, None
    if base in CHINA_REGIONS:
        # province-first: bare 吉林 / 北京 resolve as provinces
        return base, None, None
    if base in c2p:
        return c2p[base], base, None
    return None, None, s  # unparseable → substring fallback


@dataclass
class RegionalRule:
    """One filter rule (reference regional_rules entry)."""

    scope: str = ""
    level: str = ""
    major: str = ""
    school: str = ""
    time_filter: str = ""
    strict_time: bool = True
    extras: dict = field(default_factory=dict)


def region_predicate(location_col: Column, scope: str) -> Column:
    """Hierarchical region containment (P4) against a free-text location
    column (the record's 详细地址 / 省份)."""
    prov, city, raw = parse_location(scope)
    if raw is not None:
        return location_col.contains(raw)
    if city is not None:
        return location_col.contains(city)
    if prov is not None:
        cities = CHINA_REGIONS.get(prov, [])
        cond = location_col.contains(prov)
        for c in cities:
            cond = cond | location_col.contains(c)
        return cond
    return F.lit(True)


def _normalize_level(raw: str) -> str | None:
    if not raw:
        return None
    if raw in EDUCATION_MAP:
        return EDUCATION_MAP[raw]
    # longest-key containment (reference normalize_education,
    # retrieve.py:1197-1208)
    for key in sorted(EDUCATION_MAP, key=len, reverse=True):
        if key in raw:
            return EDUCATION_MAP[key]
    return None


def education_predicate(level_col: Column, required_level: str) -> Column:
    """Normalize both sides; accept equality or bidirectional substring
    containment (P5)."""
    req_norm = _normalize_level(required_level)
    if req_norm is None:
        return F.lit(True)
    entries = [F.struct(F.lit(k).alias("key"), F.lit(v).alias("value")) for k, v in EDUCATION_MAP.items()]
    m = F.map_from_entries(F.array(*entries))
    norm = F.coalesce(
        m[level_col],
        # containment fallback: first map key contained in the value,
        # longest keys first
        *[
            F.when(level_col.contains(k), F.lit(v))
            for k, v in sorted(EDUCATION_MAP.items(), key=lambda kv: -len(kv[0]))
        ],
    )
    return (
        (norm == req_norm)
        | norm.contains(req_norm)
        | F.lit(req_norm).contains(norm)
    )


def major_predicate(major_col: Column, required_major: str) -> Column:
    """Substring containment, not equality (P3)."""
    if not required_major:
        return F.lit(True)
    return major_col.isNotNull() & major_col.contains(required_major)


def school_predicate(name_col: Column, alias_col: Column | None, school: str) -> Column:
    """School substring in name/alias — MOE records only (P7)."""
    if not school:
        return F.lit(True)
    cond = name_col.contains(school)
    if alias_col is not None:
        cond = cond | alias_col.contains(school)
    return cond


def moe_vocational_gate(required_level: str) -> bool:
    """MOE records pass only when the requested level normalizes to
    高等职业教育（专科） (P6)."""
    return _normalize_level(required_level) == "高等职业教育（专科）"


def time_predicate(
    ts_col: Column, time_filter: str, strict: bool = True, exempt: Column | None = None
) -> Column:
    """Time-range predicate with strict-mode null rejection (P8).

    ``exempt`` (e.g. record_type == 'questionnaire') bypasses time
    filtering entirely, per the reference's questionnaire exemption.
    """
    rng = parse_time_filter(time_filter)
    if rng is None:
        return F.lit(True)
    lo, hi = rng
    # session-timezone-proof boundaries: F.lit(datetime) converts the
    # naive datetime through the DRIVER OS timezone, while the row
    # values (try_to_timestamp strings) parse in the SESSION timezone
    # — under a non-UTC harness session the two drift apart (found by
    # the full --hostile oracle gate: boundary rows flipped by 8h
    # under Asia/Shanghai). Parsing the boundary from a string keeps
    # both sides of the comparison in the same (session) frame, so
    # the predicate is invariant under ANY session timezone.
    in_range = ts_col.between(
        F.to_timestamp(F.lit(lo.strftime("%Y-%m-%d %H:%M:%S"))),
        F.to_timestamp(F.lit(hi.strftime("%Y-%m-%d %H:%M:%S"))),
    )
    base = in_range if strict else (ts_col.isNull() | in_range)
    if strict:
        base = ts_col.isNotNull() & in_range
    if exempt is not None:
        return exempt | base
    return base


def record_type_col(parsed_map: Column) -> Column:
    """Content-sniffing type dispatch (auto_parse, retrieve.py:976-986):
    MOE markers → moe; institution markers → institution; else survey."""
    has = parsed_map.getItem
    return (
        F.when(
            has("学校标识码").isNotNull() | (has("开设专业").isNotNull() & has("岗位").isNull()),
            F.lit("moe"),
        )
        .when(
            has("统一社会信用代码").isNotNull() & has("备案及完成时间").isNotNull(),
            F.lit("institution"),
        )
        .otherwise(F.lit("survey"))
    )


def check_rule(
    rule: RegionalRule,
    record_type: Column,
    location_col: Column,
    level_col: Column,
    major_col: Column,
    name_col: Column,
    alias_col: Column | None,
    ts_col: Column,
) -> Column:
    """Full rule conjunction with per-type applicability, composing the
    predicates exactly as retrieve.py:1356-1499 sequences them:

    - survey (questionnaire): major + scope + level; NEVER time-filtered.
    - MOE: major + school + scope, and the vocational gate — MOE records
      are usable ONLY when the rule requests a vocational level, so a
      rule with regional fields but no/non-vocational level rejects
      every MOE record (retrieve.py:1424-1441).
    - institution: scope + time only; major/level/school never apply
      (retrieve.py:1460-1462).
    """
    is_moe = record_type == "moe"
    is_survey = record_type == "survey"
    has_regional = bool(rule.scope or rule.level or rule.major or rule.school)

    cond = F.lit(True)
    if has_regional:
        if rule.scope:
            cond = cond & region_predicate(location_col, rule.scope)
        if rule.major:
            # survey + MOE only; institution records have no major field
            cond = cond & F.when(
                is_moe | is_survey, major_predicate(major_col, rule.major)
            ).otherwise(F.lit(True))
        if rule.level:
            # survey: normalized bidirectional containment; missing
            # education field rejects (reference: `if not edu: False`)
            cond = cond & F.when(
                is_survey, education_predicate(level_col, rule.level)
            ).otherwise(F.lit(True))
        # MOE vocational gate applies whenever regional rules exist,
        # even when no level was requested
        cond = cond & F.when(
            is_moe, F.lit(moe_vocational_gate(rule.level or ""))
        ).otherwise(F.lit(True))
        if rule.school:
            cond = cond & F.when(
                is_moe, school_predicate(name_col, alias_col, rule.school)
            ).otherwise(F.lit(True))
    if rule.time_filter:
        cond = cond & time_predicate(
            ts_col, rule.time_filter, strict=rule.strict_time, exempt=is_survey
        )
    return cond
