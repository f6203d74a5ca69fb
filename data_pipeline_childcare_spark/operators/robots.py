"""robots.txt exclusion filtering — the compliance pass between a
crawl frontier and the fetcher, and the third leg of the crawl stack
next to WARC ingestion (sources/warc.py) and URL canonicalization
(functions/urls.py).

Semantics (REP, RFC 9309 / Google's documented matcher):
- rules are (host, agent, directive, pattern) rows parsed from each
  host's robots.txt body;
- a URL is judged by the MOST SPECIFIC matching rule — longest
  pattern wins; on a length tie, allow beats disallow;
- patterns match from the start of the path, ``*`` matches any run,
  a trailing ``$`` anchors the end;
- no matching rule (or no rules for the host) → allowed;
- group selection: rules for the literal agent plus the ``*`` group,
  with the literal agent's rules preferred when any exist for a host.

Scale shape: robots rules are host-sized (a few hundred rows per
host, thousands of hosts → comfortably broadcast); the judgment is a
broadcast join keyed by host + one (url)-keyed window for the
most-specific-rule argmax. URLs never self-join.

Pattern → regex conversion escapes every regex metacharacter except
``*``/``$`` so the same regex evaluates identically in Spark (Java
regex) and the DuckDB oracle (RE2).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROBOTS_RULES_SCHEMA = "host string, agent string, directive string, pattern string"


def parse_robots_txt(host: str, body: str) -> list[tuple[str, str, str, str]]:
    """One robots.txt body → (host, agent, directive, pattern) rows.
    Group structure per REP: consecutive ``User-agent`` lines open a
    group that the following allow/disallow lines belong to; comments
    and unknown directives are ignored; an empty Disallow means
    "allow everything" and emits no rule; allow/disallow lines BEFORE
    any User-agent line belong to no group and are ignored
    (RFC 9309 §2.2 — a stray leading Disallow must not blanket-block
    the host)."""
    rules: list[tuple[str, str, str, str]] = []
    agents: list[str] = []
    last_was_agent = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                agents = []
            agents.append(val.lower())
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            if not val:
                continue
            # rules OUTSIDE any User-agent group are ignored per
            # RFC 9309 §2.2 (a leading stray Disallow must not
            # blanket-block the host for every agent)
            for agent in agents:
                rules.append((host, agent, key, val))
        else:
            last_was_agent = False
    return rules


def robots_pattern_regex(pattern: str) -> str:
    """robots pattern → anchored regex usable in BOTH Java regex and
    RE2: metacharacters escaped, ``*`` → ``.*``, trailing ``$`` kept
    as the end anchor."""
    anchored_end = pattern.endswith("$")
    core = pattern[:-1] if anchored_end else pattern
    out = []
    for ch in core:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.^$+?()[]{}|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored_end else "")


def rules_to_df(spark, rules: list[tuple[str, str, str, str]]) -> DataFrame:
    return spark.createDataFrame(rules, ROBOTS_RULES_SCHEMA)


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
    dedupe_input: bool = False,
) -> DataFrame:
    """Attach the robots verdict to every URL row: ``allowed`` boolean
    plus the winning rule's directive/pattern (NULL when no rule
    matched). The pattern→regex conversion is pure column expressions
    (no UDF), the column twin of :func:`robots_pattern_regex`.

    **Precondition: ``urls`` rows must be distinct.** The winning-rule
    selection is a row_number window keyed by all url columns, so
    duplicate frontier rows would silently collapse to one output row
    each. Pass ``dedupe_input=True`` to have the operator
    ``dropDuplicates()`` the frontier itself (an extra keyed exchange)
    when the caller can't guarantee distinctness."""
    if dedupe_input:
        urls = urls.dropDuplicates()
    agent = agent.lower()
    r = rules.filter(F.lower(F.col("agent")).isin(agent, "*"))
    if "pattern_re" not in r.columns:
        ends = F.col("pattern").endswith("$")
        core = F.when(
            ends, F.expr("substring(pattern, 1, length(pattern) - 1)")
        ).otherwise(F.col("pattern"))
        esc = F.regexp_replace(core, r"([.^$+?()\[\]{}|\\])", r"\\$1")
        star = F.replace(esc, F.lit("*"), F.lit(".*"))
        r = r.withColumn(
            "pattern_re",
            F.concat(F.lit("^"), star, F.when(ends, F.lit("$")).otherwise(F.lit(""))),
        )
    # literal-agent group preferred per host when it exists
    has_specific = (
        r.filter(F.lower(F.col("agent")) == agent)
        .select(F.col("host").alias("_h"))
        .distinct()
    )
    r = (
        r.join(F.broadcast(has_specific), r["host"] == has_specific["_h"], "left")
        .filter(
            (F.lower(F.col("agent")) == agent)
            | F.col("_h").isNull()  # no specific group → '*' applies
        )
        .drop("_h")
    )
    # underscore-prefixed rule columns so a frontier frame carrying
    # its own "directive"/"pattern" columns can't collide
    joined = urls.join(
        F.broadcast(
            r.select(
                F.col("host").alias("_rhost"),
                F.col("directive").alias("_rdir"),
                F.col("pattern").alias("_rpat"),
                F.col("pattern_re").alias("_rre"),
                F.length("pattern").alias("_plen"),
            )
        ),
        (F.col(host_col) == F.col("_rhost"))
        & F.rlike(F.col(path_col), F.col("_rre")),
        "left",
    )
    # NOTE: the window is keyed by the url columns, so duplicate url
    # rows collapse to one output row — urls must be distinct (the
    # documented precondition)
    w = Window.partitionBy(*urls.columns).orderBy(
        F.desc("_plen"),
        F.when(F.col("_rdir") == "allow", 0).otherwise(1),  # tie → allow
        "_rpat",
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *urls.columns,
            (F.col("_rdir").isNull() | (F.col("_rdir") == "allow")).alias("allowed"),
            F.col("_rdir").alias("matched_directive"),
            F.col("_rpat").alias("matched_pattern"),
        )
    )
