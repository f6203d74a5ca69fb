"""Differential-privacy release operators — the governance family's
third leg (k-anonymity audits what a table leaks, GDPR deletion
propagates erasure, this RELEASES aggregates with calibrated noise).

Mechanism: the two-sided geometric (discrete Laplace) mechanism of
Ghosh-Roughgarden-Sundararajan 2009 — the integer-valued ε-DP
mechanism for counting queries: P(Z = z) ∝ exp(−ε·|z|). Sampling is
inverse-CDF against a table quantized to integer micros and BAKED
INTO THE PLAN as a CASE chain, with the uniform draw taken from the
portable md5 hash of (salt, group key). That makes the release
deterministic per (salt, key) — a SEEDED release, the property that
lets the DuckDB twin hash-match bit-exactly and lets a re-run of the
pipeline reproduce its published numbers. A production deployment
would swap the salt for a fresh secret per release epoch; the
mechanism, sensitivity accounting and suppression logic are
identical.

The standard release pipeline is noise + threshold: noisy counts
below the suppression threshold are dropped (they are mostly noise
and would otherwise leak presence). For sums, per-row contributions
are CLIPPED to a bound first (contribution bounding — the
sensitivity is the clip bound, and the noise scale is ε/bound).

Scale shape: one map-side-combinable keyed aggregate over any corpus
size; the noise CASE chain is pure column arithmetic on the
group-sized result. No joins, no windows, no UDFs.

Reference parity: beyond-reference (the brief's governance family);
complements plans/governance.py and operators/redact.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def two_sided_geometric_table(epsilon: float, bound: int | None = None) -> list[tuple[int, int]]:
    """Quantized inverse CDF of the two-sided geometric mechanism:
    [(cum_threshold_u, z)] — a uniform micro-draw u < threshold maps
    to the FIRST row whose cumulative mass exceeds u. Tail mass
    beyond ±bound is folded into the extremes (clamping — the
    bounded-noise variant, which keeps released values within a
    published range). bound defaults to ceil(ln(1e6)/ε): tail mass
    below one micro-unit."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    if bound is None:
        bound = max(1, math.ceil(math.log(1e6) / epsilon))
    alpha = math.exp(-epsilon)
    p0 = (1 - alpha) / (1 + alpha)
    masses = [(z, p0 * alpha ** abs(z)) for z in range(-bound, bound + 1)]
    # fold the (symmetric) clipped tails into the extremes
    tail = alpha ** (bound + 1) / (1 + alpha)
    masses[0] = (-bound, masses[0][1] + tail)
    masses[-1] = (bound, masses[-1][1] + tail)
    out, cum = [], 0.0
    for z, m in masses:
        cum += m
        out.append((min(MICRO, math.floor(cum * MICRO + 0.5)), z))
    out[-1] = (MICRO, bound)  # exact total mass despite quantization
    return out


def noise_case_sql(u_expr: str, epsilon: float, bound: int | None = None) -> str:
    """The CASE chain both engines evaluate verbatim: map a micro
    uniform draw ``u_expr`` ∈ [0, 1e6) to a noise value via the
    quantized inverse CDF."""
    table = two_sided_geometric_table(epsilon, bound)
    branches = "\n".join(
        f"WHEN {u_expr} < {thr} THEN {z}" for thr, z in table[:-1]
    )
    return f"(CASE {branches} ELSE {table[-1][1]} END)"


def uniform_draw_sql(key_expr: str, salt: str) -> str:
    """Portable micro-uniform draw: the md5-prefix hash used across
    the engine, reduced mod 1e6. Identical text in both plans."""
    return (
        f"(cast(conv(substring(md5(concat('{salt}', ':', {key_expr})), 1, 15), 16, 10) "
        f"as bigint) % {MICRO})"
    )


def uniform_draw_duckdb(key_expr: str, salt: str) -> str:
    """The DuckDB spelling of :func:`uniform_draw_sql` (no conv();
    hex-prefix cast instead — same 60-bit value, same residue)."""
    return (
        f"(CAST(CONCAT('0x', substring(md5(CONCAT('{salt}', ':', {key_expr}))"
        f", 1, 15)) AS BIGINT) % {MICRO})"
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp-release-1",
    suppress_below: int = 0,
) -> DataFrame:
    """ε-DP histogram release → (group..., noisy_count, epsilon_u):
    exact keyed counts + seeded two-sided-geometric noise, then the
    suppression threshold. Sensitivity of a histogram under
    add/remove-one is 1, so the mechanism is ε-DP as parameterized."""
    key = "concat_ws('|#|', " + ", ".join(f"cast(`{c}` as string)" for c in group_cols) + ")"
    u = uniform_draw_sql(key, salt)
    z = noise_case_sql(u, epsilon)
    agg = df.groupBy(*group_cols).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    out = agg.select(
        *group_cols,
        (F.col("_c") + F.expr(z)).cast("long").alias("noisy_count"),
        F.lit(int(round(epsilon * MICRO))).cast("long").alias("epsilon_u"),
    )
    if suppress_below > 0:
        out = out.filter(F.col("noisy_count") >= suppress_below)
    return out


def dp_noisy_sum(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    clip: int,
    epsilon: float = 1.0,
    salt: str = "dp-release-1",
) -> DataFrame:
    """ε-DP clipped-sum release → (group..., noisy_sum,
    clip_bound, epsilon_u). Each row's value is rounded to the
    nearest integer and clipped to [0, clip] (contribution
    bounding); the sum's sensitivity is then ``clip``, so the noise
    is two-sided geometric with parameter ε/clip, scale-calibrated
    the way the Laplace mechanism is for bounded sums."""
    if clip <= 0:
        raise ValueError(f"clip bound must be positive, got {clip}")
    key = "concat_ws('|#|', " + ", ".join(f"cast(`{c}` as string)" for c in group_cols) + ")"
    u = uniform_draw_sql(key, salt + ":sum")
    z = noise_case_sql(u, epsilon / clip)
    v = F.least(
        F.lit(clip).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(F.col(value_col) + F.lit(0.5))),
    )
    agg = df.groupBy(*group_cols).agg(F.sum(v).cast("long").alias("_s"))
    return agg.select(
        *group_cols,
        (F.col("_s") + F.expr(z)).cast("long").alias("noisy_sum"),
        F.lit(clip).cast("long").alias("clip_bound"),
        F.lit(int(round(epsilon * MICRO))).cast("long").alias("epsilon_u"),
    )
