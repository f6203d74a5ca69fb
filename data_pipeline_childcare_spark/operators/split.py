"""Deterministic dataset splitting & sampling for training pipelines.

Both operators key off ``md5(salt || ':' || id)`` and compare the
first 8 hex characters as a STRING against precomputed hex
thresholds. Properties that matter at 100 TB:

- **Narrow.** Assignment is a pure projection — zero shuffles, zero
  state; it composes with any downstream partitioning.
- **Deterministic & engine-independent.** md5 is bit-identical
  everywhere (unlike ``rand(seed)``, which depends on partitioning,
  or engine-specific hash functions); re-running on re-partitioned /
  re-ordered data yields the same assignment, and a DuckDB/Trino/
  Spark consumer agrees on every row. Lexicographic order of
  lowercase hex equals numeric order, so thresholds are plain string
  literals computed once on the driver.
- **Salt = split identity.** A different salt draws an independent
  split; the same salt reproduces it forever (the property training
  pipelines need to avoid test-set leakage across runs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # first 8 md5 hex chars, uniform on [0, 16^8)


def _bucket_hex(id_col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))), 1, 8)


def _threshold_hex(fraction: float) -> str:
    return format(min(int(fraction * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given fractions.

    The last split absorbs the rounding tail (ELSE branch), so the
    fractions may sum to 1.0 exactly without boundary fuss.
    """
    if len(splits) < 2:
        raise ValueError("need at least two splits")
    hx = _bucket_hex(F.col(id_col), salt)
    cum = 0.0
    expr = None
    for name, frac in splits[:-1]:
        cum += frac
        cond = hx < F.lit(_threshold_hex(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(splits[-1][0])
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~``fraction`` sample, stable across runs, engines
    and partitionings (unlike ``DataFrame.sample``, whose output
    depends on the physical split of the input)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction == 1.0:
        return df
    hx = _bucket_hex(F.col(id_col), salt)
    return df.filter(hx < F.lit(_threshold_hex(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "event_type",
    id_col: str = "event_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling — ``DataFrame.sampleBy``
    semantics but reproducible across runs, engines and partitionings.
    Strata absent from ``fractions`` are dropped (like sampleBy).
    Still a pure projection+filter: the per-stratum threshold is a
    literal CASE, no shuffle, no state."""
    hx = _bucket_hex(F.col(id_col), salt)
    thr = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        lit = F.lit(_threshold_hex(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = thr.otherwise(F.lit("00000000"))
    return df.filter(hx < thr)


def hash_sample_flag(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
    out_col: str = "in_sample",
) -> DataFrame:
    """Membership flag form of ``hash_sample`` (keeps all rows)."""
    hx = _bucket_hex(F.col(id_col), salt)
    return df.withColumn(out_col, hx < F.lit(_threshold_hex(fraction)))


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str = "value",
    id_col: str = "event_id",
    salt: str = "es",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis exponential race): each row draws
    u = (hash + 1) / 2^32 from its id and wins priority
    r = -ln(u) / weight; the n smallest r are the sample. Heavier
    rows win proportionally more often, yet the draw is a pure
    projection — reproducible across runs, engines and partitionings.

    u is EXACTLY representable (32-bit integer over a power of two),
    so both Spark and any SQL engine compute bit-identical priorities
    (ln is correctly rounded in practice; ties broken by id).

    Scale shape: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition top-n then a single n-row merge on the driver side
    of the exchange; the rank window runs on n rows only. Rows with
    non-positive weight are excluded (their priority is undefined).
    """
    h = F.conv(_bucket_hex(F.col(id_col), salt), 16, 10).cast("long")
    u = (h + F.lit(1).cast("long")) / F.lit(float(2**32))
    r = -F.log(u) / F.col(weight_col)
    top = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_r", r)
        .orderBy("_r", id_col)
        .limit(n)
    )
    # global by design: `top` is already limit(n)-bounded; lit(0)
    # partition makes that explicit and avoids the WindowExec warning
    w = Window.partitionBy(F.lit(0)).orderBy("_r", id_col)
    return top.withColumn("rank", F.row_number().over(w).cast("int")).drop("_r")


def cap_per_key(
    df: DataFrame,
    key_cols: tuple[str, ...],
    cap: int,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Per-key row cap (domain/source caps in corpus curation): keep at
    most ``cap`` rows per key, selected by the deterministic md5 order
    (same salt → same survivors forever, any engine).

    Skew-aware two-phase shape: a count aggregate first splits keys
    into under-cap (kept WHOLE — no sort at all) and over-cap (ranked
    by a window). At corpus scale the vast majority of domains sit
    under any sane cap, so the per-key window sort — the only
    non-scalable piece of the naive formulation, and quadratic pain on
    a hot domain — runs only over the hot tail. The count frame is one
    row per key and broadcasts. Selection is IDENTICAL to the naive
    single-window formulation (under-cap keys rank ≤ cap trivially),
    which is what the SQL oracle checks.
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").alias("_n"))
    tagged = df.join(F.broadcast(counts), keys)
    under = tagged.filter(F.col("_n") <= cap).drop("_n")
    order = _bucket_hex(F.col(id_col), salt)
    w = Window.partitionBy(*keys).orderBy(order, id_col)
    over = (
        tagged.filter(F.col("_n") > cap)
        .drop("_n")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return under.unionByName(over)


def kfold_assign(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    group_col: str | None = None,
    salt: str = "fold",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment:
    ``fold = md5(salt:key) mod k`` on the first 8 hex chars, so the
    assignment is a pure projection with every property of
    :func:`hash_split` (zero shuffles, engine-independent, salt =
    fold-draw identity).

    ``group_col`` makes the assignment LEAKAGE-SAFE: key by a group
    identity (near-dup cluster id, source domain, author) instead of
    the row id, and every member of a group lands in the same fold —
    the standard grouped-CV discipline that keeps near-duplicates of
    a validation document out of its training folds. Folds are
    approximately equal-sized for uniform keys; grouped folds inherit
    the group-size distribution (as grouped CV must).
    """
    if k < 2:
        raise ValueError("k must be at least 2")
    key = F.col(group_col if group_col else id_col)
    h = F.conv(_bucket_hex(key, salt), 16, 10).cast("long")
    return df.withColumn(out_col, (h % k).cast("int"))


def split_sql_case(
    id_expr: str,
    splits: tuple[tuple[str, float], ...] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
) -> str:
    """ANSI-SQL CASE expression computing the identical assignment —
    handed to external engines (the DuckDB oracle uses it verbatim)."""
    hx = f"substr(md5('{salt}:' || CAST({id_expr} AS VARCHAR)), 1, 8)"
    cum = 0.0
    arms = []
    for name, frac in splits[:-1]:
        cum += frac
        arms.append(f"WHEN {hx} < '{_threshold_hex(cum)}' THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{splits[-1][0]}' END"


def source_mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    target_shares: dict[str, float] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Per-source sampling multipliers that rebalance a corpus toward a
    target token mixture — the knob a training-data pipeline turns when
    one crawl source dominates raw token mass (a DoReMi/Pile-style
    domain-mixing step, computed exactly from corpus stats rather than
    learned).

    For each source s: ``mix_weight = target_share(s) / actual_share(s)``
    where actual share is s's fraction of corpus TOKENS (whitespace
    tokenizer, the same budget unit as packing/token caps). Sampling
    each source's documents with probability ∝ mix_weight yields the
    target mixture in expectation. ``target_shares`` defaults to
    uniform across observed sources. An explicit dict is RENORMALIZED
    over the sources actually present in the corpus — target mass
    assigned to an absent source cannot be realized by any sampling
    scheme, so silently keeping it would make the emitted weights sum
    to a mixture that is not the stated target. Observed sources
    missing from the dict get weight 0.0 (dropped from the mix).

    Shape: one map-side-combined (source) aggregate; the per-source
    result (a handful of rows) gets its totals via a single-row
    cross-broadcast — no window over the corpus, no second scan.

    Output: (source, n_docs, n_tokens, token_share, mix_weight),
    one row per source.
    """
    from data_pipeline_childcare_spark.functions.text import token_count

    per_src = df.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    totals = per_src.agg(
        F.sum("n_tokens").cast("double").alias("_total_tokens"),
        F.count("*").cast("long").alias("_n_sources"),
    )
    if target_shares is None:
        joined = per_src.crossJoin(F.broadcast(totals))
        tgt = F.lit(1.0) / F.col("_n_sources")
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target_shares.items() for x in kv]
        )
        raw_tgt = F.coalesce(mapping[F.col(source_col)], F.lit(0.0))
        with_tgt = per_src.withColumn("_raw_tgt", raw_tgt)
        # renormalize over OBSERVED sources (see docstring)
        totals = with_tgt.agg(
            F.sum("n_tokens").cast("double").alias("_total_tokens"),
            F.count("*").cast("long").alias("_n_sources"),
            F.sum("_raw_tgt").alias("_tgt_mass"),
        )
        joined = with_tgt.crossJoin(F.broadcast(totals))
        tgt = F.when(
            F.col("_tgt_mass") > 0, F.col("_raw_tgt") / F.col("_tgt_mass")
        ).otherwise(F.lit(0.0))
    share = F.col("n_tokens") / F.col("_total_tokens")
    return joined.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(share, ndigits).alias("token_share"),
        F.round(tgt / share, ndigits).alias("mix_weight"),
    )


def temperature_mixture_weights(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Temperature-flattened domain mixture (the mT5/XLM-R multilingual
    sampling trick): target share ∝ (actual token share)^alpha, so
    alpha=1 keeps the natural mixture, alpha→0 approaches uniform, and
    the usual 0.3–0.7 range up-samples small sources without letting
    them dominate. ``mix_weight = target_share / actual_share`` is the
    per-source sampling multiplier, like :func:`source_mixture_weights`.

    Shape: one map-side-combined (source) aggregate + two sources-sized
    reductions riding one-row broadcasts — no corpus window, one scan.
    Shares are rounded BEFORE the pow and the normalizer is a sum of
    pre-rounded terms, so any engine replays identical weights.

    Output: (source, n_docs, n_tokens, token_share, target_share,
    mix_weight).
    """
    from data_pipeline_childcare_spark.functions.text import token_count

    per_src = df.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    totals = per_src.agg(F.sum("n_tokens").cast("double").alias("_total"))
    shared = per_src.crossJoin(F.broadcast(totals)).withColumn(
        "_share", F.round(F.col("n_tokens") / F.col("_total"), ndigits)
    )
    # Clamp the share to one ulp of the rounding grid before pow and
    # before the mix-weight division: a source whose share rounds to 0
    # (exactly the tiny-source case temperature flattening targets)
    # must be up-sampled, not zeroed or divided-by-zero into Inf/NaN.
    shared = shared.withColumn(
        "_share_c", F.greatest(F.col("_share"), F.lit(10.0 ** -ndigits))
    ).withColumn("_t", F.round(F.pow(F.col("_share_c"), F.lit(float(alpha))), 8))
    tsum = shared.agg(F.round(F.sum("_t"), 8).alias("_tsum"))
    return (
        shared.crossJoin(F.broadcast(tsum))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.col("_share").alias("token_share"),
            F.round(F.col("_t") / F.col("_tsum"), ndigits).alias("target_share"),
            F.round(
                F.round(F.col("_t") / F.col("_tsum"), ndigits) / F.col("_share_c"),
                ndigits,
            ).alias("mix_weight"),
        )
    )
