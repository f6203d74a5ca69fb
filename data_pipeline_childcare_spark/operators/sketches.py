"""Sketch family (beyond-reference, training-data ops): KMV and HLL
distinct counts, KMV set algebra (union/Jaccard/intersection), CMS
frequencies and heavy hitters, fixed-bin histogram quantiles.

Spark's built-ins (``approx_count_distinct``, ``approx_percentile``)
are engine-specific — no cross-engine oracle can check them. Every
sketch here is instead DETERMINISTIC given the hash function, and the
hash family is the repo's portable md5-derived 60-bit integer (same
trick as ``dedup.minhash_est_pairs_portable``): any engine reproduces
the sketch — and therefore the estimate — bit for bit, so the
driver's DuckDB oracle verifies *approximate* algorithms exactly.

KMV (Bar-Yossef et al. 2002): hash every value into [0, 2^60); keep
the k smallest DISTINCT hashes per group. With fewer than k distinct
values the count is exact; otherwise the kth-smallest hash R
estimates density and ``(k-1) / (R / 2^60)`` estimates cardinality
(unbiased, σ/μ ≈ 1/√(k−2)).

Scale shape: one narrow hash projection, a dropDuplicates shuffle
keyed by (group, hash) — uniform by construction — then a per-group
sort of DISTINCT hashes only. At 100 TB add the standard KMV
pushdown: pre-filter ``hash < t`` with a loose threshold from an
expected-cardinality hint before the sort, which turns the per-group
sort into a per-group trickle; the estimate is unchanged as long as
t keeps ≥ k survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate →
    (group..., n_kept, est_distinct).

    ``est_distinct`` is DOUBLE: exact count when n_kept < k, else the
    (k-1)/R estimator rounded to 4 places. Deterministic across
    engines (portable md5 hash family; IEEE double arithmetic).
    """
    hv = F.expr(
        f"cast(conv(substring(md5(cast({value_col} as string)), 1, 15), 16, 10) as bigint)"
    )
    distinct_hashes = df.select(*group_cols, hv.alias("_hv")).dropDuplicates(
        [*group_cols, "_hv"]
    )
    w = Window.partitionBy(*group_cols).orderBy("_hv")
    kept = (
        distinct_hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.count("*").alias("n_kept"), F.max("_hv").alias("_kth"))
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_kth"), 4)
    )
    return kept.select(*group_cols, "n_kept", est.alias("est_distinct"))


def hll_distinct(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate →
    (group..., n_registers, est_distinct).

    Flajolet et al. 2007, on the portable md5 hash family so the
    sketch — and therefore the estimate — is reproducible bit for bit
    in any engine (the same property KMV exploits; Spark's built-in
    ``approx_count_distinct`` is HLL++ but engine-opaque). The top
    ``p`` hash bits pick one of ``m = 2^p`` registers; the register
    keeps the maximum leading-zero rank of the remaining ``60 - p``
    bits. Where HLL beats KMV at scale: state is a FIXED ``m``
    integers per group (no per-group top-k sort), maintained by a
    plain ``max`` aggregate — map-side combinable, mergeable across
    days/sources by register-wise max, shuffle carries ≤ ``m`` rows
    per group.

    Engine-portable determinism details:
    - rank uses ``length(bin(w))`` = floor(log2(w)) + 1, an INTEGER
      computation (no float log);
    - the harmonic sum ``Σ 2^-M_j`` is scaled by 2^(61-p) so it is an
      exact BIGINT sum (2^p registers × ≤ 2^(60-p) each fits); only the
      final division is floating-point, identical IEEE in any engine;
    - the small-range linear-counting branch fires on integer
      comparisons; its ``ln`` is the only libm call (≤ 1 ulp across
      engines, absorbed by the 4-place round).

    Standard error ≈ 1.04/√m (~6.5% at p=8).
    """
    regs = hll_registers(df, group_cols, value_col, p)
    return hll_estimate(regs, group_cols, p)


def hll_registers(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """The mergeable HLL state → (group..., _idx, _M): per register,
    the max leading-zero rank seen. Sketches built on disjoint inputs
    (days, sources, partitions) merge by register-wise max —
    ``union → groupBy(group, _idx).max(_M)`` — with no loss."""
    sub = 60 - p
    hv = F.expr(
        f"cast(conv(substring(md5(cast({value_col} as string)), 1, 15), 16, 10) as bigint)"
    )
    idx = F.expr(f"shiftright(_hv, {sub})")
    w = F.expr(f"_hv & {(1 << sub) - 1}")
    rho = F.when(
        w > 0,
        F.lit(sub) + 1 - F.length(F.expr("bin(_hv & %d)" % ((1 << sub) - 1))),
    ).otherwise(F.lit(sub + 1))
    return (
        df.select(*group_cols, hv.alias("_hv"))
        .select(*group_cols, idx.alias("_idx"), rho.alias("_rho"))
        .groupBy(*group_cols, "_idx")
        .agg(F.max("_rho").alias("_M"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: tuple[str, ...], p: int = 8
) -> DataFrame:
    """Estimate from :func:`hll_registers` state →
    (group..., n_registers, est_distinct).

    The harmonic sum is scaled by ``2^(61-p)`` — the max register
    value is ``(60-p)+1``, so every ``2^(scale - M)`` term is a
    positive integer and the sum stays ≤ ``2^60`` (exact BIGINT
    arithmetic for any valid ``p``)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    scale = 61 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_registers"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), cast({scale} - _M as int))")
        ).alias("_S_present"),
    )
    zeros = F.lit(m) - F.col("n_registers")
    S = F.col("_S_present") + zeros * F.lit(1 << scale)
    raw = F.lit(alpha * m * m * float(1 << scale)) / S.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *group_cols, "n_registers", F.round(est, 4).alias("est_distinct")
    )


def hll_sql(
    table: str, group_cols: tuple[str, ...], value_col: str, p: int = 8
) -> str:
    """The DuckDB oracle for :func:`hll_distinct` — identical hash,
    registers, scaled-integer harmonic sum, and estimator, emitted
    from one source of truth."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    sub = 60 - p
    scale = 61 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    groups = ", ".join(group_cols)
    mask = (1 << sub) - 1
    return f"""
        WITH h AS (
            SELECT {groups},
                   CAST(CONCAT('0x', substring(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
            FROM {table}
        ), regs AS (
            SELECT {groups}, hv >> {sub} AS idx,
                   max(CASE WHEN hv & {mask} > 0
                            THEN {sub} + 1 - length(bin(hv & {mask}))
                            ELSE {sub + 1} END) AS M
            FROM h GROUP BY {groups}, idx
        ), agg AS (
            SELECT {groups}, CAST(count(*) AS BIGINT) AS n_registers,
                   sum((1::BIGINT) << ({scale} - M)) AS s_present
            FROM regs GROUP BY {groups}
        ), est AS (
            SELECT {groups}, n_registers,
                   CAST(s_present + ({m} - n_registers) * (1::BIGINT << {scale}) AS DOUBLE) AS s,
                   {m} - n_registers AS zeros
            FROM agg
        )
        SELECT {groups}, n_registers,
               CAST(round(CAST(CAST((
                   CASE WHEN {alpha * m * m * float(1 << scale)!r} / s <= {2.5 * m!r}
                             AND zeros > 0
                        THEN {float(m)!r} * ln({float(m)!r} / zeros)
                        ELSE {alpha * m * m * float(1 << scale)!r} / s END
               ) AS VARCHAR) AS DECIMAL(30,15)), 4) AS DOUBLE) AS est_distinct
        FROM est
    """


def kmv_set_estimates(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV set algebra (Beyer et al. 2007) → ONE row
    (n_kept, est_union, jaccard, est_intersection).

    The k smallest distinct portable hashes of A ∪ B estimate the
    union cardinality exactly as :func:`kmv_distinct`; the fraction
    of those k that appear in BOTH sides is an unbiased Jaccard
    estimate, and intersection = jaccard × union. Everything is
    integer/rounded-double determinism on the shared hash family, so
    the DuckDB oracle checks the whole algebra exactly.

    Scale shape: per-side dedup collapses map-side; the k-smallest
    survive a TakeOrdered (no full sort); one tiny final projection.
    Sketches are mergeable: keep each side's k-min list and re-merge
    for any pairwise combination without rescanning the data.
    """
    hv = F.expr(
        f"cast(conv(substring(md5(cast({value_col} as string)), 1, 15), 16, 10) as bigint)"
    )
    ta = a.select(hv.alias("_hv"), F.lit(1).alias("_a"), F.lit(0).alias("_b"))
    tb = b.select(hv.alias("_hv"), F.lit(0).alias("_a"), F.lit(1).alias("_b"))
    per_hash = (
        ta.unionAll(tb)
        .groupBy("_hv")
        .agg(F.max("_a").alias("_in_a"), F.max("_b").alias("_in_b"))
    )
    topk = per_hash.orderBy("_hv").limit(k)
    agg = topk.agg(
        F.count("*").alias("n_kept"),
        F.max("_hv").alias("_kth"),
        F.sum(F.col("_in_a") * F.col("_in_b")).alias("_common"),
    )
    est_union = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_kth"), 4)
    )
    jaccard = F.round(F.col("_common") / F.col("n_kept"), 6)
    return agg.select(
        "n_kept",
        est_union.alias("est_union"),
        jaccard.alias("jaccard"),
        F.round(jaccard * est_union, 4).alias("est_intersection"),
    )


def kmv_set_sql(
    table_a: str, table_b: str, value_col: str, k: int = 64
) -> str:
    """The DuckDB oracle for :func:`kmv_set_estimates` — identical
    hash, k-smallest merge, and estimators. ``table_a``/``table_b``
    are full SELECT subqueries or table names."""
    h = f"CAST(CONCAT('0x', substring(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
        WITH tagged AS (
            SELECT {h} AS hv, 1 AS a, 0 AS b FROM {table_a}
            UNION ALL
            SELECT {h} AS hv, 0 AS a, 1 AS b FROM {table_b}
        ), per_hash AS (
            SELECT hv, max(a) AS in_a, max(b) AS in_b
            FROM tagged GROUP BY 1
        ), topk AS (
            SELECT * FROM per_hash ORDER BY hv LIMIT {k}
        ), agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_kept,
                   max(hv) AS kth,
                   CAST(sum(in_a * in_b) AS BIGINT) AS common
            FROM topk
        )
        , est AS (
            -- each estimator computed ONCE so the expressions that
            -- must mirror kmv_set_estimates exist in one place
            SELECT n_kept,
                   CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                        ELSE CAST(round(CAST(CAST(({float(k - 1)!r} * {_HASH_SPACE!r} / kth) AS VARCHAR) AS DECIMAL(30,15)), 4) AS DOUBLE)
                   END AS est_union,
                   CAST(round(CAST(CAST((common * 1.0 / n_kept) AS VARCHAR) AS DECIMAL(30,15)), 6) AS DOUBLE) AS jaccard
            FROM agg
        )
        SELECT n_kept, est_union, jaccard,
               CAST(round(CAST(CAST((jaccard * est_union) AS VARCHAR) AS DECIMAL(30,15)), 4) AS DOUBLE) AS est_intersection
        FROM est
    """


def histogram_quantiles(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group quantile estimates from a fixed-bin histogram sketch
    → (group..., q, est_value).

    The portable alternative to engine-opaque ``approx_percentile``
    (t-digest in Spark, different sketch in every engine): a uniform
    ``bins``-cell histogram between the group's min and max. The
    estimate is the CENTER of the first bin whose cumulative count
    reaches ``ceil(q·n)`` (percentile_disc rank semantics), so the
    error is bounded by half a bin width — and every step (bin index,
    cumulative rank, center formula) is the same IEEE arithmetic in
    any engine, which lets the DuckDB oracle check the sketch
    EXACTLY, like KMV/CMS/HLL.

    Scale shape: two hash aggregates (per-group min/max/count, then
    per-(group, bin) counts — at most ``bins`` rows per group however
    many rows flow in, mergeable by addition) + one window over bins.
    The value column is scanned twice; at 100 TB fuse pass one into
    an existing profiling scan or substitute fixed dataset bounds.
    """
    # NULL values are excluded up front: floor(NULL)=NULL would slip
    # past F.least into the top bin while count(value_col) excluded it
    # from _n, skewing cumulative ranks (the SQL twin has the matching
    # WHERE clauses)
    df = df.filter(F.col(value_col).isNotNull())
    stats = df.groupBy(*group_cols).agg(
        F.min(value_col).alias("_mn"),
        F.max(value_col).alias("_mx"),
        F.count(value_col).alias("_n"),
    )
    joined = df.join(F.broadcast(stats), list(group_cols))
    span = F.col("_mx") - F.col("_mn")
    bin_idx = F.when(
        span > 0,
        F.least(
            F.floor((F.col(value_col) - F.col("_mn")) / span * bins),
            F.lit(bins - 1),
        ),
    ).otherwise(F.lit(0))
    counts = (
        joined.select(*group_cols, "_mn", "_mx", "_n", bin_idx.alias("_bin"))
        .groupBy(*group_cols, "_mn", "_mx", "_n", "_bin")
        .agg(F.count("*").alias("_cnt"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("_cum", F.sum("_cnt").over(w))
    q_lit = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    hit = (
        cum.select(*group_cols, "_mn", "_mx", "_n", "_bin", "_cum", q_lit)
        .filter(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
        .groupBy(*group_cols, "q", "_mn", "_mx", "_n")
        .agg(F.min("_bin").alias("_qbin"))
    )
    est = F.when(
        F.col("_mx") > F.col("_mn"),
        F.col("_mn")
        + (F.col("_qbin") + 0.5) * (F.col("_mx") - F.col("_mn")) / bins,
    ).otherwise(F.col("_mn"))
    return hit.select(
        *group_cols, "q", F.round(est, 6).alias("est_value")
    ).orderBy(*group_cols, "q")


def histogram_quantiles_sql(
    table: str,
    group_cols: tuple[str, ...],
    value_col: str,
    bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """The DuckDB oracle for :func:`histogram_quantiles` — identical
    binning, rank, and center formula, emitted from one source of
    truth."""
    groups = ", ".join(group_cols)
    q_values = ", ".join(f"({float(q)!r})" for q in qs)
    return f"""
        WITH stats AS (
            SELECT {groups}, min({value_col}) AS mn, max({value_col}) AS mx,
                   CAST(count({value_col}) AS BIGINT) AS n
            FROM {table} WHERE {value_col} IS NOT NULL GROUP BY {groups}
        ), binned AS (
            SELECT t.{groups}, s.mn, s.mx, s.n,
                   CASE WHEN s.mx > s.mn
                        THEN least(CAST(floor(({value_col} - s.mn) / (s.mx - s.mn) * {bins}) AS BIGINT), {bins - 1})
                        ELSE 0 END AS bin
            FROM {table} t JOIN stats s USING ({groups})
            WHERE t.{value_col} IS NOT NULL
        ), counts AS (
            SELECT {groups}, mn, mx, n, bin, count(*) AS cnt
            FROM binned GROUP BY {groups}, mn, mx, n, bin
        ), cum AS (
            SELECT {groups}, mn, mx, n, bin,
                   sum(cnt) OVER (PARTITION BY {groups} ORDER BY bin
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS c
            FROM counts
        ), hit AS (
            SELECT {groups}, q.q, mn, mx, n, min(bin) AS qbin
            FROM cum CROSS JOIN (VALUES {q_values}) q(q)
            WHERE c >= ceiling(q.q * n)
            GROUP BY {groups}, q.q, mn, mx, n
        )
        SELECT {groups}, q,
               CAST(round(CAST(CAST((
                   CASE WHEN mx > mn
                        THEN mn + (qbin + 0.5) * (mx - mn) / {bins}
                        ELSE mn END
               ) AS VARCHAR) AS DECIMAL(30,15)), 6) AS DOUBLE) AS est_value
        FROM hit
        ORDER BY {groups}, q
    """


def _bucket_expr(key_col: str, width: int, d: "str | int") -> str:
    """Spark SQL for the depth-``d`` CMS bucket of ``key_col`` — the
    portable 60-bit md5 hash reduced mod width. The hash is always
    positive, so ``%`` and ``pmod`` agree in every engine."""
    dd = d if isinstance(d, str) else repr(d)
    return (
        f"cast(conv(substring(md5(concat(cast({key_col} as string), '#', cast({dd} as string))), 1, 15), 16, 10) as bigint) % {width}"
    )


def cms_counters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch counters → (d, bucket, cnt).

    The sketch is ``depth × width`` counters — FIXED size no matter
    how many rows flow in, and mergeable by plain addition, which is
    what makes it the 100 TB answer to "how often does each key
    occur" when the key cardinality is too high to groupBy exactly:
    partial aggregation combines map-side, the shuffle carries at most
    ``depth × width`` rows per partition, and sketches from separate
    days/sources merge by summing counters.

    Estimates only overcount (hash collisions), never undercount;
    ``width`` bounds the bias at ~``e·n/width`` with probability
    ``1 - e^-depth``  (Cormode & Muthukrishnan 2005).
    """
    buckets = F.array(
        *[F.expr(_bucket_expr(key_col, width, d)) for d in range(depth)]
    )
    return (
        df.select(F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame, candidates: DataFrame, key_col: str,
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Point-estimate each candidate key against CMS ``counters`` →
    (key_col, est_count). est = min over depth rows of the key's
    bucket counter. ``candidates`` is a separate input on purpose: at
    scale you estimate a small candidate set (e.g. the union of
    per-partition local top-k), never every distinct key."""
    buckets = F.array(
        *[F.expr(_bucket_expr(key_col, width, d)) for d in range(depth)]
    )
    keyed = candidates.select(key_col, F.posexplode(buckets).alias("d", "bucket"))
    return (
        keyed.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256, k: int = 20
) -> DataFrame:
    """Top-k keys by count-min estimated frequency →
    (key_col, est_count), ordered est desc / key asc. Deterministic
    across engines (portable hash + integer counters), so an exact
    DuckDB oracle checks the approximate algorithm bit-for-bit."""
    counters = cms_counters(df, key_col, depth, width)
    cand = df.select(key_col).distinct()
    est = cms_estimate(counters, cand, key_col, depth, width)
    return est.orderBy(F.desc("est_count"), key_col).limit(k)


def cms_sql(
    table: str, key_col: str, depth: int = 4, width: int = 256, k: int = 20
) -> str:
    """The DuckDB oracle for :func:`cms_heavy_hitters` — identical
    hash, buckets, and min-of-counters estimator."""
    h = (
        f"CAST(CONCAT('0x', substring(md5(CAST({key_col} AS VARCHAR) || '#' || CAST(d.i AS VARCHAR)), 1, 15)) AS BIGINT) % {width}"
    )
    return f"""
        WITH b AS (
            SELECT d.i AS d, {h} AS bucket
            FROM {table} CROSS JOIN range({depth}) d(i)
        ), sk AS (
            SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
            FROM b GROUP BY 1, 2
        ), cand AS (
            SELECT DISTINCT {key_col} FROM {table}
        ), cb AS (
            SELECT {key_col}, d.i AS d, {h} AS bucket
            FROM cand CROSS JOIN range({depth}) d(i)
        ), est AS (
            SELECT {key_col}, min(cnt) AS est_count
            FROM cb JOIN sk USING (d, bucket)
            GROUP BY 1
        )
        SELECT {key_col}, est_count
        FROM est ORDER BY est_count DESC, {key_col} LIMIT {k}
    """


def kmv_sql(
    table: str, group_cols: tuple[str, ...], value_col: str, k: int = 64
) -> str:
    """The DuckDB oracle for :func:`kmv_distinct` — identical hash,
    identical estimator, emitted from one source of truth."""
    groups = ", ".join(group_cols)
    return f"""
        WITH h AS (
            SELECT DISTINCT {groups},
                   CAST(CONCAT('0x', substring(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
            FROM {table}
        ), r AS (
            SELECT {groups}, hv,
                   row_number() OVER (PARTITION BY {groups} ORDER BY hv) AS rn
            FROM h
        ), agg AS (
            SELECT {groups}, CAST(count(*) AS BIGINT) AS n_kept, max(hv) AS kth
            FROM r WHERE rn <= {k} GROUP BY {groups}
        )
        SELECT {groups}, n_kept,
               CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                    -- round via shortest-decimal repr = Spark round()
                    ELSE CAST(round(CAST(CAST(({float(k - 1)!r} * {_HASH_SPACE!r} / kth) AS VARCHAR) AS DECIMAL(30,15)), 4) AS DOUBLE)
               END AS est_distinct
        FROM agg
    """
