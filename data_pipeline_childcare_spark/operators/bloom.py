"""Bloom-filter join pruning (beyond-reference, scale ops).

At 100 TB the dominant cost of a selective join is shuffling probe
rows that cannot possibly match. Spark can inject a runtime bloom
filter itself (``spark.sql.optimizer.runtime.bloomFilter.enabled``),
but only under cost heuristics and with an engine-opaque filter.
This operator is the explicit, deterministic version: build a bloom
bitmap from the build side's keys, broadcast it (``m`` BITS — a few
KB — regardless of build-side row count), and drop non-matching
probe rows BEFORE the shuffle. Guarantees:

- no false negatives: every matching probe row passes, so
  ``bloom prefilter → exact join`` returns exactly the plain join's
  result (this is what the driver oracle checks — the optimization
  must be semantically invisible);
- false positives only cost wasted shuffle, bounded by
  ``(1 - e^(-k·n/m))^k``.

The hash family is the repo's portable md5-derived 60-bit integer,
and the bitmap is built with ``bit_or`` (order-independent), so the
filter is bit-identical in any engine and across retries.

Plan shape: build = one narrow scan + explode(k positions) +
two hash aggregates (positions → 64-bit words → single map row);
probe = broadcast nested-loop join against the ONE-row bitmap
(constant-folded per batch) + a pure column-expression filter. No
Python, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pos_expr(key_col: str, m: int, d: int) -> str:
    """Spark SQL for the ``d``-th bloom bit position of ``key_col`` —
    the SAME portable md5 bucket hash the sketches use (single source
    of truth in ``sketches._bucket_expr``), reduced mod ``m``."""
    from data_pipeline_childcare_spark.operators.sketches import _bucket_expr

    return _bucket_expr(key_col, m, d)


def bloom_words(df: DataFrame, key_col: str, m: int = 8192, k: int = 4) -> DataFrame:
    """The bloom filter as keyed state → (_word, _bits): ≤ ``m/64``
    rows, built by ``bit_or`` (order-independent, map-side combinable,
    and streaming-legal — see ``streaming.sketches.
    streaming_bloom_words``). Sketches over disjoint inputs merge by
    word-wise ``bit_or``."""
    positions = F.array(*[F.expr(_pos_expr(key_col, m, d)) for d in range(k)])
    # NULL keys can never match an equi-join, so dropping them keeps
    # the no-false-negatives guarantee — and a NULL key would otherwise
    # produce a NULL _word that map_from_entries rejects at build time
    return (
        df.filter(F.expr(f"({key_col}) IS NOT NULL"))
        .select(F.explode(positions).alias("_pos"))
        .groupBy((F.col("_pos") / 64).cast("int").alias("_word"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(_pos % 64 as int)))"
            ).alias("_bits")
        )
    )


def bloom_build(df: DataFrame, key_col: str, m: int = 8192, k: int = 4) -> DataFrame:
    """Build a bloom bitmap over ``df[key_col]`` → ONE row with a
    ``_bloom: map<int, bigint>`` column (word index → 64-bit word,
    absent words are all-zero). ``m`` must be a multiple of 64."""
    return bloom_words(df, key_col, m, k).agg(
        F.map_from_entries(F.collect_list(F.struct("_word", "_bits"))).alias(
            "_bloom"
        )
    )


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Keep only probe rows whose key MAY be in the bloom filter —
    a superset of the matching rows (never drops a true match).
    ``bloom`` is the one-row output of :func:`bloom_build`; the cross
    join against it broadcasts a single row, so every partition tests
    locally with no shuffle of ``probe``."""
    probed = probe.crossJoin(F.broadcast(bloom))
    for d in range(k):
        probed = probed.withColumn(f"_p{d}", F.expr(_pos_expr(key_col, m, d)))
    cond = F.lit(True)
    for d in range(k):
        hit = F.expr(
            f"coalesce((shiftright(try_element_at(_bloom, cast(_p{d} div 64 as int)),"
            f" cast(_p{d} % 64 as int)) & 1) = 1, false)"
        )
        cond = cond & hit
    return probed.filter(cond).drop("_bloom", *[f"_p{d}" for d in range(k)])


def bloom_semi_join(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    m: int = 8192,
    k: int = 4,
) -> DataFrame:
    """LEFT SEMI join with bloom pre-pruning: probe rows that fail the
    bloom test never reach the shuffle; survivors are verified by the
    exact semi join, so the result is identical to
    ``probe.join(build, probe_key == build_key, "left_semi")``.

    At 100 TB: the bitmap is a broadcast of ``m/8`` bytes however big
    the build side is (vs broadcasting the build side itself, which
    caps out), and the shuffle that remains carries only
    ``matches + false positives`` instead of every probe row."""
    bitmap = bloom_build(build, build_key, m, k)
    pruned = bloom_prefilter(probe, probe_key, bitmap, m, k)
    # no distinct(): LEFT SEMI already has set semantics, and an extra
    # hash aggregate would shuffle the build side for nothing
    keys = build.select(build_key)
    return pruned.join(
        keys, pruned[probe_key] == keys[build_key], "left_semi"
    )
