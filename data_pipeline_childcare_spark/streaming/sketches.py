"""Continuously-maintained frequency sketch over a stream.

``operators.sketches.cms_counters`` is expressed as a stateless
bucket-explode followed by a keyed count, so the SAME function runs
unchanged on a streaming DataFrame: the streaming aggregation's state
store holds at most ``depth × width`` rows — a FIXED bound no matter
how long the stream runs or how many distinct keys flow past, which
is exactly why a sketch (and not an exact per-key count, whose state
grows with key cardinality) is the right continuous frequency answer.

Serve the counters with a ``complete``-mode memory/Delta sink, or
merge per-window snapshots by summing ``cnt`` (sketch mergeability —
see ``tests/test_sketches.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_pipeline_childcare_spark.operators.sketches import (
    cms_counters,
    hll_registers,
)


def streaming_cms_counters(
    events: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """CMS counters over a (streaming or static) frame →
    (d, bucket, cnt). Identical expressions in both modes, so the
    streaming result equals the batch sketch on the same data."""
    return cms_counters(events, key_col, depth=depth, width=width)


def streaming_hll_registers(
    events: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Continuously-maintained HLL registers over a (streaming or
    static) frame → (group..., _idx, _M).

    ``operators.sketches.hll_registers`` is a stateless hash
    projection followed by a keyed ``max`` — a streaming-legal
    aggregate whose state store holds at most ``groups × 2^p`` rows,
    FIXED no matter how many distinct values flow past (the reason a
    sketch, not ``count_distinct``, is the continuous answer). Serve
    estimates by running ``hll_estimate`` on the sink table, or in a
    ``foreachBatch`` head; merge across streams by register-wise max.
    """
    return hll_registers(events, group_cols, value_col, p=p)


def streaming_bloom_words(
    keys: DataFrame, key_col: str, m: int = 8192, k: int = 4
) -> DataFrame:
    """Continuously-maintained bloom-filter state over a stream of
    build-side keys → (_word, _bits).

    ``bit_or`` is a streaming-legal keyed aggregate with at most
    ``m/64`` state rows — the word table only ever gains bits, so
    complete-mode snapshots are monotone. The one-row map assembly of
    ``operators.bloom.bloom_build`` is a SECOND aggregation (not
    streaming-composable); assemble it at serve time from the sink —
    ``map_from_entries(collect_list(struct(_word,_bits)))`` — or in a
    foreachBatch head, then prefilter probes with
    ``bloom_prefilter`` unchanged.
    """
    from data_pipeline_childcare_spark.operators.bloom import bloom_words

    return bloom_words(keys, key_col, m, k)
