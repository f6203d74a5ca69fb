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

from data_pipeline_childcare_spark.operators.sketches import cms_counters


def streaming_cms_counters(
    events: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """CMS counters over a (streaming or static) frame →
    (d, bucket, cnt). Identical expressions in both modes, so the
    streaming result equals the batch sketch on the same data."""
    return cms_counters(events, key_col, depth=depth, width=width)
