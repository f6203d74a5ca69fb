"""Custom stateful streaming operator via applyInPandasWithState.

The session/tumbling windows in ``windows.py`` cover declarative
state; this is the escape hatch for operator semantics Spark lacks —
per-key custom state mutated per micro-batch, Arrow-batched.

Demonstrator: running per-user stats that survive across micro-batches
(count, value sum, last event time). State is one tiny tuple per user
— the state store shuffles on the user key, so sizing follows
distinct-key count, not event volume.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state.

    ``events`` must be a streaming frame with (user_id, value); emits
    the updated cumulative row for every user seen in a micro-batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EXACT_OUTPUT_SCHEMA = "user_id long, n_events long, total_value_u long"
EXACT_STATE_SCHEMA = "n long, total_u long"


def _update_exact(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Integer-micros accumulator: each value quantizes to
    floor(v·1e6 + 0.5) BEFORE summation, so the running total is an
    int64 — associative and batch-split-invariant, the property that
    makes the stream certifiable against a batch SQL oracle (float
    accumulation order would differ between one-batch and N-batch
    runs). NULL values contribute 0 and still count as events (the
    oracle mirrors with coalesce)."""
    import numpy as np

    n, total_u = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v = np.nan_to_num(pdf["value"].to_numpy(dtype="float64"), nan=0.0)
        total_u += int(np.floor(v * 1_000_000.0 + 0.5).astype("int64").sum())
    state.update((n, total_u))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value_u": [total_u]}
    )


def running_user_stats_exact(events: DataFrame) -> DataFrame:
    """Exactly-certifiable variant of :func:`running_user_stats`:
    per-user (count, Σ floor(value·1e6 + 0.5)) as int64 state. In
    update mode each micro-batch emits the CUMULATIVE row for every
    user it touched; n_events is strictly increasing per user, so the
    final state is ``max(struct(n_events, total_value_u))`` over the
    emissions — how a consumer reads "latest state" from the update
    stream regardless of how the input was split into batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_exact,
        outputStructType=EXACT_OUTPUT_SCHEMA,
        stateStructType=EXACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
