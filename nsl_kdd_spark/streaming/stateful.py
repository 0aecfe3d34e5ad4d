"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.12 extension surface).

The built-in windows cover tumbling/sliding/session aggregation;
arbitrary per-key state (running profiles, custom eviction, cross-
event features) needs the state-store API. ``running_user_stats`` is
the canonical shape: per-key accumulators that survive micro-batches,
emitting the updated aggregate each batch.

Scale: state lives in the executor state store, partitioned by key —
no driver involvement; bound state with timeouts (eviction) on
unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])
_STATE = StructType([
    StructField("n", LongType()),
    StructField("v", DoubleType()),
])


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) maintained in the state
    store across micro-batches. Works only on streaming input."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
