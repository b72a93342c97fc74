"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 [EXT]).

``running_user_totals`` keeps one small state row per user — running
event count and value sum — across micro-batches.  This is the shape
every bespoke streaming accumulator takes: grouped Arrow batches in,
explicit typed state, timeout-driven eviction.  Works identically
under ``Trigger.AvailableNow`` (the reference's bookmark-per-run model)
and continuous micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
    )


def running_user_totals(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user running (count, sum) maintained in the state store.

    Emits the updated total for every user seen in each micro-batch
    (update semantics).  State is O(distinct users) — pair with a
    timeout or key TTL when the key space is unbounded.
    """
    return events.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
