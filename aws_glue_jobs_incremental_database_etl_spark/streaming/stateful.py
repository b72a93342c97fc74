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


# ---------------------------------------------------------------------
# Spark 4 transformWithStateInPandas — the successor API
# ---------------------------------------------------------------------

def running_user_totals_tws(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """``running_user_totals`` on the Spark 4 ``transformWithState``
    API — the successor to ``applyInPandasWithState``: a
    ``StatefulProcessor`` class with named, individually-typed state
    variables (``ValueState``/``ListState``/``MapState``), per-state
    TTL support, and an init/close lifecycle, instead of one
    monolithic state tuple.  Same semantics as the legacy twin:
    per-user running (count, sum), update-mode emission per
    micro-batch.

    Runtime requirements beyond the legacy API: the RocksDB state
    store provider (``spark.sql.streaming.stateStore.providerClass``)
    and the ``protobuf`` Python package (the state-server protocol of
    the TWS driver worker).  The test suite runs this only where
    protobuf is importable; containers without it keep the
    ``running_user_totals`` twin as the exercised path, and THIS
    function fails fast with an actionable error instead of letting
    the missing import surface as an opaque crash deep inside the
    streaming Python worker at query start.
    """
    try:
        import google.protobuf  # noqa: F401  (TWS state-server protocol)
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' Python "
            "package (the TWS state-server protocol); install protobuf "
            "or use the applyInPandasWithState twin "
            "running_user_totals(), which has identical semantics"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = _OUT_SCHEMA
    state_schema = _STATE_SCHEMA

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, s = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [round(s, 6)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(user_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
