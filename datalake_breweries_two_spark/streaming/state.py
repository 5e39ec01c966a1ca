"""Custom stateful streaming via ``transformWithStateInPandas`` (Spark 4).

The modern arbitrary-state API: typed state handles (ValueState /
ListState / MapState), explicit time modes, and a RocksDB-backed store —
the successor to ``applyInPandasWithState`` (which backs the sessionizer
in ``streaming/windows.py``; both are kept to cover both state APIs).

Scale profile: state is one (n, total) row per user — O(distinct users),
not O(events) — and RocksDB keeps it off-heap and incrementally
checkpointed, which is what makes billions of keys viable on a real
cluster. Arrow batches in/out; no row-at-a-time Python.

Environment gate: the TWS runtime speaks protobuf to the JVM
(``pyspark.sql.streaming.proto``), so executing a query needs
``google.protobuf`` installed — absent in minimal images (this repo's CI
skips the e2e test there and unit-tests the processor logic directly).
The operator itself is declared unconditionally; it is standard PySpark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (event count, value sum), emitted after every
    micro-batch that touches the user — the CDC-style changelog a serving
    layer consumes. The final emission per user equals the batch
    ``groupBy(user).agg(count, sum)`` (asserted in tests)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues):  # noqa: ANN001
        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Wire the processor: group by user, update mode, no timers (state
    lives for the stream's lifetime; add a TTL/timer for bounded-retention
    deployments). Requires the RocksDB state store provider — set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider`` before starting the query."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotalsProcessor(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_totals_stream_gs(events: DataFrame) -> DataFrame:
    """``applyInPandasWithState`` twin of :func:`running_totals_stream` —
    the SAME per-user running-totals semantics on the older GroupState API,
    which has no protobuf dependency. Kept so the arbitrary-stateful
    capability is e2e-testable in environments where the TWS runtime can't
    start (``google.protobuf`` absent), and as the migration reference
    between the two state APIs. State shape is identical: one (n, total)
    tuple per user, O(distinct users)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_totals(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
