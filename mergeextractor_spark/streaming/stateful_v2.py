"""Custom stateful streaming operator on Spark 4's ``transformWithState``
API (SURVEY §2.9 extension) — the successor to ``applyInPandasWithState``
with typed state variables, TTL, and timers, backed by the RocksDB state
store.

Operator: per-user RUNNING TOTALS — each micro-batch emits the updated
cumulative (n_events, total_value) for every user seen in the batch, the
streaming form of a grand running aggregate (the batch
``window_running_total`` is the per-event twin). State is one ValueState
per user: bounded by |users|, not by stream length, and RocksDB keeps it
off-heap so a 100 TB-scale key space spills to disk instead of OOMing
executors — exactly why transformWithState requires the RocksDB
provider.
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

# transformWithState's Python protocol speaks protobuf to the JVM; the
# sandbox has no `protobuf` package and no pip (the same documented
# blocker as sentence-transformers — PERFORMANCE.md "Model-seam status").
# The operator is complete and the test runs wherever protobuf exists;
# applyInPandasWithState (stateful.py) covers the always-on stateful path.
try:
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS_DEPS = True
except ImportError:
    HAS_TWS_DEPS = False

OUTPUT_SCHEMA = T.StructType(
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
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
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


def require_rocksdb(spark) -> None:
    """transformWithState is implemented only on the RocksDB state store —
    set the provider (runtime conf; applies to newly started queries)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) via typed ValueState."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
