"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 extension; the batch engine's `filter_exists_skip` semantics
as a stream): per-key first-seen dedup — each (user_id, event_id) is
emitted exactly once across micro-batches, with the seen-set held in
keyed state.

This is the plumbing pattern for any custom stateful operator (running
aggregates, sessionization with custom logic, CDC upserts): state schema
declared up front, bounded by timeout, updated per batch-group. The test
drives it with availableNow and compares against the batch distinct.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.LongType()))])


def _dedup_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[int] = set(state.get[0]) if state.exists else set()
    out_ids: list[int] = []
    for pdf in batches:
        for eid in pdf["event_id"]:
            e = int(eid)
            if e not in seen:
                seen.add(e)
                out_ids.append(e)
    state.update((list(seen),))
    yield pd.DataFrame({"user_id": [key[0]] * len(out_ids), "event_id": out_ids})


def stateful_dedup(events: DataFrame) -> DataFrame:
    """Streaming first-seen dedup per user: exactly-once emission of each
    (user_id, event_id) with keyed state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
