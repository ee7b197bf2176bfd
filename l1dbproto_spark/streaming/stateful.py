"""Custom stateful streaming operator: running per-object detection counts
via ``applyInPandasWithState``.

The reference evolves per-object state (nDiaSources, lastNonForcedSource)
across visits by read-modify-write against the store (``_executors.py:
315-325`` — SURVEY T3/A1). The engine's *preferred* scale path is the
MERGE-per-microbatch in the visit pipeline; this module provides the
operator-state alternative the SURVEY names (``applyInPandasWithState``) for
pipelines that want detection counts without a storage round-trip — e.g. a
pure streaming alert counter.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("diaObjectId", T.LongType(), False),
        T.StructField("nDiaSources", T.LongType(), False),
        T.StructField("lastSeenMjd", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("last_mjd", T.DoubleType(), True),
    ]
)


def _update_counts(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (obj_id,) = key
    n, last_mjd = state.get if state.exists else (0, None)
    for pdf in batches:
        n += len(pdf)
        m = pdf["midpointMjdTai"].max()
        last_mjd = m if last_mjd is None else max(last_mjd, m)
    state.update((n, last_mjd))
    yield pd.DataFrame(
        {"diaObjectId": [obj_id], "nDiaSources": [n], "lastSeenMjd": [last_mjd]}
    )


def running_object_counts(detections_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame[diaObjectId, midpointMjdTai, ...] -> per-object
    running totals, one output row per object per micro-batch (update mode).

    State is per-key (diaObjectId) — partitioned by Spark's state store, so
    the operator scales horizontally; at APDB scale prefer the storage-MERGE
    form (state survives restarts with the table, not the checkpoint)."""
    return detections_stream.groupBy("diaObjectId").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningCountsProcessor(StatefulProcessor):
    """``transformWithStateInPandas`` (state API v2, Spark 4) form of the
    running per-object counter — same semantics as
    :func:`running_object_counts`, expressed as a StatefulProcessor with a
    typed ValueState variable. The v2 API adds what the GroupState form
    lacks at scale: named state variables, per-state TTL, and timers —
    wired here so pipelines on the modern API have a drop-in operator.

    Must be a plain module-level subclass: the TWS runner pickles the
    processor into its driver worker, and a dynamically-built class kills
    that worker with an opaque 'exited unexpectedly (crashed)'."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getValueState("counts", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):  # noqa: ARG002
        (obj_id,) = key
        if self._counts.exists():
            n, last_mjd = self._counts.get()
        else:
            n, last_mjd = 0, None
        for pdf in rows:
            n += len(pdf)
            m = pdf["midpointMjdTai"].max()
            last_mjd = m if last_mjd is None else max(last_mjd, m)
        self._counts.update((n, last_mjd))
        yield pd.DataFrame(
            {"diaObjectId": [obj_id], "nDiaSources": [n], "lastSeenMjd": [last_mjd]}
        )

    def close(self) -> None:
        pass


def running_object_counts_v2(detections_stream: DataFrame) -> DataFrame:
    """The state-API-v2 twin of :func:`running_object_counts`:
    ``transformWithStateInPandas`` with a named ValueState. Update mode, no
    time semantics (timeMode='None'); state is per-key in the state store
    exactly like the v1 form, so outputs are identical batch-for-batch
    (pinned by tests/test_stateful_streaming.py)."""
    return detections_stream.groupBy("diaObjectId").transformWithStateInPandas(
        statefulProcessor=RunningCountsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
