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
