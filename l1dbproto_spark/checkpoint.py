"""Engine-wide lineage-cut switch: ``pin(df)`` is the ONE place the
package truncates a DataFrame's lineage, and the mode decides how.

Every multi-stage operator in the engine (clean_corpus's gate chain,
semantic_dedup's drop set, DSIR's bucket models, the APDB visit merge,
the streaming gate stores' batch pins, ...) linearizes its plan by
checkpointing small intermediate frames — without the cut, each stage
EMBEDS the previous stage's subtree and the static plan doubles per gate
(measured 48-72 corpus-scan references in clean_corpus before the cut;
operators/corpus.py docstring). The cut itself has two implementations
with one trade-off:

``local`` (default)
    ``DataFrame.localCheckpoint`` — blocks live in EXECUTOR storage.
    Zero external I/O, the right default for interactive/short jobs and
    reliable hardware: the pinned frames are id-sized and cheap to
    rebuild by re-running the job. But the blocks die with their
    executor — on preemptible/spot clusters or under dynamic
    allocation's decommissioning, ONE lost executor fails the whole job
    instead of recomputing lineage.

``reliable``
    ``DataFrame.checkpoint`` — blocks written to the cluster filesystem
    under ``SparkContext.setCheckpointDir`` (HDFS/S3/...). Survives any
    executor loss; costs one distributed write per pinned frame. The
    right mode for long-running production jobs on preemptible hardware.

The mode is process-global (``set_checkpoint_mode`` /
``checkpoint_mode`` context manager, or the
``SPARK_GRAFT_CHECKPOINT_MODE`` env var at import time) rather than a
parameter threaded through every operator: the choice is a property of
the CLUSTER the job runs on, not of any one operator call, and a global
guarantees no call site can be missed. Plan SHAPE is identical in both
modes — only the storage of the cut changes — pinned by
tests/test_checkpoint_mode.py running a full pipeline in both modes and
asserting equal output plus checkpoint files under the dir.

Call sites use ``df.transform(pin, eager=...)`` so the chain style of
the surrounding code is preserved.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame

_VALID = ("local", "reliable")

_state = {"mode": os.environ.get("SPARK_GRAFT_CHECKPOINT_MODE", "local")}
if _state["mode"] not in _VALID:
    _state["mode"] = "local"


def get_checkpoint_mode() -> str:
    """The active lineage-cut mode: ``"local"`` or ``"reliable"``."""
    return _state["mode"]


def set_checkpoint_mode(
    mode: str, spark=None, checkpoint_dir: str | None = None
) -> None:
    """Switch the engine's lineage-cut implementation. For
    ``"reliable"``, pass ``spark`` + ``checkpoint_dir`` (sets
    ``SparkContext.setCheckpointDir``) unless the context already has a
    checkpoint dir — ``pin`` verifies one exists before cutting."""
    if mode not in _VALID:
        raise ValueError(f"checkpoint mode must be one of {_VALID}, got {mode!r}")
    if checkpoint_dir is not None:
        if spark is None:
            raise ValueError("checkpoint_dir requires the spark session")
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    _state["mode"] = mode


@contextmanager
def checkpoint_mode(mode: str, spark=None, checkpoint_dir: str | None = None):
    """Scoped :func:`set_checkpoint_mode` — restores the previous mode on
    exit (the checkpoint dir, a SparkContext property, is left as set)."""
    prev = _state["mode"]
    set_checkpoint_mode(mode, spark, checkpoint_dir)
    try:
        yield
    finally:
        _state["mode"] = prev


def _has_checkpoint_dir(df: DataFrame) -> bool:
    try:
        return (
            df.sparkSession.sparkContext._jsc.sc().getCheckpointDir().isDefined()
        )
    except Exception:  # introspection failed — let Spark raise its own error
        return True


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage under the active mode (module docstring).
    ``eager=False`` defers materialization to the first action, in both
    modes. Use as ``df.transform(pin, eager=...)``."""
    if _state["mode"] == "reliable":
        if not _has_checkpoint_dir(df):
            raise RuntimeError(
                "checkpoint_mode is 'reliable' but no checkpoint dir is set: "
                "call set_checkpoint_mode('reliable', spark, checkpoint_dir=...) "
                "or spark.sparkContext.setCheckpointDir(...) first"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
