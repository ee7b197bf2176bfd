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

import contextvars
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame

_VALID = ("local", "reliable")

_state = {"mode": os.environ.get("SPARK_GRAFT_CHECKPOINT_MODE", "local")}
if _state["mode"] not in _VALID:
    _state["mode"] = "local"

#: Scoped override for the ``checkpoint_mode`` context manager. Backed by
#: a ContextVar so a scoped block changes the mode for ITS OWN logical
#: flow only — a concurrent pipeline on another thread keeps seeing the
#: process-global default instead of having 'reliable' (or 'local') leak
#: into it mid-job (r6 advice item 4). The engine's internal thread pools
#: (apdb._run_writes, visit_pipeline's overlap pools) submit work through
#: :func:`ctx_submit`, which copies the caller's context, so pins that run
#: on engine worker threads still honor the caller's scoped mode.
_override: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "spark_graft_checkpoint_mode_override", default=None
)


def get_checkpoint_mode() -> str:
    """The active lineage-cut mode: ``"local"`` or ``"reliable"`` — the
    current flow's scoped override if inside a :func:`checkpoint_mode`
    block, else the process-global default."""
    return _override.get() or _state["mode"]


def set_checkpoint_mode(
    mode: str, spark=None, checkpoint_dir: str | None = None
) -> None:
    """Switch the engine's PROCESS-GLOBAL lineage-cut default (every
    thread and pipeline sees it; use :func:`checkpoint_mode` for a scoped
    switch that cannot affect concurrent jobs). For ``"reliable"``, pass
    ``spark`` + ``checkpoint_dir`` (sets
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
    """Scoped mode switch for the CURRENT logical flow (ContextVar-backed):
    restores the previous state on exit and never leaks into pipelines
    running concurrently on other threads. Work the engine fans out to its
    own thread pools inherits the scope via :func:`ctx_submit`; threads the
    CALLER spawns inside the block must copy their context explicitly
    (``contextvars.copy_context().run``) if they, too, should inherit it.
    The checkpoint dir, a SparkContext property, is left as set."""
    if mode not in _VALID:
        raise ValueError(f"checkpoint mode must be one of {_VALID}, got {mode!r}")
    if checkpoint_dir is not None:
        if spark is None:
            raise ValueError("checkpoint_dir requires the spark session")
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    token = _override.set(mode)
    try:
        yield
    finally:
        _override.reset(token)


def ctx_submit(executor, fn, *args, **kwargs):
    """``executor.submit`` carrying the caller's ``contextvars`` context —
    the engine's internal pools use this so a scoped
    :func:`checkpoint_mode` block covers pins executed on worker threads
    (ThreadPoolExecutor does not propagate context by itself)."""
    ctx = contextvars.copy_context()
    return executor.submit(ctx.run, fn, *args, **kwargs)


def _has_checkpoint_dir(df: DataFrame) -> bool:
    try:
        return (
            df.sparkSession.sparkContext._jsc.sc().getCheckpointDir().isDefined()
        )
    except Exception:  # introspection failed — let Spark raise its own error
        return True


#: Logical leaf nodes that carry no file/table scan — a plan whose leaves
#: are all of these kinds cannot observe a table overwrite/append that
#: happens after the plan was built.
_SCANLESS_LEAVES = ("LogicalRDD", "LocalRelation", "OneRowRelation")


def lineage_is_cut(df: DataFrame) -> bool:
    """True when every leaf of ``df``'s analyzed plan is an in-memory
    relation (MATERIALIZED checkpointed RDD / local rows) — i.e. the
    lineage has already been cut and re-evaluating the frame can never
    re-scan a storage table. Used by write paths to skip a redundant
    second ``pin`` of inputs the caller already pinned (one
    materialization job saved per call — measurable on latency-bound
    paths like the APDB visit store).

    A LAZY pin is NOT enough (r14 advice item 2): ``checkpoint`` /
    ``localCheckpoint(eager=False)`` returns a LogicalRDD-leaf plan
    immediately, but until the first action the underlying RDD still
    recomputes through the ORIGINAL lineage — file scans included — so a
    caller that skipped its own pin on the strength of the leaf shape
    alone could silently read post-overwrite state. Every LogicalRDD
    leaf must therefore also report ``rdd().isCheckpointed()`` (true
    only once the checkpoint data exists, in both local and reliable
    modes; pinned by test). Conservative: any introspection failure
    reports False (the caller then pins, which is always safe)."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            name = leaf.getClass().getSimpleName()
            if name not in _SCANLESS_LEAVES:
                return False
            if name == "LogicalRDD" and not leaf.rdd().isCheckpointed():
                return False
        return True
    except Exception:
        return False


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage under the active mode (module docstring).
    ``eager=False`` defers materialization to the first action, in both
    modes. Use as ``df.transform(pin, eager=...)``."""
    if get_checkpoint_mode() == "reliable":
        if not _has_checkpoint_dir(df):
            raise RuntimeError(
                "checkpoint_mode is 'reliable' but no checkpoint dir is set: "
                "call set_checkpoint_mode('reliable', spark, checkpoint_dir=...) "
                "or spark.sparkContext.setCheckpointDir(...) first"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
