"""arrow_topk — the Arrow/BLAS wide-embedding exact top-k scale path:
parity with the expression-level brute force (same neighbors, same ranks,
same rounded similarities), degenerate-vector guards, and the empty-query
edge. Crossover measurements live in the operator docstring +
PERFORMANCE.md (driver r10)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from l1dbproto_spark.operators.similarity import (
    ann_recall,
    arrow_topk,
    brute_force_topk,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _as_map(df):
    return {
        (r.query_id, r.rank): (r.neighbor_id, round(r.cosine_sim, 6))
        for r in df.collect()
    }


def test_parity_with_fold_dim64(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    got = arrow_topk(emb, qs, k=5)
    want = brute_force_topk(emb, qs, k=5)
    rec = ann_recall(got, want).agg(F.avg("recall").alias("r")).collect()[0].r
    assert rec == 1.0
    # ranks and similarities agree to rounding, not just the id sets
    assert _as_map(got) == _as_map(want)


def test_parity_with_fold_wide_dim(spark):
    dim = 512
    wide = spark.createDataFrame(
        [
            (int(i), [float(x) for x in np.random.default_rng(i).standard_normal(dim)])
            for i in range(300)
        ],
        "vec_id long, embedding array<double>",
    )
    qs = wide.filter(F.col("vec_id") < 5)
    got = _as_map(arrow_topk(wide, qs, k=5))
    want = _as_map(brute_force_topk(wide, qs, k=5))
    assert got == want


def test_degenerate_vectors_dropped_both_sides(spark):
    rows = [
        (0, [1.0, 2.0, 3.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero norm: never a neighbor
        (2, [1.0, 2.0, 2.9, 0.0]),
        (3, [float("nan"), 1.0, 1.0, 1.0]),  # NaN: never a neighbor
        (4, [-1.0, -2.0, -3.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = arrow_topk(df, df.filter(F.col("vec_id") == 0), k=4)
    got = [r.neighbor_id for r in out.orderBy("rank").collect()]
    assert got == [2, 4]  # 1 and 3 dropped, self excluded
    # degenerate QUERY: contributes no output rows instead of crashing
    assert arrow_topk(df, df.filter(F.col("vec_id") == 1), k=2).count() == 0


def test_empty_query_set(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    assert arrow_topk(emb, emb.filter(F.col("vec_id") < 0), k=5).count() == 0


def test_null_elements_and_ragged_vectors_cost_one_row(spark):
    """NULL ELEMENTS inside a vector and wrong-width vectors degrade to a
    dropped row on both sides (r10 review find: a RAGGED vector made the
    numpy stack throw — on the driver for queries, in the task for corpus
    rows; null elements convert to NaN and fall to the finite-norm mask,
    now pinned alongside)."""
    rows = [
        (0, [1.0, 2.0, 3.0, 0.5]),
        (1, [1.0, None, 3.0, 0.5]),   # null element: never a neighbor
        (2, [1.0, 2.0, 2.9, 0.5]),
        (3, [1.0, 2.0]),              # ragged width: never a neighbor
        (4, [-1.0, -2.0, -3.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = arrow_topk(df, df.filter(F.col("vec_id") == 0), k=4)
    assert [r.neighbor_id for r in out.orderBy("rank").collect()] == [2, 4]
    # degenerate QUERIES (null element / ragged) contribute nothing
    bad_q = df.filter(F.col("vec_id").isin(1, 3))
    assert arrow_topk(df, bad_q, k=2).count() == 0


# exact_topk — the dim x |Q| dispatch front door (driver r11)


def test_exact_topk_dispatches_fold_at_narrow_dim(spark):
    """dim 64 x 10 queries (work 640 < 6000) must take the expression
    fold: no MapInPandas in the plan, results identical to
    brute_force_topk (bit-for-bit — same code path)."""
    from l1dbproto_spark.operators.similarity import exact_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    got = exact_topk(emb, qs, k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert _as_map(got) == _as_map(brute_force_topk(emb, qs, k=5))


def test_exact_topk_dispatches_arrow_at_wide_dim(spark):
    """dim 512 x 20 queries (work 10240 >= 6000) must take the Arrow/BLAS
    path: MapInPandas in the plan, results equal to the fold to the
    round_digits rounding (the documented cross-path contract)."""
    from l1dbproto_spark.operators.similarity import exact_topk

    dim = 512
    wide = spark.createDataFrame(
        [
            (int(i), [float(x) for x in np.random.default_rng(1000 + i).standard_normal(dim)])
            for i in range(200)
        ],
        "vec_id long, embedding array<double>",
    )
    qs = wide.filter(F.col("vec_id") < 20)
    got = exact_topk(wide, qs, k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert _as_map(got) == _as_map(brute_force_topk(wide, qs, k=5))


def test_exact_topk_knob_and_probe_overrides(spark):
    """Explicit dim/n_queries skip the probes and drive the same rule:
    forcing the threshold down flips the narrow shape to arrow; an empty
    corpus returns an empty frame through the fold path."""
    from l1dbproto_spark.operators.similarity import exact_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    forced = exact_topk(emb, qs, k=5, arrow_min_work=1)
    plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert _as_map(forced) == _as_map(brute_force_topk(emb, qs, k=5))
    empty = emb.filter(F.lit(False))
    assert exact_topk(empty, qs, k=5).count() == 0
