"""Registry-level ANN recall floors — the SAME RECALL_FLOORS /
RECALL_QUERY_MAX_ID constants bench.py enforces at sf0.1, enforced here on
the registered queries at the suite scale, so the bench gate and the pytest
pin can never drift apart (one definition, two consumers — r6 verdict
item 6). The exact result is scoped by each spec's own query predicate
(vec_id < N), not by the approx output's query ids, so an approx method
that returns zero rows for a query contributes recall 0 instead of
silently leaving the mean (r6 advice item 1).

Measured at sf0.001: lsh 0.68, ivf 0.83, ivf_pq 0.84, quantized 1.0 —
all with real margin over their floors (0.6 / 0.6 / 0.5 / 0.95)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.similarity import (
    RECALL_FLOORS,
    RECALL_QUERY_MAX_ID,
    ann_recall,
)
from l1dbproto_spark.queries import load_all

SPECS = load_all()


def test_floor_tables_cover_same_queries():
    """Every floored query has a query-set spec and is registered, and
    every approx query set is a subset of ann_topk_brute's (vec_id < 20)
    — the recall gate scopes the brute result by each spec's predicate,
    which is only sound while brute covers all of them."""
    assert set(RECALL_FLOORS) == set(RECALL_QUERY_MAX_ID)
    assert set(RECALL_FLOORS) <= set(SPECS)
    assert max(RECALL_QUERY_MAX_ID.values()) <= 20


@pytest.mark.parametrize("name", sorted(RECALL_FLOORS))
def test_registered_recall_floor(spark, sf_dir, name):
    exact = SPECS["ann_topk_brute"].builder(spark, sf_dir).filter(
        F.col("query_id") < RECALL_QUERY_MAX_ID[name]
    )
    approx = SPECS[name].builder(spark, sf_dir)
    mean = (
        ann_recall(approx, exact)
        .agg(F.avg("recall").alias("r"))
        .collect()[0]["r"]
    )
    assert mean >= RECALL_FLOORS[name], (
        f"{name} mean recall {mean} under shared floor {RECALL_FLOORS[name]}"
    )


def test_absent_query_counts_as_zero(spark, sf_dir):
    """The scoping contract the bench relies on: a query with NO approx
    rows must appear in ann_recall output with recall 0 (left join from
    the exact side), so empty candidate sets drag the mean down instead
    of dropping out."""
    exact = SPECS["ann_topk_brute"].builder(spark, sf_dir).filter(
        F.col("query_id") < 20
    )
    approx = SPECS["ann_topk_lsh"].builder(spark, sf_dir).filter(
        F.col("query_id") != 3
    )
    rows = {r.query_id: r.recall for r in ann_recall(approx, exact).collect()}
    assert rows[3] == 0.0
    assert len(rows) == 20


def test_lsh_candidate_fraction_under_ceiling(spark, sf_dir):
    """The bench's scan-honesty gate, enforced in-suite from the same
    shared ceiling: the registered LSH parameters' candidate set stays a
    FRACTION of the corpus (recall floors alone could be met by probing
    everything)."""
    from l1dbproto_spark.operators.similarity import (
        LSH_CANDIDATE_FRACTION_CEILING,
        multitable_lsh_candidates,
    )
    from l1dbproto_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    q = emb.filter(F.col("vec_id") < RECALL_QUERY_MAX_ID["ann_topk_lsh"])
    frac = multitable_lsh_candidates(emb, q).count() / (q.count() * (n - 1))
    assert frac <= LSH_CANDIDATE_FRACTION_CEILING, frac
