"""Negative mining (operators/negatives.py): DuckDB re-derivation of the
hard-negative selection with label + explicit-positive exclusion over the
embeddings fixture (labels synthesized from vec_id, the injected-structure
pattern), hash-parity for the easy draw, exclusion-before-ranking
semantics, and the assembled contrastive pair table's shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.negatives import (
    contrastive_pairs,
    mine_hard_negatives,
    sample_easy_negatives,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

_COS = """round(
      list_dot_product(qv, cv)
      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 9)"""


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    yield con
    con.close()


def _labeled(spark):
    return load_table(spark, SF_DIR, "embeddings").withColumn(
        "label", (F.col("vec_id") % 4).cast("string")
    )


def test_hard_negatives_match_duckdb_with_label_and_pair_exclusion(
    spark, duck
):
    emb = _labeled(spark)
    anchors = emb.filter(F.col("vec_id") < 12)
    positives = spark.createDataFrame(
        [(a, d) for a in range(12) for d in (a + 100, a + 101)],
        "anchor_id long, neighbor_id long",
    )
    got = {
        (r.anchor_id, r.rank): (r.neighbor_id, r.cosine_sim)
        for r in mine_hard_negatives(
            emb, anchors, k=5, label_col="label", positives=positives
        ).collect()
    }
    want = {
        (a, rk): (n, s)
        for a, n, s, rk in duck.execute(
            f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 CAST(vec_id % 4 AS VARCHAR) AS label
          FROM embeddings
        ),
        q AS (SELECT vec_id AS anchor_id, v AS qv, label AS albl
              FROM e WHERE vec_id < 12),
        c AS (SELECT vec_id AS neighbor_id, v AS cv, label AS clbl FROM e),
        pos AS (
          SELECT a.vec_id AS anchor_id, a.vec_id + off AS neighbor_id
          FROM e a, (VALUES (100), (101)) t(off) WHERE a.vec_id < 12
        ),
        scored AS (
          SELECT anchor_id, neighbor_id, {_COS} AS cosine_sim
          FROM c, q
          WHERE neighbor_id <> anchor_id AND clbl <> albl
            AND NOT EXISTS (SELECT 1 FROM pos p
                            WHERE p.anchor_id = q.anchor_id
                              AND p.neighbor_id = c.neighbor_id)
        )
        SELECT anchor_id, neighbor_id, cosine_sim, rank FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY anchor_id ORDER BY cosine_sim DESC, neighbor_id
          ) AS rank FROM scored
        ) WHERE rank <= 5
        """
        ).fetchall()
    }
    assert got == want and len(got) == 60
    # exclusion is exact: no positive pair, no same-label doc anywhere
    for (a, _), (n, _) in got.items():
        assert n not in (a + 100, a + 101)
        assert n % 4 != a % 4


def test_exclusion_happens_before_ranking_not_overfetch(spark):
    """An anchor whose nearest neighbors are ALL positives must still get
    k true negatives — the defining difference from overfetch-and-filter.
    Fixture: anchor 0's three clones (cosine 1.0) are its positives; the
    mined negatives must be the remaining docs, full k of them."""
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0]),
            (4, [0.9, 0.1]), (5, [0.5, 0.5]), (6, [0.1, 0.9])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    anchors = emb.filter(F.col("vec_id") == 0)
    positives = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "anchor_id long, neighbor_id long"
    )
    got = [
        r.neighbor_id
        for r in mine_hard_negatives(emb, anchors, k=3, positives=positives)
        .orderBy("rank")
        .collect()
    ]
    assert got == [4, 5, 6]


def test_easy_negatives_deterministic_and_excluding(spark):
    emb = _labeled(spark)
    anchors = emb.filter(F.col("vec_id") < 6)
    out = sample_easy_negatives(emb, anchors, m=4, label_col="label")
    rows = out.collect()
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append((r.rank, r.neighbor_id))
        assert r.neighbor_id % 4 != r.anchor_id % 4  # label exclusion
        assert r.neighbor_id != r.anchor_id
    assert set(by_anchor) == set(range(6))
    assert all(sorted(rk for rk, _ in v) == [1, 2, 3, 4] for v in by_anchor.values())
    # deterministic: re-run identical; different salt: different draw
    again = {(r.anchor_id, r.rank): r.neighbor_id for r in out.collect()}
    assert all(again[(r.anchor_id, r.rank)] == r.neighbor_id for r in rows)
    other = sample_easy_negatives(emb, anchors, m=4, label_col="label", salt="v2")
    assert {(r.anchor_id, r.neighbor_id) for r in other.collect()} != {
        (r.anchor_id, r.neighbor_id) for r in rows
    }


def test_contrastive_pairs_assembly(spark):
    emb = _labeled(spark)
    anchors = emb.filter(F.col("vec_id") < 4)
    out = contrastive_pairs(
        emb, anchors, k_hard=3, m_easy=2, label_col="label"
    ).collect()
    kinds = {}
    for r in out:
        kinds.setdefault((r.anchor_id, r.kind), []).append(r)
        if r.kind == "easy":
            assert r.cosine_sim is None
        else:
            assert r.cosine_sim is not None
    for a in range(4):
        assert len(kinds[(a, "hard")]) == 3
        assert len(kinds[(a, "easy")]) == 2


def test_string_ids_positive_exclusion(spark):
    """r11 review find: a hardcoded long cast nulled string ids and the
    positive exclusion silently matched nothing. The pairs now cast to
    the corpus id type — string-keyed corpora exclude exactly."""
    rows = [("a", [1.0, 0.0]), ("b", [1.0, 0.0]), ("c", [0.9, 0.1]),
            ("d", [0.5, 0.5])]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    anchors = emb.filter(F.col("vec_id") == "a")
    positives = spark.createDataFrame(
        [("a", "b")], "anchor_id string, neighbor_id string"
    )
    got = [
        r.neighbor_id
        for r in mine_hard_negatives(emb, anchors, k=2, positives=positives)
        .orderBy("rank")
        .collect()
    ]
    assert got == ["c", "d"]  # "b" (cosine 1.0) excluded, not rank-1
