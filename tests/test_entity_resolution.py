"""Composed entity-resolution pipeline: token-blocked fuzzy matching
(operators/fuzzy.py) -> connected components (operators/graph.py) ->
quality-aware canonical selection (resolve_canonicals). The three stages
already ship individually; this pins the composition contract end to end
— the record-linkage loop every master-data pipeline runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.fuzzy import fuzzy_self_join
from l1dbproto_spark.operators.graph import connected_components, resolve_canonicals
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _er(spark, rows):
    names = spark.createDataFrame([(n,) for n in rows], "name string")
    pairs = fuzzy_self_join(names, "name", max_distance=2)
    comps = connected_components(pairs, "a_name", "b_name")
    scores = names.select(
        F.col("name").alias("doc_id"), F.length("name").alias("score")
    )
    return pairs, resolve_canonicals(comps, scores, id_col="doc_id")


def test_er_pipeline_hand_case(spark):
    rows = [
        "acme corp",            # cluster 1
        "acme  corp",           # 1 edit (extra space)
        "acme corp.",           # 1 edit
        "globex inc",           # cluster 2
        "globex inc.",          # 1 edit
        "wayne enterprises",    # isolate (no near name)
    ]
    pairs, resolved = _er(spark, rows)
    got = {r.doc_id: (r.component, r.canonical_id, r.is_canonical)
           for r in resolved.collect()}
    # isolates never reach the edge list, so only 5 names are clustered
    assert set(got) == set(rows) - {"wayne enterprises"}
    # canonical = max score (longest string), ties to smallest id
    c1 = {"acme corp", "acme  corp", "acme corp."}
    c2 = {"globex inc", "globex inc."}
    for member in c1:
        assert got[member][1] == "acme  corp"  # len 10, tie vs "acme corp." -> smaller string wins
    for member in c2:
        assert got[member][1] == "globex inc."
    # exactly one canonical per cluster
    assert sum(1 for m in c1 if got[m][2]) == 1
    assert sum(1 for m in c2 if got[m][2]) == 1
    # the two clusters stay separate
    assert {got[m][0] for m in c1}.isdisjoint({got[m][0] for m in c2})


def test_er_pipeline_on_part_names(spark):
    """Real-data smoke on part names: composition invariants hold whatever
    the corpus contents — every matched name lands in exactly one
    component, the canonical is a member, exactly one canonical per
    component."""
    part = load_table(spark, SF_DIR, "part").limit(400)
    pairs = fuzzy_self_join(part.select("p_name"), "p_name", max_distance=3)
    comps = connected_components(pairs, "a_name", "b_name")
    # scores must be keyed by id (operator contract): duplicate part names
    # exist, so aggregate to one score per distinct name first
    scores = part.groupBy(F.col("p_name").alias("doc_id")).agg(
        F.max("p_retailprice").alias("score")
    )
    resolved = resolve_canonicals(comps, scores, id_col="doc_id")
    rows = resolved.collect()
    if not rows:  # corpus produced no near-pairs at this distance: fine
        return
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        ids = {m.doc_id for m in members}
        canon = {m.canonical_id for m in members}
        assert len(canon) == 1 and canon <= ids
        assert sum(1 for m in members if m.is_canonical) == 1
    # each name appears once
    all_ids = [r.doc_id for r in rows]
    assert len(all_ids) == len(set(all_ids))


def test_canonical_rank_inv_agrees_on_numeric_ids(spark):
    """The min_by rank struct (string-capable) must pick the same winners
    as the original max_by struct on numeric ids, including NULL-score
    and all-NULL clusters."""
    from l1dbproto_spark.operators.graph import canonical_rank, canonical_rank_inv

    rows = [
        (1, 10, 5.0), (2, 10, 7.0), (3, 10, 7.0),   # tie at 7 -> id 2
        (4, 20, None), (5, 20, 3.0),                 # scored beats unscored
        (6, 30, None), (7, 30, None),                # all unscored -> min id
    ]
    df = spark.createDataFrame(rows, "doc_id long, component long, score double")
    a = {
        r.component: r.w
        for r in df.groupBy("component")
        .agg(F.max_by("doc_id", canonical_rank("score", "doc_id")).alias("w"))
        .collect()
    }
    b = {
        r.component: r.w
        for r in df.groupBy("component")
        .agg(F.min_by("doc_id", canonical_rank_inv("score", "doc_id")).alias("w"))
        .collect()
    }
    assert a == b == {10: 2, 20: 5, 30: 6}
