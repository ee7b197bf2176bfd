"""Benchmark-contamination detection (operators/contamination.py): DuckDB
oracle parity for the n-gram overlap report plus the decontamination
invariants. The eval set is carved out of the corpus itself (every 50th
doc), so self-pairs are verbatim inclusions (contamination exactly 1.0)
and cross-doc overlaps exercise the partial-overlap path."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from l1dbproto_spark.operators.contamination import (
    decontaminate,
    ngram_contamination,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

# mirrors queries/dedup.py's _SHINGLES_CTE (normalize_text + word_shingles,
# n=3) but parameterized on the parquet path
_SHINGLES = rf"""
docs AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
  FROM '{SF_DIR}/documents.parquet'
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM docs, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS t(i)
)
"""


def _eval_set(docs):
    return docs.filter(F.col("doc_id") % 50 == 0)


def test_ngram_contamination_matches_oracle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r.doc_id, r.eval_id): (
            r.n_shared,
            r.eval_ngrams,
            round(r.contamination, 9),
        )
        for r in ngram_contamination(
            docs, _eval_set(docs), n=3, min_overlap=2
        ).collect()
    }
    want = {
        (row[0], row[1]): (row[2], row[3], round(row[4], 9))
        for row in duckdb.sql(
            f"""
            WITH {_SHINGLES},
            esh AS (
              SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 50 = 0
            ),
            esz AS (
              SELECT eval_id, COUNT(*) AS eval_ngrams FROM esh GROUP BY 1
            ),
            shared AS (
              SELECT c.doc_id, e.eval_id, COUNT(*) AS n_shared
              FROM sh c JOIN esh e USING (shingle)
              GROUP BY 1, 2 HAVING COUNT(*) >= 2
            )
            SELECT doc_id, eval_id, n_shared, eval_ngrams,
                   CAST(n_shared AS DOUBLE) / eval_ngrams AS contamination
            FROM shared JOIN esz USING (eval_id)
            """
        ).fetchall()
    }
    assert got == want
    # every eval doc is its own verbatim inclusion: contamination exactly 1.0
    self_pairs = {k: v for k, v in got.items() if k[0] == k[1]}
    assert len(self_pairs) == 10  # 500 docs, every 50th
    assert all(v[2] == 1.0 for v in self_pairs.values())


def test_decontaminate_removes_all_overlap(spark):
    docs = load_table(spark, SF_DIR, "documents")
    ev = _eval_set(docs)
    clean, dropped = decontaminate(docs, ev, n=3, max_contamination=0.0)
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    drop_rows = {r.doc_id: (r.eval_id, r.contamination) for r in dropped.collect()}
    # partition: every doc is kept or dropped, never both
    assert clean_ids.isdisjoint(drop_rows)
    assert len(clean_ids) + len(drop_rows) == docs.count()
    # eval members are verbatim inclusions of themselves -> always dropped
    # at worst-contamination exactly 1.0 (the worst EVAL ID may be another
    # eval doc: the repetitive synthetic corpus produces cross-doc 1.0 ties,
    # broken by largest eval_id)
    for eid in (r.doc_id for r in ev.select("doc_id").collect()):
        assert drop_rows[eid][1] == 1.0
    # fixed point: the clean corpus has NO shared n-gram with the eval set
    assert ngram_contamination(clean, ev, n=3, min_overlap=1).count() == 0


def test_decontaminate_threshold_keeps_light_overlap(spark):
    """With a permissive threshold only heavy matches drop; the drop log
    carries each doc's WORST eval match."""
    docs = load_table(spark, SF_DIR, "documents")
    ev = _eval_set(docs)
    report = ngram_contamination(docs, ev, n=3, min_overlap=1)
    clean, dropped = decontaminate(docs, ev, n=3, max_contamination=0.5)
    flagged = {
        r.doc_id
        for r in report.filter(F.col("contamination") > 0.5)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert {r.doc_id for r in dropped.collect()} == flagged
    # worst-match bookkeeping: dropped contamination == max over the report
    worst = {
        r.doc_id: round(r.m, 9)
        for r in report.groupBy("doc_id")
        .agg(F.max("contamination").alias("m"))
        .collect()
    }
    for r in dropped.collect():
        assert round(r.contamination, 9) == worst[r.doc_id]


def test_decontaminate_custom_id_col(spark):
    """The report canonicalizes ids to 'doc_id' (word_shingles contract),
    but the clean side must anti-join on the CALLER's id column."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta"),
         (3, "alpha beta gamma delta iota")],
        ["my_id", "text"],
    )
    ev = docs.filter(F.col("my_id") == 1)
    clean, worst = decontaminate(docs, ev, n=3, id_col="my_id")
    assert clean.columns == docs.columns
    kept = {r.my_id for r in clean.collect()}
    dropped = {r.doc_id for r in worst.collect()}
    assert 1 in dropped  # self-inclusion
    assert 3 in dropped  # contains all of doc 1's trigrams
    assert kept == {2}


def test_decontaminate_anti_join_not_forced_broadcast(spark):
    """The clean-side anti-join must carry NO broadcast hint: how many
    corpus docs touch an eval shingle is data-dependent (a template leak
    can flag a large corpus fraction), so a mandatory broadcast OOMs
    executors at scale. With the broadcast threshold disabled the planner
    must be free to pick a shuffled anti-join — a lingering F.broadcast
    hint would still show BroadcastHashJoin on the drop set and fail.
    (The EVAL-side joins inside the report keep their hints: benchmarks
    are MB-sized by construction.)"""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    docs = load_table(spark, SF_DIR, "documents")
    try:
        for k in saved:
            conf.set(k, "-1")
        clean, _ = decontaminate(docs, _eval_set(docs), n=3)
        plan = clean._jdf.queryExecution().executedPlan().toString()
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti, plan
        assert not any("BroadcastHashJoin" in ln for ln in anti), plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


# --- semantic (embedding-space) contamination ------------------------------


def _sem_fixture(spark):
    """Corpus embeddings with two planted eval near-clones, one far pair,
    and one degenerate (zero-norm) vector."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for i in range(30):
        v = rng.standard_normal(8)
        rows.append((i, [float(x) for x in v]))
    rows.append((100, [0.0] * 8))  # degenerate
    corpus = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    # eval 0 == clone of corpus 3 (plus tiny noise), eval 1 == clone of 7,
    # eval 2 == unrelated
    def clone(i, eps):
        base = np.array(rows[i][1])
        return [float(x) for x in base + eps * rng.standard_normal(8)]

    ev = spark.createDataFrame(
        [
            (0, clone(3, 1e-3)),
            (1, clone(7, 1e-3)),
            (2, [float(x) for x in rng.standard_normal(8)]),
        ],
        "eval_id long, embedding array<double>",
    )
    return corpus, ev


def test_semantic_contamination_brute_matches_numpy(spark):
    import numpy as np

    from l1dbproto_spark.operators.contamination import semantic_contamination

    corpus, ev = _sem_fixture(spark)
    got = {
        (r.doc_id, r.eval_id): r.cosine_sim
        for r in semantic_contamination(corpus, ev, threshold=0.9).collect()
    }
    cp = {r.doc_id: np.array(r.embedding) for r in corpus.collect()}
    ep = {r.eval_id: np.array(r.embedding) for r in ev.collect()}
    want = {}
    for d, dv in cp.items():
        nd = np.linalg.norm(dv)
        if nd == 0:
            continue
        for e, evv in ep.items():
            c = round(float(dv @ evv / (nd * np.linalg.norm(evv))), 9)
            if c >= 0.9:
                want[(d, e)] = c
    assert set(got) == set(want) == {(3, 0), (7, 1)}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_semantic_contamination_cluster_pruned_catches_clones(spark):
    from pyspark.sql import functions as F

    from l1dbproto_spark.operators.contamination import semantic_contamination

    corpus, ev = _sem_fixture(spark)
    cents = corpus.filter(F.col("doc_id") < 4).select(
        F.col("doc_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    pruned = {
        (r.doc_id, r.eval_id)
        for r in semantic_contamination(
            corpus, ev, threshold=0.9, centroids=cents, n_probe=2
        ).collect()
    }
    brute = {
        (r.doc_id, r.eval_id)
        for r in semantic_contamination(corpus, ev, threshold=0.9).collect()
    }
    # identical-vector clones always share their original's cluster
    assert {(3, 0), (7, 1)} <= pruned
    assert pruned <= brute  # pruning only ever removes candidates


def test_decontaminate_semantic_drops_clones_keeps_rest(spark):
    from pyspark.sql import functions as F

    from l1dbproto_spark.operators.contamination import decontaminate_semantic

    corpus_vecs, ev = _sem_fixture(spark)
    docs = corpus_vecs.select(
        "doc_id", F.concat(F.lit("text-"), F.col("doc_id")).alias("text")
    )
    clean, dropped = decontaminate_semantic(
        docs, corpus_vecs, ev, threshold=0.9
    )
    kept = {r.doc_id for r in clean.collect()}
    log = {r.doc_id: (r.eval_id, r.cosine_sim) for r in dropped.collect()}
    assert set(log) == {3, 7}
    assert log[3][0] == 0 and log[7][0] == 1
    assert log[3][1] > 0.99 and log[7][1] > 0.99
    assert kept == {r.doc_id for r in docs.collect()} - {3, 7}


def test_semantic_contamination_cluster_plan_shape(spark):
    """Cluster path: no cartesian/nested-loop join; the eval side enters
    as a broadcast."""
    from pyspark.sql import functions as F

    from l1dbproto_spark.operators.contamination import semantic_contamination

    corpus, ev = _sem_fixture(spark)
    cents = corpus.filter(F.col("doc_id") < 4).select(
        F.col("doc_id").cast("int").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    df = semantic_contamination(
        corpus, ev, threshold=0.9, centroids=cents, n_probe=2
    )
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop join allowed is the centroid-assignment
    # broadcast crossJoin against the BOUNDED n_clusters-row table (the
    # IVF assignment pattern, same as the ann_topk_ivf plans); the
    # corpus-vs-eval cosine join must be a hash join on the cluster key
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_decontaminate_semantic_pipeline_stage(spark):
    from pyspark.sql import functions as F

    from l1dbproto_spark.operators.pipeline import run_pipeline

    corpus_vecs, ev = _sem_fixture(spark)
    docs = corpus_vecs.select(
        "doc_id", F.concat(F.lit("text-"), F.col("doc_id")).alias("text")
    )
    out, audit = run_pipeline(
        docs,
        [
            {
                "stage": "decontaminate_semantic",
                "corpus_vecs": corpus_vecs,
                "eval_vecs": ev,
                "threshold": 0.9,
            }
        ],
    )
    assert {r.doc_id for r in out.collect()} == (
        {r.doc_id for r in docs.collect()} - {3, 7}
    )
    assert audit[-1]["rows"] == docs.count() - 2


def test_min_shingle_len_prunes_trivial_ngrams(spark):
    """The documented min_shingle_len knob exists and prunes short
    shingles from the index (and hence from the report's matches AND its
    eval_ngrams denominator)."""
    from l1dbproto_spark.operators.contamination import (
        build_eval_index,
        ngram_contamination,
    )

    ev = spark.createDataFrame(
        [(0, "a b c d longwordone longwordtwo longwordthree")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(10, "a b c d longwordone longwordtwo longwordthree trailing")],
        "doc_id long, text string",
    )
    loose = ngram_contamination(corpus, ev, n=3)
    tight = ngram_contamination(corpus, ev, n=3, min_shingle_len=20)
    l0 = loose.collect()[0]
    t0 = tight.collect()[0]
    assert t0.n_shared < l0.n_shared
    assert t0.eval_ngrams < l0.eval_ngrams
    # index form agrees
    idx = build_eval_index(ev, n=3, cache=False, min_shingle_len=20)
    via_idx = ngram_contamination(corpus, index=idx, n=3).collect()[0]
    assert (via_idx.n_shared, via_idx.eval_ngrams) == (
        t0.n_shared, t0.eval_ngrams,
    )
