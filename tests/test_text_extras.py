"""Unregistered text operators: DuckDB-oracle parity in-suite (the driver
registry is capped at 50)."""

from __future__ import annotations

import duckdb

from l1dbproto_spark.queries.text import unigram_logprob_score
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_unigram_logprob_matches_oracle(spark):
    got = {
        r.doc_id: (r.mean_logprob, r.n_tokens)
        for r in unigram_logprob_score(spark, SF_DIR).collect()
    }
    want = {
        d: (lp, n)
        for d, lp, n in duckdb.sql(
            f"""
            WITH words AS (
              SELECT doc_id,
                     unnest(string_split_regex(trim(lower(text)), ' +')) AS term
              FROM '{SF_DIR}/documents.parquet'
            ),
            vocab AS (SELECT term, COUNT(*) AS cnt FROM words GROUP BY 1),
            tot AS (SELECT SUM(cnt) AS n, COUNT(*) AS v FROM vocab),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2)
            SELECT doc_id,
                   round(SUM(tf * ln((cnt + 0.5) / (n + 0.5 * v))) / SUM(tf), 9)
                     AS mean_logprob,
                   SUM(tf) AS n_tokens
            FROM tf JOIN vocab USING (term) CROSS JOIN tot
            GROUP BY doc_id
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d][1] == want[d][1]
        assert abs(got[d][0] - want[d][0]) < 1e-9, (d, got[d], want[d])
    # sanity: scores are negative log-probs and finite
    assert all(lp < 0 for lp, _ in got.values())


def test_perplexity_buckets_match_reference(spark):
    """CCNet head/middle/tail bucketing: per-group exact tertile cuts with
    ties-to-better; parity with a Python reference over the unigram
    scores, and the published keep policy (head+middle) drops ~1/3."""
    import numpy as np

    from l1dbproto_spark.operators.quality import (
        perplexity_buckets,
        unigram_logprob_scores,
    )

    docs = load_table(spark, SF_DIR, "documents")
    scored = unigram_logprob_scores(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    got = {
        r.doc_id: r.bucket
        for r in perplexity_buckets(scored, group_col="lang").collect()
    }
    rows = scored.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((r.doc_id, r.mean_logprob))
    want = {}
    for lang, members in by_lang.items():
        scores = [s for _, s in members]
        # numpy 'linear' interpolation == Spark/DuckDB percentile (cont.)
        c_head = float(np.percentile(scores, 100 * (1 - 2 / 3)))
        c_mid = float(np.percentile(scores, 100 * (1 - 1 / 3)))
        for d, s in members:
            want[d] = (
                "head" if s >= c_head else "middle" if s >= c_mid else "tail"
            )
    assert got == want
    kept = sum(1 for b in got.values() if b != "tail")
    assert 0.5 < kept / len(got) < 0.85  # ~2/3 kept
    # ungrouped form works and partitions the corpus
    flat = perplexity_buckets(scored, group_col=None)
    assert flat.count() == len(got)


def test_perplexity_buckets_plan_no_corpus_shuffle(spark):
    """The cut table is broadcast back: no sort-merge join, and the only
    hash exchanges belong to the score aggregation, not the bucket join."""
    from l1dbproto_spark.operators.quality import perplexity_buckets

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", float(i % 17)) for i in range(300)],
        ["doc_id", "lang", "mean_logprob"],
    )
    df = perplexity_buckets(docs, group_col="lang")
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
