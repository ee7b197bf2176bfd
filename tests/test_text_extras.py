"""Unregistered text operators: DuckDB-oracle parity in-suite (the driver
registry is capped at 50)."""

from __future__ import annotations

import duckdb

from l1dbproto_spark.queries.text import unigram_logprob_score

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
