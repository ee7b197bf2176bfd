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
                     unnest(string_split_regex(trim(lower(text)), '[ \t\r\n\f]+')) AS term
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
        c_head = float(np.percentile(scores, 100 * 2 / 3))
        c_mid = float(np.percentile(scores, 100 * 1 / 3))
        for d, s in members:
            want[d] = (
                "head" if s >= c_head else "middle" if s >= c_mid else "tail"
            )
    assert got == want
    kept = sum(1 for b in got.values() if b != "tail")
    assert 0.5 < kept / len(got) < 0.85  # ~2/3 kept
    # all three buckets are populated and near-thirds overall (the
    # regression this pins: a swapped cut made "middle" unreachable)
    from collections import Counter

    frac = Counter(got.values())
    for b in ("head", "middle", "tail"):
        assert 0.2 < frac[b] / len(got) < 0.47, frac
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


BIGRAM_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '[ \t\r\n\f]+') AS t
  FROM '{SF_DIR}/documents.parquet'
),
r AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos FROM d
),
prows AS (
  SELECT r.doc_id, r.w,
         CASE WHEN r.pos > 1 THEN d.t[r.pos - 1] END AS prev
  FROM r JOIN d USING (doc_id)
),
tf AS (
  SELECT doc_id, prev, w, COUNT(*) AS cnt FROM prows GROUP BY 1, 2, 3
),
uni AS (SELECT w, SUM(cnt) AS c_w FROM tf GROUP BY 1),
tot AS (
  SELECT CAST(SUM(c_w) AS DOUBLE) AS n_tok, CAST(COUNT(*) AS DOUBLE) AS v
  FROM uni
),
pu AS (SELECT w, (c_w + 0.5) / (n_tok + 0.5 * v) AS pu FROM uni, tot),
bi AS (
  SELECT prev, w, SUM(cnt) AS c_vw FROM tf WHERE prev IS NOT NULL
  GROUP BY 1, 2
),
pv AS (SELECT prev, SUM(c_vw) AS c_v FROM bi GROUP BY 1),
pb AS (
  SELECT b.prev, b.w, CAST(b.c_vw AS DOUBLE) / pv.c_v AS pb
  FROM bi b JOIN pv USING (prev)
),
sc AS (
  SELECT tf.doc_id, tf.cnt,
         ln(CASE WHEN tf.prev IS NULL THEN pu.pu
                 ELSE 0.7 * COALESCE(pb.pb, 0.0) + (1.0 - 0.7) * pu.pu
            END) AS lp
  FROM tf
  JOIN pu USING (w)
  LEFT JOIN pb ON pb.prev = tf.prev AND pb.w = tf.w
)
SELECT doc_id, ROUND(SUM(cnt * lp) / SUM(cnt), 9) AS mean_logprob,
       SUM(cnt) AS n_tokens
FROM sc GROUP BY doc_id
"""


def test_bigram_logprob_matches_oracle(spark):
    """Interpolated-bigram scorer vs the full DuckDB CTE chain. The
    (1.0 - 0.7) in the oracle is deliberate: it reproduces the exact
    binary double the Spark side computes for 1 - lam."""
    import pytest as _pytest

    from l1dbproto_spark.operators.quality import bigram_logprob_scores

    docs = load_table(spark, SF_DIR, "documents")
    got = {
        r.doc_id: (r.mean_logprob, r.n_tokens)
        for r in bigram_logprob_scores(docs).collect()
    }
    want = {
        int(d): (float(m), int(n))
        for d, m, n in duckdb.sql(BIGRAM_ORACLE).fetchall()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][1] == want[d][1], d
        assert got[d][0] == _pytest.approx(want[d][0], abs=2e-9), d


def test_bigram_lam_zero_reduces_to_unigram(spark):
    """With lam=0 every position scores ln p_u — the bigram scorer must
    reproduce unigram_logprob_scores exactly (same smoothing, same
    tokenizer, same mean)."""
    import pytest as _pytest

    from l1dbproto_spark.operators.quality import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(100)
    a = {
        r.doc_id: (r.mean_logprob, r.n_tokens)
        for r in bigram_logprob_scores(docs, lam=0.0).collect()
    }
    b = {
        r.doc_id: (r.mean_logprob, r.n_tokens)
        for r in unigram_logprob_scores(docs).collect()
    }
    assert set(a) == set(b)
    for d in a:
        assert a[d][1] == b[d][1]
        assert a[d][0] == _pytest.approx(b[d][0], abs=2e-9), d


def test_bigram_rewards_predictable_text(spark):
    """A document whose bigrams are deterministic (ababab...) must score
    strictly higher under interpolation than under unigram-only (the
    bigram term is ~1 for it), and empty docs produce no rows."""
    from l1dbproto_spark.operators.quality import bigram_logprob_scores

    rows = [
        (1, "a b " * 30),
        (2, "q w e r t y u i o p z x c v b n m j k l"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    interp = {
        r.doc_id: r.mean_logprob
        for r in bigram_logprob_scores(df, lam=0.7).collect()
    }
    unionly = {
        r.doc_id: r.mean_logprob
        for r in bigram_logprob_scores(df, lam=0.0).collect()
    }
    assert interp[1] > unionly[1]
    # empty text tokenizes to [''] under the space-run rule -> 1 token,
    # still present (parity with the unigram scorer's convention)
    assert 3 in interp


def test_pretrained_lm_self_scoring_reproduces_inline(spark):
    """fit_bigram_lm on X then score_with_bigram_lm(X) must reproduce
    bigram_logprob_scores(X) bit-for-bit — same model math, the totals
    merely cross the driver as literals."""
    from l1dbproto_spark.operators.quality import (
        bigram_logprob_scores,
        fit_bigram_lm,
        score_with_bigram_lm,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(150)
    lm = fit_bigram_lm(docs)
    a = {
        r.doc_id: (r.mean_logprob, r.n_tokens)
        for r in score_with_bigram_lm(docs, lm).collect()
    }
    b = {
        r.doc_id: (r.mean_logprob, r.n_tokens)
        for r in bigram_logprob_scores(docs).collect()
    }
    assert a == b


def test_pretrained_lm_oov_floor(spark):
    """Scoring a corpus with unseen words: OOV unigrams take the
    smoothing floor, unseen bigrams fall back to the interpolated
    unigram term — verified against a hand-computed reference."""
    import math

    import pytest as _pytest

    from l1dbproto_spark.operators.quality import (
        fit_bigram_lm,
        score_with_bigram_lm,
    )

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    lm = fit_bigram_lm(train, lam=0.6, smoothing=0.5)
    # training stats: tokens: a=3 b=3 c=1, N=7, V=3 -> denom = 7 + 1.5
    pu = {w: (c + 0.5) / 8.5 for w, c in [("a", 3), ("b", 3), ("c", 1)]}
    oov = 0.5 / 8.5
    # bigram counts: (a,b)=3 ; (b,a)=1 ; (b,c)=1 -> c_v: a·=3, b·=2
    pb = {("a", "b"): 1.0, ("b", "a"): 0.5, ("b", "c"): 0.5}
    test = spark.createDataFrame(
        [(10, "a b z"), (11, "z q")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.mean_logprob
        for r in score_with_bigram_lm(test, lm).collect()
    }

    def p(prev, w):
        u = pu.get(w, oov)
        if prev is None:
            return u
        return 0.6 * pb.get((prev, w), 0.0) + (1 - 0.6) * u

    want10 = (
        math.log(p(None, "a")) + math.log(p("a", "b")) + math.log(p("b", "z"))
    ) / 3
    want11 = (math.log(p(None, "z")) + math.log(p("z", "q"))) / 2
    assert got[10] == _pytest.approx(want10, abs=1e-8)
    assert got[11] == _pytest.approx(want11, abs=1e-8)


def test_pretrained_lm_persist_roundtrip(spark, tmp_path):
    from l1dbproto_spark.operators.quality import (
        fit_bigram_lm,
        load_bigram_lm,
        save_bigram_lm,
        score_with_bigram_lm,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(80)
    lm = fit_bigram_lm(docs)
    save_bigram_lm(lm, str(tmp_path / "lm"))
    lm2 = load_bigram_lm(spark, str(tmp_path / "lm"))
    a = {
        r.doc_id: (r.mean_logprob, r.n_tokens)
        for r in score_with_bigram_lm(docs, lm).collect()
    }
    b = {
        r.doc_id: (r.mean_logprob, r.n_tokens)
        for r in score_with_bigram_lm(docs, lm2).collect()
    }
    assert a == b
    assert lm2.lam == lm.lam and lm2.oov_pu == lm.oov_pu


COLLOC_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '[ \t\r\n\f]+') AS t
  FROM '{SF_DIR}/documents.parquet'
),
r AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos FROM d
),
pairs AS (
  SELECT d.t[r.pos - 1] AS w1, r.w AS w2, COUNT(*) AS pair_count
  FROM r JOIN d USING (doc_id) WHERE r.pos > 1 GROUP BY 1, 2
),
m1 AS (SELECT w1, SUM(pair_count) AS c1 FROM pairs GROUP BY 1),
m2 AS (SELECT w2, SUM(pair_count) AS c2 FROM pairs GROUP BY 1),
tot AS (SELECT CAST(SUM(pair_count) AS DOUBLE) AS n FROM pairs)
SELECT p.w1, p.w2, p.pair_count,
       ROUND(ln(tot.n * p.pair_count / (m1.c1 * m2.c2)), 9) AS pmi
FROM pairs p JOIN m1 USING (w1) JOIN m2 USING (w2), tot
WHERE p.pair_count >= 3
"""


def test_collocations_match_oracle(spark):
    import pytest as _pytest

    from l1dbproto_spark.operators.quality import collocations

    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r.w1, r.w2): (r.pair_count, r.pmi)
        for r in collocations(docs, min_count=3).collect()
    }
    want = {
        (a, b): (int(c), float(p))
        for a, b, c, p in duckdb.sql(COLLOC_ORACLE).fetchall()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == _pytest.approx(want[k][1], abs=1e-8)


def test_collocations_find_planted_phrase(spark):
    from l1dbproto_spark.operators.quality import collocations

    rows = [
        (i, f"filler{i}a new york filler{i}b stuff{i % 3}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = collocations(df, min_count=5, top_k=1).collect()
    assert (top[0].w1, top[0].w2) == ("new", "york")


def test_duplication_density(spark):
    """Exact clones score 1.0, unique docs 0.0, a half-shared doc in
    between; DuckDB oracle over the same shingle construction."""
    from l1dbproto_spark.operators.dedup import duplication_density

    shared = " ".join(f"s{i}" for i in range(12))
    uniq = {d: " ".join(f"u{d}x{i}" for i in range(12)) for d in (3, 4)}
    rows = [
        (1, shared),
        (2, shared),                       # clone of 1 -> 1.0
        (3, uniq[3]),                      # unique -> 0.0
        (4, uniq[4] + " " + shared),       # half shared
        (5, "a b"),   # shorter than n: ONE truncated shingle, unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_ngrams, r.n_duplicated, r.dup_density)
        for r in duplication_density(df, n=3).collect()
    }
    assert got[1][2] == 1.0 and got[2][2] == 1.0
    assert got[3][2] == 0.0
    assert 0.0 < got[4][2] < 1.0
    assert got[5] == (1, 0, 0.0)
    # DuckDB oracle on the documents fixture
    import duckdb as _dd

    docs = load_table(spark, SF_DIR, "documents")
    want = {
        int(d): (int(a), int(b), float(x))
        for d, a, b, x in _dd.sql(
            f"""
            WITH sh AS (
              -- mirrors shingle_rows: short docs get ONE truncated
              -- shingle (greatest(len-2, 1); concat_ws skips the NULL
              -- out-of-range elements)
              SELECT DISTINCT doc_id,
                concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
              FROM (
                SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
                FROM '{SF_DIR}/documents.parquet'
              ), unnest(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)
            ),
            dfr AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
            per AS (
              SELECT sh.doc_id, COUNT(*) AS n,
                     SUM(CASE WHEN dfr.df >= 2 THEN 1 ELSE 0 END) AS nd
              FROM sh JOIN dfr USING (shingle) GROUP BY 1
            )
            SELECT d.doc_id, COALESCE(per.n, 0), COALESCE(per.nd, 0),
                   CASE WHEN COALESCE(per.n, 0) > 0
                        THEN COALESCE(per.nd, 0) / per.n ELSE 0.0 END
            FROM '{SF_DIR}/documents.parquet' d LEFT JOIN per USING (doc_id)
            """
        ).fetchall()
    }
    got2 = {
        r.doc_id: (r.n_ngrams, r.n_duplicated, round(r.dup_density, 9))
        for r in duplication_density(docs, n=3).collect()
    }
    want = {d: (a, b, round(x, 9)) for d, (a, b, x) in want.items()}
    assert got2 == want
