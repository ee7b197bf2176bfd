"""DSIR importance resampling (operators/dsir.py): DuckDB-oracle parity of
the hashed-feature weights, selection enrichment, and plan-shape guards."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.dsir import (
    bucket_distribution,
    dsir_select,
    hashed_ngram_features,
    importance_log_weights,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
B = 512  # small dense model keeps the oracle query cheap


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def _target(spark):
    # the "curated domain": a small, linguistically distinctive slice
    return _docs(spark).filter(
        (F.col("lang") == "es") & (F.col("doc_id") % 5 == 0)
    )


# DuckDB rendering of the whole weight computation; {src} is a SQL relation
# producing (doc_id, text).
FEATS = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM {src}
    ),
    grams AS (
      SELECT doc_id, unnest(t) AS g FROM toks
      UNION ALL
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS g
      FROM toks
    )
    SELECT doc_id,
           CAST(concat('0x', substr(md5(concat('dsir-v1', g)), 1, 15))
                AS BIGINT) % {b} AS bucket,
           COUNT(*) AS cnt
    FROM grams GROUP BY 1, 2
"""

PROBS = """
    SELECT d.bucket,
           (COALESCE(c._c, 0) + 1.0)
             / ((SELECT SUM(cnt) FROM feats_{tag}) + 1.0 * {b}) AS prob
    FROM (SELECT unnest(generate_series(0, {b} - 1)) AS bucket) d
    LEFT JOIN (SELECT bucket, SUM(cnt) AS _c FROM feats_{tag}
               GROUP BY bucket) c USING (bucket)
"""


def _oracle_weights():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW raw_docs AS SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.sql(
        "CREATE VIEW tgt_docs AS SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') "
        "WHERE lang = 'es' AND doc_id % 5 = 0"
    )
    con.sql(
        "CREATE TEMP TABLE feats_raw AS "
        + FEATS.format(src="raw_docs", b=B)
    )
    con.sql(
        "CREATE TEMP TABLE feats_tgt AS "
        + FEATS.format(src="tgt_docs", b=B)
    )
    con.sql("CREATE TEMP TABLE p_raw AS " + PROBS.format(tag="raw", b=B))
    con.sql("CREATE TEMP TABLE p_tgt AS " + PROBS.format(tag="tgt", b=B))
    rows = con.sql(
        """
        SELECT d.doc_id,
               COALESCE(w.lw, 0.0) AS log_weight
        FROM raw_docs d
        LEFT JOIN (
          SELECT f.doc_id,
                 SUM(f.cnt * (ln(t.prob) - ln(r.prob))) AS lw
          FROM feats_raw f
          JOIN p_tgt t USING (bucket)
          JOIN p_raw r USING (bucket)
          GROUP BY f.doc_id
        ) w USING (doc_id)
        """
    ).fetchall()
    con.close()
    return {int(d): float(w) for d, w in rows}


def test_log_weights_match_duckdb_oracle(spark):
    got = {
        r.doc_id: r.log_weight
        for r in importance_log_weights(
            _docs(spark), _target(spark), num_buckets=B
        ).collect()
    }
    want = _oracle_weights()
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9, abs=1e-9), d


def test_bucket_distribution_dense_and_normalized(spark):
    feats = hashed_ngram_features(_docs(spark), num_buckets=B)
    probs = bucket_distribution(feats, num_buckets=B).collect()
    assert len(probs) == B  # dense by construction
    assert sum(r.prob for r in probs) == pytest.approx(1.0, abs=1e-9)
    assert all(r.prob > 0 for r in probs)  # smoothing floor


def test_selection_enriches_target_domain(spark):
    """Documents resembling the es target slice should dominate the
    selection: the selected set's es-fraction must beat the corpus
    baseline by a wide margin."""
    docs = _docs(spark)
    sel = dsir_select(docs, _target(spark), k=50, num_buckets=B)
    rows = sel.select("doc_id", "lang", "log_weight", "sel_key").collect()
    assert len(rows) == 50
    base = docs.filter(F.col("lang") == "es").count() / docs.count()
    frac = sum(1 for r in rows if r.lang == "es") / len(rows)
    assert frac > min(2 * base, 0.8), (frac, base)


def test_select_topk_matches_oracle_ranking(spark):
    """Hard (gumbel=False) top-k equals the oracle's weight ranking."""
    got = [
        r.doc_id
        for r in dsir_select(
            _docs(spark), _target(spark), k=25, num_buckets=B, gumbel=False
        ).collect()
    ]
    want = [
        d
        for d, _ in sorted(
            _oracle_weights().items(), key=lambda kv: (-kv[1], kv[0])
        )[:25]
    ]
    assert got == want


def test_empty_doc_gets_neutral_weight(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame([(9, "alpha beta")], "doc_id long, text string")
    w = {
        r.doc_id: r.log_weight
        for r in importance_log_weights(docs, tgt, num_buckets=64).collect()
    }
    assert w[2] == 0.0 and w[3] == 0.0
    assert len(w) == 3


def test_plan_broadcast_ratio_and_takeordered(spark):
    """Scale guards: the bounded log-ratio table is broadcast into the
    weight join, and selection runs as TakeOrdered, not a global sort."""
    sel = dsir_select(
        _docs(spark), _target(spark), k=10, num_buckets=B, gumbel=False
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_normalized_weights_bridge(spark):
    """Stable log->linear conversion: max weight maps to exactly 1.0,
    ordering preserved, temperature flattens, and the output feeds
    weighted_sample without overflow."""
    import math

    from l1dbproto_spark.operators.dsir import normalized_weights
    from l1dbproto_spark.operators.sampling import weighted_sample

    w = importance_log_weights(_docs(spark), _target(spark), num_buckets=B)
    nw = normalized_weights(w)
    rows = {r.doc_id: (r.log_weight, r.weight) for r in nw.collect()}
    mx = max(lw for lw, _ in rows.values())
    for d, (lw, wt) in rows.items():
        assert wt == pytest.approx(math.exp(lw - mx), rel=1e-12)
        assert 0.0 < wt <= 1.0
    # temperature flattens: T=10 pulls weights toward 1
    flat = {
        r.doc_id: r.weight
        for r in normalized_weights(w, temperature=10.0).collect()
    }
    assert sum(flat.values()) > sum(wt for _, wt in rows.values())
    # composes with the acceptance sampler
    sampled = weighted_sample(
        _docs(spark).join(nw, "doc_id"), "weight", target_fraction=0.3
    )
    n = sampled.count()
    assert 0 < n < 500
