"""Deterministic sampling operators (operators/sampling.py): DuckDB-oracle
equivalence of the hash draws plus the mixture/stratification invariants."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from l1dbproto_spark.operators.sampling import (
    sample_mixture,
    sample_with_temperature,
    stratified_sample,
    temperature_rates,
    with_repeats,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

# DuckDB rendering of _unit_hash (same md5/substr/conv formula)
U = (
    "CAST(concat('0x', substr(md5(concat('{salt}', CAST(doc_id AS VARCHAR))), 1, 12))"
    " AS BIGINT) / CAST(281474976710656 AS DOUBLE)"
)


def test_sample_mixture_matches_oracle(spark):
    rates = {"en": 0.8, "es": 0.25}
    got = sorted(
        r.doc_id
        for r in sample_mixture(
            load_table(spark, SF_DIR, "documents"), rates, source_col="lang"
        ).collect()
    )
    u = U.format(salt="mix-v1")
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"""
            SELECT doc_id FROM '{SF_DIR}/documents.parquet'
            WHERE {u} < CASE lang WHEN 'en' THEN 0.8 WHEN 'es' THEN 0.25
                        ELSE 0.0 END
            """
        ).fetchall()
    )
    assert got == want and 0 < len(got)


def test_sample_mixture_append_stable(spark):
    """Re-sampling a SUPERSET corpus keeps every previously-kept document —
    the property that lets a 100 TB mixture be rebuilt incrementally."""
    docs = load_table(spark, SF_DIR, "documents")
    rates = {"en": 0.5}
    small = sample_mixture(docs.filter(F.col("doc_id") < 200), rates)
    big = sample_mixture(docs, rates)
    small_ids = {r.doc_id for r in small.collect()}
    big_ids = {r.doc_id for r in big.collect()}
    assert small_ids <= big_ids


def test_with_repeats_upsamples(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = with_repeats(docs, {"en": 2.25, "es": 0.5}).cache()
    try:
        pdf = out.select("doc_id", "lang", "repeat").toPandas()
        en = pdf[pdf.lang == "en"].groupby("doc_id").size()
        n_en_docs = docs.filter(F.col("lang") == "en").count()
        # every en doc appears 2 or 3 times, repeats indexed from 0
        assert set(en.unique()) <= {2, 3}
        assert len(en) == n_en_docs
        assert (2.0 < en.sum() / n_en_docs < 2.5)  # ~2.25 on average
        es = pdf[pdf.lang == "es"].groupby("doc_id").size()
        assert set(es.unique()) <= {1}  # fractional-only rate: 0 or 1 copies
        # repeat indices are dense from 0 per doc
        reps = pdf[pdf.lang == "en"].groupby("doc_id")["repeat"].apply(
            lambda s: sorted(s)
        )
        assert all(r == list(range(len(r))) for r in reps)
    finally:
        out.unpersist()


def test_stratified_sample_matches_oracle(spark):
    got = (
        stratified_sample(
            load_table(spark, SF_DIR, "documents"), k=7, strata_cols="lang"
        )
        .select("doc_id", "lang", "sample_rank")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    u = U.format(salt="strat-v1")
    want = (
        duckdb.sql(
            f"""
            SELECT doc_id, lang, rnk AS sample_rank FROM (
              SELECT doc_id, lang, ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY {u}, doc_id
              ) AS rnk
              FROM '{SF_DIR}/documents.parquet'
            ) t WHERE rnk <= 7
            """
        )
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # exactly 7 per stratum (each language has >= 7 docs at sf0.001)
    per = got.groupby("lang").size()
    assert (per == 7).all()


def test_sample_mixture_plan_is_shuffle_free(spark):
    """The mixture filter must stay a pure per-row scan — zero exchanges —
    so the 100 TB pass is bounded by the scan alone."""
    df = sample_mixture(
        load_table(spark, SF_DIR, "documents"), {"en": 0.5}, source_col="lang"
    )
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# DuckDB rendering of temperature_rates: per-source counts -> exponentially
# smoothed target shares -> per-doc keep rates (same arithmetic, same
# association order as the Spark plan)
_RATES_SQL = f"""
c AS (
  SELECT lang AS source, CAST(COUNT(*) AS DOUBLE) AS n
  FROM '{SF_DIR}/documents.parquet' GROUP BY 1
),
t AS (SELECT SUM(n) AS tot, SUM(pow(n, 0.3)) AS za FROM c),
s AS (
  SELECT source, CAST(n AS BIGINT) AS n_docs,
         n / tot AS natural_share,
         pow(n, 0.3) / za AS target_share,
         n, tot
  FROM c, t
),
w AS (SELECT *, target_share * tot / n AS wgt FROM s),
m AS (SELECT MAX(wgt) AS wmax FROM w),
rates AS (
  SELECT source, n_docs, natural_share, target_share, wgt / wmax AS rate
  FROM w, m
)
"""


def test_temperature_rates_match_oracle(spark):
    got = {
        r.source: (
            r.n_docs,
            round(r.natural_share, 9),
            round(r.target_share, 9),
            round(r.rate, 9),
        )
        for r in temperature_rates(
            load_table(spark, SF_DIR, "documents"), alpha=0.3
        ).collect()
    }
    want = {
        row[0]: (row[1], *[round(x, 9) for x in row[2:]])
        for row in duckdb.sql(f"WITH {_RATES_SQL} SELECT * FROM rates").fetchall()
    }
    assert got == want
    # default scaling: pure downsampling, the most-lifted (smallest) source
    # pinned at rate exactly 1.0
    assert max(v[3] for v in got.values()) == 1.0
    assert all(0.0 < v[3] <= 1.0 for v in got.values())
    smallest = min(got, key=lambda s: got[s][0])
    assert got[smallest][3] == 1.0


def test_temperature_alpha_one_is_natural(spark):
    rates = {
        r.source: (r.natural_share, r.target_share, r.rate)
        for r in temperature_rates(
            load_table(spark, SF_DIR, "documents"), alpha=1.0
        ).collect()
    }
    for nat, tgt, rate in rates.values():
        assert abs(nat - tgt) < 1e-12
        assert abs(rate - 1.0) < 1e-12


def test_sample_with_temperature_matches_oracle(spark):
    got = sorted(
        r.doc_id
        for r in sample_with_temperature(
            load_table(spark, SF_DIR, "documents"), alpha=0.3
        ).collect()
    )
    u = U.format(salt="mix-v1")
    want = sorted(
        row[0]
        for row in duckdb.sql(
            f"""
            WITH {_RATES_SQL}
            SELECT doc_id FROM '{SF_DIR}/documents.parquet' d
            JOIN rates ON rates.source = d.lang
            WHERE {u} < LEAST(rate, 1.0)
            """
        ).fetchall()
    )
    assert got == want and 0 < len(got)
    # the smallest source keeps everything (rate 1.0); larger sources shrink
    docs = load_table(spark, SF_DIR, "documents")
    per_src = {
        r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept = {
        r.lang: r.n
        for r in sample_with_temperature(docs, alpha=0.3)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    smallest = min(per_src, key=per_src.get)
    largest = max(per_src, key=per_src.get)
    assert kept[smallest] == per_src[smallest]
    assert kept[largest] < per_src[largest]


def test_weighted_sample_matches_python_reference(spark):
    """Score-proportional acceptance: the engine's kept set equals an
    independent Python reproduction of u < clamp(w * scale, 0, 1) with the
    same md5 unit hash, for both the max-normalized and target-fraction
    forms; zero-weight rows are never kept, the max-weight row always is."""
    import hashlib

    from l1dbproto_spark.operators.sampling import weighted_sample

    rows = [(i, float((i * 7) % 13) if i % 10 else 0.0) for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "score"])

    def unit(i, salt):
        h = hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:12]
        return int(h, 16) / float(1 << 48)

    # max-normalized form
    wmax = max(w for _, w in rows)
    want = {i for i, w in rows if unit(i, "wsample-v1") < min(max(w, 0.0) / wmax, 1.0)}
    got = {r.doc_id for r in weighted_sample(docs, "score").collect()}
    assert got == want
    assert all(w > 0 for i, w in rows if i in got)
    best = [i for i, w in rows if w == wmax]
    assert set(best) <= got  # p=1 rows always kept

    # target-fraction form: expected kept fraction ~= target
    n = len(rows)
    wsum = sum(max(w, 0.0) for _, w in rows)
    scale = 0.3 * n / wsum
    want2 = {
        i for i, w in rows
        if unit(i, "wsample-v1") < min(max(w, 0.0) * scale, 1.0)
    }
    got2 = {
        r.doc_id
        for r in weighted_sample(docs, "score", target_fraction=0.3).collect()
    }
    assert got2 == want2
    assert abs(len(got2) / n - 0.3) < 0.1
    # schema preserved, scalar helper columns dropped
    out = weighted_sample(docs, "score")
    assert out.columns == docs.columns


def test_weighted_sample_zero_shuffle_scan(spark):
    """The acceptance filter itself is shuffle-free: the only exchange in
    the plan is the broadcast of the one-row scalar aggregate."""
    from l1dbproto_spark.operators.sampling import weighted_sample

    docs = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(100)], ["doc_id", "score"]
    )
    df = weighted_sample(docs, "score", target_fraction=0.5)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert "SortMergeJoin" not in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan


def test_token_budget_rates(spark):
    """rate_s * T_s == share_s * budget exactly; zero-weight sources get
    rate 0; >1 rates flagged for the repeats path; composed sampling
    lands near the budget."""
    import pytest
    from l1dbproto_spark.operators.sampling import (
        token_budget_rates,
        sample_mixture,
    )

    docs = load_table(spark, SF_DIR, "documents")
    budget = 20_000
    rates = {
        r.source: r
        for r in token_budget_rates(
            docs, {"en": 0.7, "es": 0.3}, budget
        ).collect()
    }
    # oracle masses
    masses = {
        s: n
        for s, n in duckdb.sql(
            f"""
            SELECT lang,
                   SUM(len(list_filter(string_split_regex(text, '\\s+'),
                                       x -> x <> '')))
            FROM '{SF_DIR}/documents.parquet' GROUP BY lang
            """
        ).fetchall()
    }
    for s, r in rates.items():
        assert r.corpus_tokens == masses[s]
        if s == "en":
            assert r.rate * r.corpus_tokens == pytest.approx(0.7 * budget)
        elif s == "es":
            assert r.rate * r.corpus_tokens == pytest.approx(0.3 * budget)
        else:
            assert r.rate == 0.0 and r.target_share == 0.0
        assert r.needs_repeats == (r.rate > 1.0)
    # compose: sample with the computed (clamped) rates and check the
    # realized token mass is in the budget's neighborhood
    rd = {s: min(r.rate, 1.0) for s, r in rates.items()}
    sampled = sample_mixture(docs, rd, source_col="lang")
    got = (
        sampled.selectExpr(
            "sum(size(filter(split(text, '\\\\s+'), t -> t != ''))) as n"
        ).first()["n"]
    )
    want = sum(
        min(r.rate, 1.0) * r.corpus_tokens for r in rates.values()
    )
    assert got == pytest.approx(want, rel=0.35)  # Bernoulli variance


def test_sample_with_temperature_null_source_first_class(spark):
    """NULL-source docs are counted AND sampled at their own group's
    rate (null-safe join) — they previously vanished even at alpha=1."""
    from l1dbproto_spark.operators.sampling import sample_with_temperature

    rows = [(i, "en" if i % 2 == 0 else None) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sample_with_temperature(docs, alpha=1.0).toPandas()
    # alpha=1 -> every rate 1.0 -> everything kept, nulls included
    assert len(out) == 40
    assert out["lang"].isna().sum() == 20


# ---------------------------------------------------------------------------
# weighted_topk_sample — exact-size E-S draw (driver r10)


def _wtopk_trials(spark, n_trials=600, k=1):
    # items 1..4 with weight == item, replicated across trials; the id
    # encodes the trial so each trial gets independent unit hashes
    from l1dbproto_spark.operators.sampling import weighted_topk_sample

    rows = spark.range(n_trials).select(
        F.col("id").alias("trial"),
        F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)])).alias("item"),
    ).select(
        "trial",
        "item",
        (F.col("trial") * 1000 + F.col("item")).alias("doc_id"),
        F.col("item").cast("double").alias("w"),
    )
    return weighted_topk_sample(rows, k=k, weight_col="w", group_col="trial")


def test_weighted_topk_inclusion_proportional_to_weight(spark):
    """E-S top-1 inclusion frequency across 600 independent trials must
    track w_i / sum(w) = i/10 (deterministic given the salt, so this is a
    pin, not a flaky statistical assertion; tolerance ~3.5 sigma of the
    binomial it was drawn from)."""
    won = {
        r.item: r.n
        for r in _wtopk_trials(spark).groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    n = sum(won.values())
    assert n == 600
    for item in (1, 2, 3, 4):
        freq = won.get(item, 0) / n
        assert abs(freq - item / 10) < 0.07, (item, freq)


def test_weighted_topk_exact_k_deterministic_no_replacement(spark):
    from l1dbproto_spark.operators.sampling import weighted_topk_sample

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("src"),
        (F.col("id") % 5 + 1).cast("double").alias("w"),
    )
    out = weighted_topk_sample(docs, k=3, weight_col="w", group_col="src")
    rows = out.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.src, []).append((r.sample_rank, r.doc_id))
    assert set(by_g) == {str(i) for i in range(7)}
    for g, picks in by_g.items():
        assert sorted(r for r, _ in picks) == [1, 2, 3]
        assert len({d for _, d in picks}) == 3  # without replacement
    # re-run: byte-identical draw (same salt)
    again = {(r.src, r.sample_rank): r.doc_id for r in out.collect()}
    assert all(again[(r.src, r.sample_rank)] == r.doc_id for r in rows)
    # different salt: a different draw somewhere
    other = weighted_topk_sample(docs, k=3, weight_col="w", group_col="src", salt="v2")
    assert {(r.src, r.doc_id) for r in other.collect()} != {
        (r.src, r.doc_id) for r in rows
    }


def test_weighted_topk_edge_weights_and_small_groups(spark):
    from l1dbproto_spark.operators.sampling import weighted_topk_sample

    docs = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    out = weighted_topk_sample(docs, k=3, weight_col="w")
    got = [r.doc_id for r in out.orderBy("sample_rank").collect()]
    # zero/negative/NULL weights have inclusion probability 0: they never
    # win AND never pad — fewer eligible rows than k returns just those
    assert set(got) == {1, 5}
    assert [r.sample_rank for r in out.orderBy("sample_rank").collect()] == [1, 2]


def test_weighted_topk_matches_duckdb_oracle(spark):
    """Oracle-grade check: DuckDB reproduces the E-S draw exactly from the
    same portable md5 unit hash + exponential key formula (ids and ranks;
    keys are float but well-separated random values, compared via the
    selected sets like every float-ranking oracle here)."""
    import duckdb

    from l1dbproto_spark.operators.sampling import weighted_topk_sample

    docs = (
        load_table(spark, SF_DIR, "orders")
        .select(
            F.col("o_orderkey").alias("doc_id"),
            F.col("o_orderpriority").alias("src"),
            (F.col("o_totalprice").cast("double") / 1000.0).alias("w"),
        )
    )
    got = {
        (r.src, r.sample_rank): r.doc_id
        for r in weighted_topk_sample(
            docs, k=5, weight_col="w", group_col="src"
        ).collect()
    }
    oracle = f"""
    WITH d AS (
      SELECT o_orderkey AS doc_id, o_orderpriority AS src,
             CAST(o_totalprice AS DOUBLE) / 1000.0 AS w
      FROM '{SF_DIR}/orders.parquet'
    ),
    keyed AS (
      SELECT doc_id, src,
             -ln(GREATEST(
               CAST(concat('0x', substr(md5(concat('wtopk-v1',
                 CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT)
               / 281474976710656.0, 3.552713678800501e-15)) / w AS key
      FROM d WHERE w > 0
    )
    SELECT src, doc_id, rn FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY src ORDER BY key, doc_id
      ) AS rn FROM keyed
    ) t WHERE rn <= 5
    """
    want = {
        (r.src, r.rn): r.doc_id
        for r in duckdb.sql(oracle).df().itertuples()
    }
    assert got == want and len(got) > 0


def test_weighted_topk_two_phase_equals_direct_window(spark):
    """The per-group path is a two-phase exact top-k (partition-local cut
    keyed on spark_partition_id, then global rank) so one giant group
    never sorts in a single task. Top-k is associative: the result must
    be IDENTICAL to the naive single-window form, on a skewed fixture
    where one group holds ~90% of rows spread over many partitions."""
    from pyspark.sql import Window

    from l1dbproto_spark.operators.sampling import (
        _unit_hash,
        weighted_topk_sample,
    )

    docs = (
        spark.range(20_000)
        .repartition(16)  # ensure the big group spans many partitions
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 == 0, F.lit("small"))
            .otherwise(F.lit("big"))
            .alias("src"),
            (F.col("id") % 13 + 1).cast("double").alias("w"),
        )
    )
    got = {
        (r.src, r.sample_rank): r.doc_id
        for r in weighted_topk_sample(
            docs, k=7, weight_col="w", group_col="src"
        ).collect()
    }
    # naive reference: one window over the full group
    u = F.greatest(_unit_hash(F.col("doc_id"), "wtopk-v1"), F.lit(2.0**-48))
    keyed = docs.filter(F.col("w") > 0).withColumn(
        "sample_key", -F.log(u) / F.col("w")
    )
    wnd = Window.partitionBy("src").orderBy(
        F.asc("sample_key"), F.asc("doc_id")
    )
    want = {
        (r.src, r.rn): r.doc_id
        for r in keyed.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= 7)
        .collect()
    }
    assert got == want and len(got) == 14


def test_stratified_sample_two_phase_equals_direct_window(spark):
    """Same associativity pin for stratified_sample: the two-phase plan
    must match the naive full-stratum window on a skewed multi-partition
    fixture."""
    from pyspark.sql import Window

    from l1dbproto_spark.operators.sampling import (
        _unit_hash,
        stratified_sample,
    )

    docs = (
        spark.range(15_000)
        .repartition(16)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 20 == 0, F.lit("rare"))
            .otherwise(F.lit("common"))
            .alias("lang"),
        )
    )
    got = {
        (r.lang, r.sample_rank): r.doc_id
        for r in stratified_sample(docs, k=6).collect()
    }
    u = _unit_hash(F.col("doc_id"), "strat-v1")
    wnd = Window.partitionBy("lang").orderBy(F.asc("_u"), F.asc("doc_id"))
    want = {
        (r.lang, r.rn): r.doc_id
        for r in docs.withColumn("_u", u)
        .withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= 6)
        .collect()
    }
    assert got == want and len(got) == 12
