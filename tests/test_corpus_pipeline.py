"""Corpus preparation pipeline (operators/corpus.py): planted-corpus
cleaning semantics and clean→pack composition invariants."""

from __future__ import annotations

from l1dbproto_spark.operators.corpus import clean_corpus, prepare_training_corpus


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog every single day"),
        (2, "the quick brown fox jumps over the lazy dog every single day"),  # exact dup of 1
        (3, "THE  quick Brown fox jumps over the lazy dog every single day"),  # normalized dup of 1
        (4, "the quick brown fox jumps over the lazy cat every single day"),  # near dup of 1
        (5, "completely different content about distributed query engines here"),
        (6, "tiny"),  # too short
        (7, "completely different content about distributed query engines here today"),  # near dup of 5
        (8, "unrelated third topic entirely about astronomy and alert pipelines"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_clean_corpus_semantics(spark):
    res = clean_corpus(_corpus(spark), min_tokens=3, min_jaccard=0.5)
    cleaned = {r.doc_id for r in res.cleaned.collect()}
    dropped = {(r.doc_id, r.reason, r.canonical_id) for r in res.dropped.collect()}

    assert cleaned == {1, 5, 8}
    assert (6, "too_short", None) in dropped
    assert (2, "exact_dup", 1) in dropped
    assert (3, "exact_dup", 1) in dropped
    assert (4, "near_dup", 1) in dropped
    assert (7, "near_dup", 5) in dropped
    # partition property: every input doc is either cleaned or dropped, once
    assert cleaned | {d for d, _, _ in dropped} == set(range(1, 9))
    assert len(dropped) + len(cleaned) == 8


def test_clean_corpus_quality_gate(spark):
    """min_logprob gates garbled documents between the length gate and the
    dedup stages, with its drops logged like the others (reason
    'low_quality', no canonical) and the partition property preserved."""
    from pyspark.sql import functions as F

    from l1dbproto_spark.operators.quality import unigram_logprob_scores

    rows = _corpus(spark).collect()
    # a garbled doc: every token is unique in the corpus, so its mean token
    # log-prob sits far below the repeated-vocabulary documents
    garbled = [(9, "zxqv wkjh plmf gtrd bnys qwop xcvu mnbh asdl fgjk")]
    docs = spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows] + garbled, ["doc_id", "text"]
    )
    # pick a threshold between the garbled score and the fluent scores
    scores = {
        r.doc_id: r.mean_logprob
        for r in unigram_logprob_scores(
            docs.filter(F.length("text") > 10)
        ).collect()
    }
    fluent_min = min(v for k, v in scores.items() if k != 9)
    assert scores[9] < fluent_min
    threshold = (scores[9] + fluent_min) / 2

    res = clean_corpus(docs, min_tokens=3, min_jaccard=0.5, min_logprob=threshold)
    cleaned = {r.doc_id for r in res.cleaned.collect()}
    dropped = {(r.doc_id, r.reason, r.canonical_id) for r in res.dropped.collect()}
    assert (9, "low_quality", None) in dropped
    assert cleaned == {1, 5, 8}
    # drop-log audit: the same reasons as the ungated run, plus low_quality
    assert {reason for _, reason, _ in dropped} == {
        "too_short", "low_quality", "exact_dup", "near_dup"
    }
    assert cleaned | {d for d, _, _ in dropped} == set(range(1, 10))
    assert len(dropped) + len(cleaned) == 9


def test_split_corpus_deterministic_and_oracle(spark):
    """Hash split: DuckDB oracle equivalence, determinism across calls,
    proportions near the weights, and salt-versioning changes membership."""
    import duckdb

    from l1dbproto_spark.operators.corpus import split_corpus
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r.doc_id: r.split for r in split_corpus(docs, w).collect()}
    again = {r.doc_id: r.split for r in split_corpus(docs, w).collect()}
    assert got == again

    want = dict(
        duckdb.sql(
            """
        SELECT doc_id,
               CASE WHEN u < 0.8 THEN 'train'
                    WHEN u < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 CAST(concat('0x', substr(md5(concat('split-v1', CAST(doc_id AS VARCHAR))), 1, 12)) AS BIGINT)
                   / CAST(281474976710656 AS DOUBLE) AS u
          FROM '/root/testdata/sf0.01/documents.parquet'
        )
        """
        ).fetchall()
    )
    assert got == want

    n = len(got)
    frac_train = sum(1 for s in got.values() if s == "train") / n
    assert 0.72 <= frac_train <= 0.88
    other = {r.doc_id: r.split for r in split_corpus(docs, w, salt="v2").collect()}
    assert other != got  # salt versions the split


def test_prepare_training_corpus_composes(spark):
    res, packed = prepare_training_corpus(
        _corpus(spark), ctx_len=8, n_shards=2, min_tokens=3, min_jaccard=0.5
    )
    pdf = packed.toPandas()
    # only cleaned docs are packed, and all of them
    assert set(pdf.doc_id) == {r.doc_id for r in res.cleaned.collect()}
    # token conservation through the composition
    per_doc = pdf.groupby("doc_id").agg(
        assigned=("tokens_in_chunk", "sum"), n=("n_tokens", "first")
    )
    assert (per_doc.assigned == per_doc.n).all()


def test_clean_corpus_repetition_gate(spark):
    """repetition_gate=True drops boilerplate docs (reason 'repetitive', no
    canonical) between the quality gate and the dedup stages, preserving
    the partition property."""
    rows = _corpus(spark).collect()
    # a stuttering doc: one bigram dominates its characters and a line
    # repeats, tripping both repetition rules
    spam = [
        (
            9,
            "buy now buy now buy now buy now buy now\n"
            "buy now buy now buy now buy now buy now",
        )
    ]
    docs = spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows] + spam, ["doc_id", "text"]
    )
    res = clean_corpus(docs, min_tokens=3, min_jaccard=0.5, repetition_gate=True)
    cleaned = {r.doc_id for r in res.cleaned.collect()}
    dropped = {(r.doc_id, r.reason, r.canonical_id) for r in res.dropped.collect()}
    assert (9, "repetitive", None) in dropped
    assert cleaned == {1, 5, 8}
    assert {reason for _, reason, _ in dropped} == {
        "too_short", "repetitive", "exact_dup", "near_dup"
    }
    assert cleaned | {d for d, _, _ in dropped} == set(range(1, 10))
    assert len(dropped) + len(cleaned) == 9


def test_clean_corpus_pii_gate(spark):
    """max_pii drops documents with more PII hits than allowed (reason
    'pii', no canonical); documents at or under the limit survive."""
    rows = _corpus(spark).collect()
    pii_docs = [
        (9, "contact alice@example.com or bob@example.com at 555-123-4567 today"),
        (10, "one lonely address carol@example.org inside otherwise fine text"),
    ]
    docs = spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows] + pii_docs, ["doc_id", "text"]
    )
    res = clean_corpus(docs, min_tokens=3, min_jaccard=0.5, max_pii=1)
    cleaned = {r.doc_id for r in res.cleaned.collect()}
    dropped = {(r.doc_id, r.reason, r.canonical_id) for r in res.dropped.collect()}
    assert (9, "pii", None) in dropped
    assert 10 in cleaned  # exactly one hit <= max_pii survives
    assert cleaned == {1, 5, 8, 10}
    assert cleaned | {d for d, _, _ in dropped} == set(range(1, 11))
    assert len(dropped) + len(cleaned) == 10


def test_clean_corpus_semantic_stage(spark):
    """Stage 5: SemDeDup over the survivors using a pinned quantizer —
    embedding clones of two surviving docs are dropped with reason
    'semantic_dup' and the right canonical; docs without embeddings pass
    through untouched."""
    from pyspark.sql import functions as F

    docs = _corpus(spark)
    # embeddings for the three expected survivors {1, 5, 8}: 1 and 101 are
    # identical vectors (101 is a synthetic extra doc cloned from 1)
    extra = spark.createDataFrame(
        [(101, "the quick brown fox jumps over that other lazy dog today")],
        ["doc_id", "text"],
    )
    docs = docs.unionByName(extra)
    emb_rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (5, [0.0, 1.0, 0.0, 0.0]),
        (8, [0.0, 0.0, 1.0, 0.0]),
        (101, [1.0, 0.0, 0.0, 0.0]),  # clone of doc 1
    ]
    emb = spark.createDataFrame(emb_rows, "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
         (2, [0.0, 0.0, 1.0, 0.0])],
        "cluster int, centroid array<double>",
    )
    res = clean_corpus(
        docs, min_tokens=3, min_jaccard=0.5, embeddings=emb, centroids=cents
    )
    cleaned = {r.doc_id for r in res.cleaned.collect()}
    dropped = {(r.doc_id, r.reason, r.canonical_id) for r in res.dropped.collect()}
    assert (101, "semantic_dup", 1) in dropped
    assert cleaned == {1, 5, 8}
    assert cleaned | {d for d, _, _ in dropped} == set(range(1, 9)) | {101}
    assert len(dropped) + len(cleaned) == 9


def test_clean_corpus_gated_plan_stays_linear(spark):
    """The all-gates plan must not re-embed the corpus subtree per stage:
    the returned frames reference the documents scan a bounded number of
    times (pre-fix: 48/72 references — exponential in the gate count)."""
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    res = clean_corpus(
        docs, min_tokens=3, min_jaccard=0.5, min_logprob=-12.0,
        repetition_gate=True, max_pii=2,
    )
    for df in (res.cleaned, res.dropped):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("documents.parquet") <= 4, plan.count("documents.parquet")


def test_clean_corpus_custom_id_col(spark):
    """The full staged cleaner works with a non-default id column (the
    drop log canonicalizes to 'doc_id'; survivors keep the caller's
    schema)."""
    rows = [(r.doc_id, r.text) for r in _corpus(spark).collect()]
    docs = spark.createDataFrame(rows, ["my_id", "text"])
    res = clean_corpus(docs, min_tokens=3, min_jaccard=0.5, id_col="my_id")
    cleaned = {r.my_id for r in res.cleaned.collect()}
    dropped = {(r.doc_id, r.reason, r.canonical_id) for r in res.dropped.collect()}
    assert res.cleaned.columns == docs.columns
    assert cleaned == {1, 5, 8}
    assert (2, "exact_dup", 1) in dropped and (7, "near_dup", 5) in dropped
    assert cleaned | {d for d, _, _ in dropped} == set(range(1, 9))


def test_clean_corpus_keep_best(spark):
    """keep_best_col keeps each duplicate group's best-scoring member at
    both the exact and near stages; a constant score reproduces the
    min-id default."""
    from l1dbproto_spark.operators.corpus import clean_corpus

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to the deep green forest"
    )
    other = (
        "silver ships sail across seven stormy oceans carrying spice "
        "and copper toward bright northern harbors every winter"
    )
    rows = [
        # exact dups: 1 == 11 byte-identical; 11 has the better score
        (1, base, 0.2),
        (11, base, 0.9),
        # near dups (one word appended): 2 ~ 12; 12 scores higher
        (2, other, 0.1),
        (12, other + " tonight", 0.8),
        # unique survivor
        (3, "completely different text with many original words present", 0.5),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, score double")
    res = clean_corpus(
        docs, min_tokens=3, min_jaccard=0.5, df_cap=None, keep_best_col="score"
    )
    kept = {r.doc_id for r in res.cleaned.collect()}
    dropped = {r.doc_id: (r.reason, r.canonical_id) for r in res.dropped.collect()}
    assert kept == {11, 12, 3}
    assert dropped[1] == ("exact_dup", 11)
    assert dropped[2] == ("near_dup", 12)
    # constant score == default min-id behavior
    from pyspark.sql import functions as F

    const = docs.withColumn("score", F.lit(1.0))
    res2 = clean_corpus(
        const, min_tokens=3, min_jaccard=0.5, df_cap=None, keep_best_col="score"
    )
    res3 = clean_corpus(const, min_tokens=3, min_jaccard=0.5, df_cap=None)
    assert {r.doc_id for r in res2.cleaned.collect()} == {
        r.doc_id for r in res3.cleaned.collect()
    }


def test_leakage_safe_split(spark):
    """Near-dup groups never straddle splits; singletons match the plain
    split_corpus assignment exactly; proportions stay sane."""
    from pyspark.sql import functions as F

    from l1dbproto_spark.operators.corpus import (
        leakage_safe_split,
        split_corpus,
    )
    from l1dbproto_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # plant near-dup pairs: clone every 10th doc with one appended word
    clones = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    corpus = docs.unionByName(clones)
    out = leakage_safe_split(
        corpus, {"train": 0.8, "val": 0.2}, min_jaccard=0.5, df_cap=None
    )
    pdf = out.select("doc_id", "split_group", "split").toPandas()
    # every planted pair shares a group and therefore a split
    base = pdf.set_index("doc_id")
    for orig in pdf[pdf["doc_id"] >= 100000]["doc_id"]:
        a, b = base.loc[orig], base.loc[orig - 100000]
        assert a["split_group"] == b["split_group"]
        assert a["split"] == b["split"]
    # no group straddles splits (global invariant, not just planted pairs)
    assert (pdf.groupby("split_group")["split"].nunique() == 1).all()
    # singletons: identical assignment to the plain split
    plain = {
        r.doc_id: r.split
        for r in split_corpus(corpus, {"train": 0.8, "val": 0.2}).collect()
    }
    singles = pdf[pdf["split_group"] == pdf["doc_id"]]
    clustered_ids = set(pdf[pdf["split_group"] != pdf["doc_id"]]["doc_id"])
    for _, row in singles.iterrows():
        if row["doc_id"] not in clustered_ids:
            assert row["split"] == plain[row["doc_id"]]
    # proportions within loose bounds
    frac = (pdf["split"] == "train").mean()
    assert 0.6 < frac < 0.95


def test_length_gate_counts_tab_and_newline_tokens(spark):
    """The engine-wide whitespace token rule counts words across tabs and
    newlines — a 6-word tab-delimited doc is not 'too_short' (pinned
    regression: the space-only rule counted it as one token)."""
    from l1dbproto_spark.operators.corpus import clean_corpus
    from l1dbproto_spark.operators.packing import whitespace_token_count
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "alpha\tbeta\tgamma\ndelta\nepsilon zeta")],
        "doc_id long, text string",
    )
    n = docs.select(whitespace_token_count(F.col("text")).alias("n")).first().n
    assert n == 6
    res = clean_corpus(docs, min_tokens=5)
    assert {r.doc_id for r in res.cleaned.collect()} == {1}
