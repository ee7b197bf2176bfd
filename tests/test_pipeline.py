"""Config-driven pipeline (operators/pipeline.py): stage-for-stage
equivalence with the wrapped operators, audit shape, unknown-stage
validation, and an end-to-end declared flow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.pipeline import STAGES, run_pipeline
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").limit(200)


def test_equivalent_to_direct_composition(spark):
    """The runner adds no semantics: a declared flow equals composing
    the operators by hand."""
    from l1dbproto_spark.operators.corpus import clean_corpus, split_corpus
    from l1dbproto_spark.operators.exact_substr import exact_substring_dedup
    from l1dbproto_spark.operators.sampling import sample_mixture

    docs = _docs(spark)
    declared, _ = run_pipeline(
        docs,
        [
            {"stage": "exact_substring_dedup", "window": 20},
            {"stage": "clean_corpus", "min_tokens": 5, "min_jaccard": 0.5},
            {
                "stage": "sample_mixture",
                "rates": {"en": 0.9, "es": 0.9},
                "default_rate": 0.9,
            },
            {"stage": "split_corpus", "weights": {"train": 0.8, "val": 0.2}},
        ],
        audit=False,
    )
    manual = exact_substring_dedup(docs, window=20)
    manual = clean_corpus(manual, min_tokens=5, min_jaccard=0.5).cleaned
    manual = sample_mixture(
        manual, {"en": 0.9, "es": 0.9}, default_rate=0.9
    )
    manual = split_corpus(manual, {"train": 0.8, "val": 0.2})
    a = {(r.doc_id, r.split) for r in declared.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in manual.select("doc_id", "split").collect()}
    assert a == b and a


def test_audit_counts_monotone(spark):
    docs = _docs(spark)
    out, audit = run_pipeline(
        docs,
        [
            {"stage": "clean_corpus", "min_tokens": 5},
            {"stage": "sample_mixture", "rates": {"en": 0.5}, "default_rate": 0.5},
        ],
    )
    assert [a["stage"] for a in audit] == [
        "input",
        "clean_corpus",
        "sample_mixture",
    ]
    rows = [a["rows"] for a in audit]
    assert rows[0] >= rows[1] >= rows[2] > 0
    assert out.count() == rows[-1]


def test_unknown_stage_rejected_before_work(spark):
    with pytest.raises(ValueError, match="unknown stage 'nope'"):
        run_pipeline(_docs(spark), [{"stage": "nope"}])


def test_dataframe_params_and_checkpointing(spark):
    """DataFrame-valued config (eval set) and stage checkpointing both
    flow through; decontamination matches the direct call."""
    from l1dbproto_spark.operators.contamination import decontaminate

    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    out, audit = run_pipeline(
        docs,
        [{"stage": "decontaminate", "eval_set": ev, "n": 3}],
        checkpoint_stages=True,
    )
    direct, _ = decontaminate(docs, ev, n=3)
    assert {r.doc_id for r in out.collect()} == {
        r.doc_id for r in direct.collect()
    }
    assert audit[-1]["rows"] == direct.count()


def test_registry_covers_demo_stages(spark):
    for name in (
        "strip_html",
        "c4_clean",
        "c4_span_dedup",
        "exact_substring_dedup",
        "decontaminate",
        "clean_corpus",
        "classifier_filter",
        "quality_gate",
        "sample_mixture",
        "sample_with_temperature",
        "split_corpus",
    ):
        assert name in STAGES


def test_line_dedup_stage_equivalence(spark):
    """The dedup_corpus_lines stage wraps the operator verbatim."""
    from l1dbproto_spark.operators.c4 import dedup_corpus_lines

    docs = _docs(spark).withColumn(
        "text", F.concat(F.lit("Shared boilerplate banner line.\n"), F.col("text"))
    )
    declared, audit = run_pipeline(
        docs, [{"stage": "dedup_corpus_lines", "min_docs": 2}]
    )
    manual = dedup_corpus_lines(docs, min_docs=2)
    a = {(r.doc_id, r.text) for r in declared.collect()}
    b = {(r.doc_id, r.text) for r in manual.collect()}
    assert a == b and a
    # the banner survives in exactly one document
    n_banner = sum(
        1 for _, t in a if "Shared boilerplate banner line." in t.splitlines()
    )
    assert n_banner == 1
    assert audit[-1]["rows"] == len(a)


def test_url_stages_equivalence_and_unparsed_kept(spark):
    """url_dedup keeps each canonical-URL group's min-id doc, keeps
    unparseable-URL docs (no canonical key), and composes with the
    domain blocklist stage — stage semantics == operator semantics."""
    from l1dbproto_spark.operators.weburl import url_dedup_groups

    docs = spark.createDataFrame(
        [
            (1, "http://A.com/p?utm_source=x&q=1", "alpha"),
            (2, "HTTP://a.com:80/p?q=1#frag", "alpha dup by url"),
            (3, "https://b.co.uk/page", "beta"),
            (4, "https://sub.b.co.uk/other", "beta other host same domain"),
            (5, "not a url at all", "gamma unparseable"),
        ],
        "doc_id long, url string, text string",
    )
    out, audit = run_pipeline(docs, [{"stage": "url_dedup"}])
    got = {r.doc_id for r in out.collect()}
    keep = {
        r.keep_doc_id for r in url_dedup_groups(docs).collect()
    }
    assert got == keep | {5}  # 1 and 2 fold to min id 1; 5 kept unparsed
    assert got == {1, 3, 4, 5}
    assert audit[-1]["rows"] == 4
    # composed with the blocklist: b.co.uk covers both hosts 3 and 4
    out2, _ = run_pipeline(
        docs,
        [
            {"stage": "url_dedup"},
            {"stage": "filter_blocked_domains", "blocked": ["B.CO.UK"]},
        ],
    )
    assert {r.doc_id for r in out2.collect()} == {1, 5}


def test_normalize_unicode_stage_equivalence(spark):
    """The normalize_unicode stage wraps the operator verbatim and chains
    ahead of text-hashing stages (NFC-vs-NFD spellings of the same text
    must dedup together once the stage runs first)."""
    import unicodedata

    docs = spark.createDataFrame(
        [(1, "cafe\u0301 menu"), (2, "caf\u00e9 menu"), (3, "plain")],
        "doc_id long, text string",
    )
    out, _ = run_pipeline(docs, [{"stage": "normalize_unicode", "form": "NFC"}])
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[1] == got[2] == unicodedata.normalize("NFC", "cafe\u0301 menu")
    assert got[3] == "plain"


def test_evolve_schema_stage_equivalence(spark):
    """The evolve_schema stage conforms an old-generation frame at the
    head of a declared pipeline (the backfill entry point)."""
    docs = spark.createDataFrame(
        [("1", "hello", "junk"), ("x", "world", "junk")],
        "doc_id string, text string, legacy string",
    )
    out, _ = run_pipeline(
        docs, [{"stage": "evolve_schema", "target": "doc_id bigint, text string"}]
    )
    assert out.columns == ["doc_id", "text"]
    got = {r.text: r.doc_id for r in out.collect()}
    assert got == {"hello": 1, "world": None}  # try_cast: bad id -> NULL
