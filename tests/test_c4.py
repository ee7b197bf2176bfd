"""C4 cleaning battery (operators/c4.py): line filter + doc gates + span
dedup against an independent Python reference implementing the same pinned
conventions, plus behavioral checks on seeded corpora."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from l1dbproto_spark.operators.c4 import (
    DEFAULT_DROP_LINE_PHRASES,
    c4_clean,
    c4_quality_signals,
    c4_span_dedup,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ref_signals(text, line_min_words=5, min_sentences=3):
    lines = text.split("\n")
    kept = []
    for l in lines:
        t = l.strip()
        if not t.endswith((".", "!", "?", '"')):
            continue
        # the engine-wide explicit whitespace class (queries/text.py:27)
        if len(re.split(r"[ \t\r\n\f]+", t)) < line_min_words:
            continue
        low = t.lower()
        if any(p in low for p in DEFAULT_DROP_LINE_PHRASES):
            continue
        kept.append(t)
    kept_text = "\n".join(kept)
    n_sent = len([s for s in re.split(r'[.!?"]+', kept_text) if s.strip()])
    low = kept_text.lower()
    has_lorem = "lorem ipsum" in low
    has_brace = "{" in kept_text
    passes = n_sent >= min_sentences and not has_lorem and not has_brace
    return {
        "c4_text": kept_text,
        "n_lines": len(lines),
        "n_lines_kept": len(kept),
        "n_sentences": n_sent,
        "has_lorem_ipsum": has_lorem,
        "has_brace": has_brace,
        "passes_c4": passes,
    }


_SEEDS = [
    # (suffix-id offset, appended text)
    (0, "\nShort line\nA full sentence with plenty of words to keep here."
        "\nSecond complete sentence with enough words to pass easily."
        "\nThird complete sentence rounds out the passing document."),
    (1, "\nThis boilerplate mentions our Privacy Policy in the middle of it."),
    (2, "\nvar x = { key: 1 }. This line has a brace and enough words."),
    (3, "\nLorem ipsum dolor sit amet consectetur adipiscing elit sed do."),
    (4, "\nCall our JavaScript widget today for more information please."),
]


def test_c4_signals_match_reference(spark):
    docs = load_table(spark, SF_DIR, "documents")
    expr = F.col("text")
    for off, suffix in _SEEDS:
        expr = F.when(
            F.col("doc_id") % 5 == off, F.concat(F.col("text"), F.lit(suffix))
        ).otherwise(expr)
    docs = docs.withColumn("text", expr)
    rows = docs.select("doc_id", "text").collect()
    want = {r.doc_id: _ref_signals(r.text) for r in rows}
    got = c4_quality_signals(docs).collect()
    assert len(got) == len(want)
    for r in got:
        exp = want[r.doc_id]
        for k, v in exp.items():
            assert getattr(r, k) == v, (r.doc_id, k, getattr(r, k), v)
    # the battery is discriminative on this corpus
    assert {r.passes_c4 for r in got} == {True, False}


def test_c4_clean_partition_and_reasons(spark):
    docs = spark.createDataFrame(
        [
            (1, "One good sentence with enough words here.\nAnother fine sentence with words aplenty.\nThird solid sentence closes the document."),
            (2, "no terminal punctuation here\nalso not here"),
            (3, "This sentence has a brace { inside it and words.\nSecond sentence with enough words to pass.\nThird sentence with enough words to pass."),
            (4, "Lorem ipsum dolor sit amet consectetur elit.\nSecond sentence with enough words to pass.\nThird sentence with enough words to pass."),
        ],
        ["doc_id", "text"],
    )
    cleaned, dropped = c4_clean(docs)
    kept = {r.doc_id for r in cleaned.collect()}
    reasons = {r.doc_id: r.reason for r in dropped.collect()}
    assert kept == {1}
    assert reasons[2] == "too_few_sentences"
    assert reasons[3] == "brace"
    assert reasons[4] == "doc_phrase"
    assert set(reasons) | kept == {1, 2, 3, 4}
    # cleaned text is the line-filtered form, schema preserved
    assert cleaned.columns == docs.columns
    txt = cleaned.first().text
    assert txt.count("\n") == 2 and txt.endswith("document.")


def _ref_span_dedup(doc_rows, span=3):
    sents = {}
    for d, text in doc_rows:
        marked = re.sub(r'([.!?"]+)', "\\1\x1f", text)
        sents[d] = [s.strip() for s in marked.split("\x1f") if s.strip()]
    occ = {}
    for d in sorted(sents):
        for i in range(len(sents[d]) - span + 1):
            h = "".join(sents[d][i : i + span])
            occ.setdefault(h, []).append((d, i))
    removed = {d: set() for d in sents}
    for h, places in occ.items():
        if len(places) > 1:
            for d, i in places[1:] if places == sorted(places) else sorted(places)[1:]:
                removed[d].update(range(i, i + span))
    return {
        d: " ".join(
            s for i, s in enumerate(sents[d]) if i not in removed[d]
        ).strip()
        for d in sents
    }


def test_c4_span_dedup_matches_reference(spark):
    boiler = (
        "Subscribe to our newsletter today. "
        "Follow us on all social platforms. "
        "All rights reserved by the publisher."
    )
    docs = spark.createDataFrame(
        [
            (1, "Unique opening sentence one. Unique second sentence here. " + boiler),
            (2, "Different start for this doc. Another distinct sentence follows. " + boiler),
            (3, boiler),
            (4, "No duplicated content lives here. Every sentence is unique text. Nothing is shared with others."),
        ],
        ["doc_id", "text"],
    )
    want = _ref_span_dedup([(r.doc_id, r.text) for r in docs.collect()])
    got = {r.doc_id: r.text for r in c4_span_dedup(docs).collect()}
    assert got == want
    # doc 1 (smallest id) keeps the boilerplate; 2 and 3 lose it
    assert "Subscribe" in got[1]
    assert "Subscribe" not in got[2] and got[3] == ""
    assert got[4].startswith("No duplicated")
    # schema preserved
    assert c4_span_dedup(docs).columns == docs.columns


def test_c4_span_dedup_plan_shape(spark):
    """One sentence explode, uniform-key span hash groupBy, per-doc
    anti-join — no cartesian products anywhere."""
    docs = load_table(spark, SF_DIR, "documents")
    df = c4_span_dedup(docs)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_c4_clean_is_idempotent(spark):
    """The line filter is a projection onto its own fixed points: applying
    c4_clean to already-cleaned text changes nothing (every kept line
    still ends in terminal punct, has enough words, carries no dropped
    phrase; the doc gates see identical kept text)."""
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(
                "\nFirst appended sentence has plenty of words here."
                "\nshort no punct"
                "\nSecond appended sentence also has plenty of words."
                "\nThird appended sentence closes out the passing text."
            ),
        ),
    )
    once, _ = c4_clean(docs)
    twice, dropped2 = c4_clean(once)
    assert dropped2.count() == 0
    a = {(r.doc_id, r.text) for r in once.collect()}
    b = {(r.doc_id, r.text) for r in twice.collect()}
    assert a == b and a


# --- dedup_corpus_lines ----------------------------------------------------

BOILER = "Accept our cookies to continue reading."


def _line_docs(spark):
    rows = [
        (0, f"Unique opening line zero.\n{BOILER}\nUnique closing line zero."),
        (1, f"{BOILER}\nUnique middle line one.\n\nAfter a blank line."),
        (2, f"Unique only content two.\n{BOILER}"),
        (3, "Repeated inside only.\nRepeated inside only.\nSolo doc line."),
        (4, ""),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_corpus_lines_keep_first(spark):
    from l1dbproto_spark.operators.c4 import dedup_corpus_lines

    got = {
        r.doc_id: r.text
        for r in dedup_corpus_lines(_line_docs(spark)).collect()
    }
    # corpus-first occurrence (doc 0) keeps the boilerplate; later ones lose it
    assert got[0].splitlines().count(BOILER) == 1
    assert BOILER not in got[1] and BOILER not in got[2]
    assert got[1] == "Unique middle line one.\n\nAfter a blank line."
    assert got[2] == "Unique only content two."
    # within-doc repetition alone is NOT corpus duplication (distinct-doc rule)
    assert got[3] == "Repeated inside only.\nRepeated inside only.\nSolo doc line."
    # rewriter contract: rows preserved; untouched docs verbatim — empty
    # text stays empty and NULL text stays NULL (not coalesced to '')
    assert got[4] == "" and got[5] is None
    assert len(got) == 6


def test_dedup_corpus_lines_remove_all(spark):
    from l1dbproto_spark.operators.c4 import dedup_corpus_lines

    got = {
        r.doc_id: r.text
        for r in dedup_corpus_lines(
            _line_docs(spark), mode="remove_all"
        ).collect()
    }
    for i in (0, 1, 2):
        assert BOILER not in got[i]
    assert got[0] == "Unique opening line zero.\nUnique closing line zero."
    # a doc reduced to nothing survives as empty text
    assert got[2] == "Unique only content two."


def test_dedup_corpus_lines_duckdb_oracle(spark):
    """keep_first over the documents table (newlines injected so the real
    fixture has duplicated lines) == a DuckDB re-derivation of the pinned
    rule."""
    import duckdb
    import pandas as pd

    from l1dbproto_spark.operators.c4 import dedup_corpus_lines

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.concat(
            F.lit(f"{BOILER}\n"),
            F.regexp_replace(F.col("text"), r"\. ", ".\n"),
        ).alias("text"),
    )
    got = (
        dedup_corpus_lines(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    ref = con.sql(
        """
WITH split AS (
  SELECT doc_id, string_split(text, chr(10)) AS parts FROM docs
),
lines AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS lidx, parts[i] AS line
  FROM split, unnest(range(1, len(parts) + 1)) AS t(i)
),
content AS (
  SELECT doc_id, lidx, md5(trim(line)) AS h FROM lines
  WHERE len(trim(line)) > 0
),
dup AS (
  SELECT h FROM content GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
ranked AS (
  SELECT c.doc_id, c.lidx,
         ROW_NUMBER() OVER (PARTITION BY c.h ORDER BY c.doc_id, c.lidx) AS rn
  FROM content c JOIN dup USING (h)
),
doomed AS (SELECT doc_id, lidx FROM ranked WHERE rn > 1),
surv AS (
  SELECT l.doc_id,
         string_agg(l.line, chr(10) ORDER BY l.lidx) AS new_text
  FROM lines l
  LEFT JOIN doomed d ON l.doc_id = d.doc_id AND l.lidx = d.lidx
  WHERE d.doc_id IS NULL
  GROUP BY l.doc_id
)
SELECT d.doc_id,
       CASE WHEN d.doc_id IN (SELECT doc_id FROM doomed)
            THEN coalesce(s.new_text, '')
            ELSE d.text END AS text
FROM docs d LEFT JOIN surv s USING (doc_id)
ORDER BY doc_id
"""
    ).df()
    pd.testing.assert_frame_equal(got, ref, check_exact=True)


def test_dedup_corpus_lines_plan_shape(spark):
    """No cartesian/broadcast-nested-loop anywhere in the line-dedup plan."""
    from l1dbproto_spark.operators.c4 import dedup_corpus_lines

    docs = load_table(spark, SF_DIR, "documents")
    df = dedup_corpus_lines(docs)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dedup_corpus_paragraphs(spark):
    """sep='\\n\\n' applies the rule at CCNet's paragraph granularity:
    a recurring multi-line paragraph dedups as one unit, and single
    shared lines inside distinct paragraphs are untouched."""
    from l1dbproto_spark.operators.c4 import dedup_corpus_lines

    para = "Shared paragraph line one.\nShared paragraph line two."
    rows = [
        (0, f"{para}\n\nUnique zero paragraph."),
        (1, f"Unique one paragraph.\n\n{para}"),
        # shares one LINE of the paragraph but not the paragraph itself
        (2, "Shared paragraph line one.\n\nOther content two."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in dedup_corpus_lines(docs, sep="\n\n").collect()
    }
    assert got[0] == f"{para}\n\nUnique zero paragraph."
    assert got[1] == "Unique one paragraph."
    assert got[2] == "Shared paragraph line one.\n\nOther content two."


def test_c4_span_dedup_untouched_docs_verbatim(spark):
    """Docs with no duplicated span keep their text byte-identical
    (newlines preserved); only span-losing docs are reconstructed."""
    dup = (
        "First duplicated sentence here. Second duplicated sentence too. "
        "Third duplicated sentence also."
    )
    rows = [
        (0, f"{dup} Unique tail zero."),
        (1, f"Unique head one. {dup}"),
        (2, "Line one stays.\nLine two stays.\n\nPara two stays."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in c4_span_dedup(docs).collect()}
    # untouched doc: byte-identical, newlines intact
    assert got[2] == rows[2][1]
    # the corpus-first span occurrence survives; the later one is removed
    assert dup in got[0]
    assert "Unique head one." in got[1]
    for s_ in dup.split(". "):
        assert s_.rstrip(".") not in got[1].replace(dup, "")


def test_c4_line_filter_counts_tab_separated_words(spark):
    """The >=N-word line rule counts words across any whitespace, not
    just spaces — tab-delimited lines are not over-filtered."""
    docs = spark.createDataFrame(
        [(0, "alpha\tbeta\tgamma\tdelta\tepsilon stays here fine.\n"
             "short one.\n"
             "Spaced words are counted the usual way here.")],
        "doc_id long, text string",
    )
    cleaned, _ = c4_clean(docs, min_sentences=0)
    text = cleaned.collect()[0].text
    assert "alpha\tbeta" in text
    assert "short one." not in text


def test_jaccard_length_filter_keeps_exact_boundary_pair(spark):
    """The pre-shuffle length filter must be float-monotone lossless: a
    pair at EXACTLY the threshold ratio (sizes 4 vs 5 at tau=0.8, zero
    overlap beyond the shared 4) survives to the final filter. A naive
    `min >= tau*max` float bound drops it (0.8*5 rounds above 4.0)."""
    from l1dbproto_spark.operators.dedup import (
        doc_shingle_sets,
        jaccard_pairs_from_sets,
    )
    from pyspark.sql import functions as F

    # doc 1: tokens a..f -> 4 distinct 3-shingles; doc 2: a..g -> 5; the
    # 4 shingles of doc 1 are all shared => J = 4/(4+5-4) = 0.8 exactly
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f g")],
        "doc_id long, text string",
    )
    pairs = jaccard_pairs_from_sets(
        doc_shingle_sets(docs, n=3), min_jaccard=0.8
    ).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    assert pairs[0].jaccard == 0.8
