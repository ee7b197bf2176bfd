"""PII redaction and Gopher-rule quality signals: DuckDB-oracle parity
in-suite (driver registry capped at 50). PII is synthetic-injected — the
test derives a text column seeded with known PII via the SAME expression on
both engines, so detection counts and redacted output are compared
byte-for-byte on non-trivial inputs."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from l1dbproto_spark.operators.pii import pii_signals, redact_pii
from l1dbproto_spark.operators.quality import (
    gopher_quality_signals,
    repetition_signals,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"

# identical injection expression in both engines: seed a deterministic
# subset of docs with each PII type (and one doc with two types)
_INJECT_SQL = """
  CASE
    WHEN doc_id % 11 = 0 THEN concat(text, ' reach me at bob.smith+x@example.co.uk or 555-123-4567 ok')
    WHEN doc_id % 7 = 0 THEN concat(text, ' server 10.0.255.3 logged ssn 123-45-6789')
    WHEN doc_id % 5 = 0 THEN concat(text, ' mail a@b.io mail c.d@e-f.org')
    ELSE text
  END
"""


def _inject(docs):
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach me at bob.smith+x@example.co.uk or 555-123-4567 ok"),
            ),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" server 10.0.255.3 logged ssn 123-45-6789")),
        )
        .when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" mail a@b.io mail c.d@e-f.org")),
        )
        .otherwise(F.col("text")),
    )


def test_pii_signals_match_oracle(spark):
    got = {
        r.doc_id: (r.n_email, r.n_phone, r.n_ipv4, r.n_ssn, r.n_pii)
        for r in pii_signals(_inject(load_table(spark, SF_DIR, "documents"))).collect()
    }
    want = {
        row[0]: tuple(row[1:])
        for row in duckdb.sql(
            rf"""
            WITH t AS (SELECT doc_id, {_INJECT_SQL} AS text
                       FROM '{SF_DIR}/documents.parquet')
            SELECT doc_id,
              len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS n_email,
              len(regexp_extract_all(text, '\b[0-9]{{3}}[-.][0-9]{{3}}[-.][0-9]{{4}}\b')) AS n_phone,
              len(regexp_extract_all(text, '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b')) AS n_ipv4,
              len(regexp_extract_all(text, '\b[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}\b')) AS n_ssn,
              n_email + n_phone + n_ipv4 + n_ssn AS n_pii
            FROM t
            """
        ).fetchall()
    }
    assert got == want
    # the injection produced real hits of every type
    emails = sum(v[0] for v in got.values())
    phones = sum(v[1] for v in got.values())
    ips = sum(v[2] for v in got.values())
    ssns = sum(v[3] for v in got.values())
    assert emails > 0 and phones > 0 and ips > 0 and ssns > 0
    # the two-email doc counts 2
    assert any(v[0] == 2 for v in got.values())


def test_redact_pii_matches_oracle_and_clears_signals(spark):
    docs = _inject(load_table(spark, SF_DIR, "documents"))
    red = redact_pii(docs)
    got = {r.doc_id: r.text for r in red.collect()}
    want = dict(
        duckdb.sql(
            rf"""
            WITH t AS (SELECT doc_id, {_INJECT_SQL} AS text
                       FROM '{SF_DIR}/documents.parquet')
            SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                    '\b[0-9]{{3}}[-.][0-9]{{3}}[-.][0-9]{{4}}\b', '<PHONE>', 'g'),
                  '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b', '<IP>', 'g'),
                '\b[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}\b', '<SSN>', 'g') AS text
            FROM t
            """
        ).fetchall()
    )
    assert got == want
    assert any("<EMAIL>" in t for t in got.values())
    # redaction is idempotent w.r.t. detection: no PII left behind
    n_left = pii_signals(red).agg(F.sum("n_pii")).collect()[0][0]
    assert n_left == 0


def test_gopher_signals_match_oracle(spark):
    req = "['the','be','to','of','and','that','have','with']"
    got = {
        r.doc_id: (
            r.n_words,
            round(r.mean_word_len, 9),
            round(r.symbol_ratio, 9),
            round(r.alpha_word_frac, 9),
            round(r.bullet_line_frac, 9),
            round(r.ellipsis_line_frac, 9),
            r.stopword_hits,
            r.passes_gopher,
        )
        for r in gopher_quality_signals(
            # thresholds tuned so the flag discriminates on the synthetic
            # corpus: docs hold 0 or 1 of the 8 required stopwords
            load_table(spark, SF_DIR, "documents"), min_words=5, min_stop_hits=1
        ).collect()
    }
    want = {
        row[0]: (row[1], *[round(x, 9) for x in row[2:7]], row[7], row[8])
        for row in duckdb.sql(
            rf"""
            WITH t AS (
              SELECT doc_id,
                string_split_regex(trim(text), '[ \t\r\n\f]+') AS words,
                string_split_regex(trim(lower(text)), '[ \t\r\n\f]+') AS wl,
                string_split(text, chr(10)) AS lines,
                length(regexp_replace(trim(text), '[ \t\r\n\f]+', '', 'g')) AS word_chars,
                len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_sym
              FROM '{SF_DIR}/documents.parquet'
            ), s AS (
              SELECT doc_id,
                len(words) AS n_words,
                CAST(word_chars AS DOUBLE) / len(words) AS mean_word_len,
                CAST(n_sym AS DOUBLE) / len(words) AS symbol_ratio,
                CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                  / len(words) AS alpha_word_frac,
                CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
                  / len(lines) AS bullet_line_frac,
                CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
                  / len(lines) AS ellipsis_line_frac,
                len(list_filter({req}, s -> list_contains(wl, s))) AS stopword_hits
              FROM t
            )
            SELECT *,
              n_words >= 5 AND n_words <= 100000
              AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
              AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
              AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
              AND stopword_hits >= 1 AS passes_gopher
            FROM s
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d] == want[d], (d, got[d], want[d])
    # discriminative on this corpus: some pass, some fail
    flags = {v[-1] for v in got.values()}
    assert flags == {True, False}


def _rep_reference(doc_rows):
    """Independent Python reference for the FULL Gopher A1.1 repetition
    battery, mirroring the engine's pinned conventions: duplicated
    line/paragraph occurrences count including the first; top-gram ties go
    to the lexicographically largest gram; dup-n-gram coverage marks each
    word position once. All fractions are single int/int divisions —
    bit-exact across IEEE-754 engines."""
    import re as _re
    from collections import Counter

    TOP = {2: 0.20, 3: 0.18, 4: 0.16}
    DUP = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
    out = {}
    for doc_id, text in doc_rows:
        lines = text.split("\n")
        pars = _re.split(r"\n{2,}", text)
        norm = _re.sub(r"\s+", " ", text).strip().lower()
        w = norm.split(" ")
        word_chars = sum(len(x) for x in w)

        def unit_sig(units):
            c = Counter(units)
            dups = [u for u in units if c[u] > 1]
            chars = sum(len(u) for u in units)
            return (
                len(units),
                len(dups) / len(units),
                (sum(len(u) for u in dups) / chars) if chars > 0 else 0.0,
            )

        row = {}
        row["n_lines"], row["dup_line_frac"], row["dup_line_char_frac"] = unit_sig(lines)
        row["n_pars"], row["dup_par_frac"], row["dup_par_char_frac"] = unit_sig(pars)
        passes = (
            row["dup_line_frac"] <= 0.3
            and row["dup_line_char_frac"] <= 0.2
            and row["dup_par_frac"] <= 0.3
            and row["dup_par_char_frac"] <= 0.2
        )
        for n in sorted(TOP):
            starts = range(1, max(len(w) - (n - 1), 1) + 1)
            grams = [" ".join(w[p - 1 : p - 1 + n]) for p in starts]
            c = Counter(grams)
            top_cnt = max(c.values())
            top = max(g for g, k in c.items() if k == top_cnt)
            frac = (
                top_cnt * len(top.replace(" ", "")) / word_chars
                if word_chars > 0
                else 0.0
            )
            row[f"top_ngram_{n}"] = top
            row[f"top_ngram_count_{n}"] = top_cnt
            row[f"top_ngram_char_frac_{n}"] = frac
            passes = passes and (top_cnt <= 1 or frac <= TOP[n])
        for n in sorted(DUP):
            starts = range(1, max(len(w) - (n - 1), 1) + 1)
            grams = [" ".join(w[p - 1 : p - 1 + n]) for p in starts]
            c = Counter(grams)
            covered = set()
            for p, g in zip(starts, grams):
                if c[g] > 1:
                    covered.update(range(p, p + n))
            frac = (
                sum(len(w[k - 1]) for k in covered) / word_chars
                if word_chars > 0
                else 0.0
            )
            row[f"dup_ngram_char_frac_{n}"] = frac
            passes = passes and frac <= DUP[n]
        row["passes_repetition"] = passes
        out[doc_id] = row
    return out


def test_repetition_battery_matches_reference(spark):
    """Full battery vs the independent Python reference, on a corpus
    seeded with known repetition: every 9th doc gets a duplicated line,
    every 13th a bigram stutter, every 7th a duplicated paragraph, and
    every 11th a verbatim 10-gram repeat (tripping the dup-5..10-gram
    coverage rules)."""
    PAR = "\n\nthis paragraph appears twice in the document body\n\n"
    TEN = " one two three four five six seven eight nine ten"
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(F.col("text"), F.lit("\nrepeat me\nrepeat me")),
        )
        .when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.col("text"), F.lit(" spam ham spam ham spam ham spam ham")),
        )
        .when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(PAR + PAR)))
        .when(F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(TEN + TEN)))
        .otherwise(F.col("text")),
    )
    want = _rep_reference(
        [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    )
    got_rows = repetition_signals(docs).collect()
    assert len(got_rows) == len(want)
    checked_cols = list(next(iter(want.values())))
    for r in got_rows:
        exp = want[r.doc_id]
        for c in checked_cols:
            g, e = getattr(r, c), exp[c]
            if isinstance(e, float):
                assert round(g, 12) == round(e, 12), (r.doc_id, c, g, e)
            else:
                assert g == e, (r.doc_id, c, g, e)
    # the seeded docs trip their intended rules; both flags occur
    by_id = {r.doc_id: r for r in got_rows}
    # mirror the when-chain precedence: %9 before %13 before %7 before %11
    for d, r in by_id.items():
        if d % 9 == 0:
            assert r.dup_line_frac > 0
        elif d % 13 == 0:
            pass  # bigram stutter: covered by the reference parity above
        elif d % 7 == 0:
            assert r.dup_par_frac > 0
        elif d % 11 == 0:
            assert r.dup_ngram_char_frac_10 > 0
    assert {r.passes_repetition for r in got_rows} == {True, False}


def test_repetition_signals_custom_id_col(spark):
    docs = spark.createDataFrame(
        [(1, "spam ham spam ham spam ham spam ham"), (2, "one two three four")],
        ["my_id", "text"],
    )
    got = {
        r.my_id: (r.top_ngram_2, r.top_ngram_count_2, r.passes_repetition)
        for r in repetition_signals(docs, id_col="my_id").collect()
    }
    assert got[1][0] == "spam ham" and got[1][1] == 4 and not got[1][2]
    assert got[2][1] == 1 and got[2][2]


def test_repetition_battery_plan_shape(spark):
    """All nine n-gram sizes must ride ONE tagged explode: the documents
    source is scanned at most twice (the unit-signal side and the gram
    pipeline side of the per-doc join), there is exactly one Generate for
    the gram rows, and no cartesian/nested-loop join anywhere."""
    import re

    docs = load_table(spark, SF_DIR, "documents")
    df = repetition_signals(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = len(re.findall(r"documents\.parquet", plan))
    assert scans <= 2, plan
    assert len(re.findall(r"\bGenerate explode", plan)) == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
