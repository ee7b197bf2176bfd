"""Unicode normalization + encoding-health signals (operators/textnorm.py):
DuckDB nfc_normalize parity on planted denormalized text, python
unicodedata reference parity for every form, pass-through guarantees, and
native signal counts against hand-computed values."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.textnorm import normalize_unicode, unicode_signals

# planted text: combining accent (NFC composes), precomposed (NFD
# decomposes), ligature + full-width (NFKC-only folds), Hangul jamo,
# plain ASCII (fixpoint), and mojibake/control/zero-width for signals
CASES = [
    (0, "café menu"),              # e + combining acute
    (1, "café menu"),               # precomposed e-acute
    (2, "ﬁle Ｆull-width"),     # fi ligature + fullwidth F
    (3, "각"),           # Hangul jamo -> syllable under NFC
    (4, "plain ascii only"),
    (5, None),
    (6, "bad � byte \x07 bell ​ zwsp ‮ bidi"),
]


def _docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string")


def test_nfc_matches_duckdb_and_python(spark):
    got = {
        r.doc_id: r.text
        for r in normalize_unicode(_docs(spark), form="NFC").collect()
    }
    for i, raw in CASES:
        assert got[i] == (unicodedata.normalize("NFC", raw) if raw is not None else None)
    con = duckdb.connect()
    for i, raw in CASES:
        if raw is None:
            continue
        want = con.execute("SELECT nfc_normalize(?)", [raw]).fetchone()[0]
        assert got[i] == want, i
    con.close()


@pytest.mark.parametrize("form", ["NFD", "NFKC", "NFKD"])
def test_other_forms_match_python(spark, form):
    got = {
        r.doc_id: r.text
        for r in normalize_unicode(_docs(spark), form=form).collect()
    }
    for i, raw in CASES:
        want = unicodedata.normalize(form, raw) if raw is not None else None
        assert got[i] == want, (form, i)


def test_passthrough_and_out_col(spark):
    docs = _docs(spark).withColumn("n", F.length("text"))
    out = normalize_unicode(docs, form="NFC", out_col="text_nfc")
    assert out.columns == ["doc_id", "text", "n", "text_nfc"]
    for r in out.collect():
        if r.text is not None:
            assert r.text_nfc == unicodedata.normalize("NFC", r.text)
            assert r.n == len(r.text)  # original untouched
    with pytest.raises(ValueError, match="form"):
        normalize_unicode(docs, form="NFX")
    with pytest.raises(ValueError, match="column"):
        normalize_unicode(docs, text_col="nope")


def test_unicode_signals_counts(spark):
    got = {r.doc_id: r for r in unicode_signals(_docs(spark)).collect()}
    s = got[6]
    assert s.n_replacement == 1
    assert s.n_control == 1  # \x07; \t\n\r are NOT flagged
    assert s.n_zero_width == 1
    assert s.n_bidi == 1
    assert got[4].n_non_ascii == 0 and got[4].non_ascii_ratio == 0.0
    assert got[0].n_non_ascii == 1  # the combining acute
    assert got[5].n_chars is None  # NULL text -> NULL counts
    assert got[5].non_ascii_ratio is None  # ...including the ratio
    # ratio is exact int/int division
    r = got[0]
    assert r.non_ascii_ratio == r.n_non_ascii / r.n_chars
