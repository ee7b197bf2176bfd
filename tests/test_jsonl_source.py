"""JSONL corpus source/sink (sources/jsonl.py): schema-pinned reads, the
one-bad-line-costs-one-row quarantine contract, gzip handling, and the
round trip through the writer."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.sources.jsonl import read_jsonl, write_jsonl

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string, lang string"


def _write_lines(path, lines, compress=False):
    data = ("\n".join(lines) + "\n").encode()
    if compress:
        path.write_bytes(gzip.compress(data))
    else:
        path.write_bytes(data)


def test_clean_and_quarantine_split(spark, tmp_path):
    good = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
        json.dumps({"doc_id": 2, "text": "hola", "lang": "es"}),
        json.dumps({"doc_id": 3, "lang": "en"}),  # missing field -> NULL, clean
    ]
    bad = [
        '{"doc_id": 4, "text": "unterminated',       # malformed JSON
        '{"doc_id": "not a number", "text": "x"}',   # type mismatch
        "plain text, not json",
    ]
    p = tmp_path / "corpus.jsonl"
    _write_lines(p, good + bad)
    clean, quarantine = read_jsonl(spark, str(p), SCHEMA)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3].text is None and rows[3].lang == "en"
    assert clean.columns == ["doc_id", "text", "lang"]
    q = [r._corrupt_record for r in quarantine.collect()]
    assert len(q) == 3
    assert any("unterminated" in s for s in q)
    assert any("plain text" in s for s in q)


def test_gzip_lines_read(spark, tmp_path):
    p = tmp_path / "corpus.jsonl.gz"
    _write_lines(
        p,
        [json.dumps({"doc_id": i, "text": f"t{i}", "lang": "en"}) for i in range(50)],
        compress=True,
    )
    clean, quarantine = read_jsonl(spark, str(p), SCHEMA)
    assert clean.count() == 50 and quarantine.count() == 0


def test_round_trip_documents_table(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    out = tmp_path / "out"
    write_jsonl(docs, str(out), compress=True, partition_by=["lang"])
    clean, quarantine = read_jsonl(spark, str(out), SCHEMA)
    assert quarantine.count() == 0
    got = clean.select("doc_id", "text", "lang").orderBy("doc_id").collect()
    want = docs.orderBy("doc_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_schema_is_required_and_guarded(spark, tmp_path):
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, str(tmp_path), SCHEMA + ", _corrupt_record string")


def test_csv_quarantined_roundtrip_and_bad_lines(spark, tmp_path):
    from l1dbproto_spark.sources.jsonl import read_csv_quarantined
    from l1dbproto_spark.sources.sinks import write_csv

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    out = tmp_path / "csv"
    write_csv(orders, str(out))
    schema = "o_orderkey long, o_custkey long, o_orderpriority string"
    clean, quarantine = read_csv_quarantined(spark, str(out), schema)
    assert quarantine.count() == 0
    got = clean.orderBy("o_orderkey").collect()
    want = orders.orderBy("o_orderkey").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # hand-built file with a mid-file header (concatenated export: dropped
    # like the first one, never data), a type mismatch and a wrong-arity
    # line (both quarantine — CSV has no field names, so a short row is
    # indistinguishable from a broken one, unlike JSONL's named
    # missing-field case which stays clean); the rest parse
    p = tmp_path / "messy.csv"
    p.write_text(
        "o_orderkey,o_custkey,o_orderpriority\n"
        "1,10,HIGH\n"
        "o_orderkey,o_custkey,o_orderpriority\n"  # concatenated export
        "not_a_number,11,LOW\n"
        "2,20\n"  # wrong arity
        "3,30,MED\n"
    )
    clean, quarantine = read_csv_quarantined(spark, str(p), schema)
    rows = {r.o_orderkey: r for r in clean.collect()}
    assert set(rows) == {1, 3}
    q = [r._corrupt_record for r in quarantine.collect()]
    assert sorted(q) == ["2,20", "not_a_number,11,LOW"]


def test_csv_quarantined_normalized_header_variants_drop(spark, tmp_path):
    """r10 review find: foreign exporters render headers with quotes or
    padding; exact-string matching mislabeled those as data (they
    type-mismatched into quarantine). The match is now NORMALIZED —
    trim + one surrounding quote pair per field — so all these variants
    drop as headers, first-line or mid-file, while near-miss lines stay
    data."""
    from l1dbproto_spark.sources.jsonl import read_csv_quarantined

    p = tmp_path / "quoted.csv"
    p.write_text(
        '"o_orderkey","o_custkey","o_orderpriority"\n'  # quoted header
        "1,10,HIGH\n"
        '"o_orderkey", "o_custkey", "o_orderpriority"\n'  # quoted+spaced, mid-file
        " o_orderkey , o_custkey , o_orderpriority \n"  # space-padded, mid-file
        "2,20,LOW\n"
        "o_orderkey,o_custkey,EXTRA_COLUMN\n"  # differs beyond style: data -> quarantine
    )
    schema = "o_orderkey long, o_custkey long, o_orderpriority string"
    clean, quarantine = read_csv_quarantined(spark, str(p), schema)
    assert {r.o_orderkey for r in clean.collect()} == {1, 2}
    q = [r._corrupt_record for r in quarantine.collect()]
    assert q == ["o_orderkey,o_custkey,EXTRA_COLUMN"]
