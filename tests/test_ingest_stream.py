"""Streaming quarantine ingest (streaming/ingest_stream.py): streamed ==
batch reader over the union of files, per-epoch retry idempotency, the
metrics table's visibility contract, restart-resumes-from-checkpoint,
and the jsonl format variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.sources.jsonl import read_csv_quarantined
from l1dbproto_spark.streaming.ingest_stream import (
    StreamingQuarantineIngest,
    quarantine_rate,
)

SCHEMA = "doc_id long, lang string, n_chars long"


def _landing(tmp_path, name, text):
    d = tmp_path / "landing"
    d.mkdir(exist_ok=True)
    (d / name).write_text(text)
    return str(d)


FILE1 = (
    "doc_id,lang,n_chars\n"
    "1,en,100\n"
    "2,es,200\n"
    "BROKEN|3|en\n"
    '"doc_id", "lang", "n_chars"\n'  # mid-file quoted header: vanishes
    "4,fr,400\n"
)
FILE2 = (
    "5,en,500\n"
    "not_a_number,de,600\n"
    "6,de,650\n"
)


def test_streamed_equals_batch_and_metrics(spark, tmp_path):
    landing = _landing(tmp_path, "a.csv", FILE1)
    _landing(tmp_path, "b.csv", FILE2)
    out = str(tmp_path / "corpus")
    gate = StreamingQuarantineIngest(spark, SCHEMA, fmt="csv")
    gate.bind_stream(landing, out).awaitTermination()

    clean = spark.read.parquet(out)
    quarantine = spark.read.parquet(out + "_quarantine")
    b_clean, b_quar = read_csv_quarantined(spark, landing, SCHEMA)
    assert {tuple(r) for r in clean.select("doc_id", "lang", "n_chars").collect()} == {
        tuple(r) for r in b_clean.collect()
    }
    assert sorted(r._corrupt_record for r in quarantine.collect()) == sorted(
        r._corrupt_record for r in b_quar.collect()
    )
    rates = {r.epoch: (r.n_clean, r.n_quarantined) for r in
             quarantine_rate(spark, out).collect()}
    assert sum(c for c, _ in rates.values()) == 5
    assert sum(q for _, q in rates.values()) == 2
    # rate column: quarantined / total per epoch
    for r in quarantine_rate(spark, out).collect():
        assert r.rate == pytest.approx(
            r.n_quarantined / max(r.n_clean + r.n_quarantined, 1)
        )


def test_epoch_retry_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "corpus")
    gate = StreamingQuarantineIngest(spark, SCHEMA, fmt="csv")
    batch = spark.createDataFrame(
        [(line,) for line in FILE1.strip().split("\n")], "value string"
    )
    each = gate.foreach_batch(out)
    each(batch, 7)
    each(batch, 7)  # replayed epoch: overwrite, never duplicate
    clean = spark.read.parquet(out)
    assert clean.count() == 3
    assert spark.read.parquet(out + "_quarantine").count() == 1
    m = quarantine_rate(spark, out).collect()
    assert len(m) == 1 and m[0].epoch == 7 and m[0].n_clean == 3


def test_restart_resumes_only_new_files(spark, tmp_path):
    landing = _landing(tmp_path, "a.csv", FILE1)
    out = str(tmp_path / "corpus")
    gate = StreamingQuarantineIngest(spark, SCHEMA, fmt="csv")
    gate.bind_stream(landing, out).awaitTermination()
    n1 = spark.read.parquet(out).count()
    assert n1 == 3
    # drop a new file; a RESTARTED stream (same checkpoint) reads only it
    _landing(tmp_path, "b.csv", FILE2)
    gate.bind_stream(landing, out).awaitTermination()
    clean = spark.read.parquet(out)
    assert clean.count() == 5
    assert {r.doc_id for r in clean.collect()} == {1, 2, 4, 5, 6}
    # two epochs of metrics, no rewrite of the first
    assert quarantine_rate(spark, out).count() >= 2


def test_jsonl_format_variant(spark, tmp_path):
    landing = _landing(
        tmp_path,
        "a.jsonl",
        '{"doc_id": 1, "lang": "en", "n_chars": 100}\n'
        "this is not json\n"
        '{"doc_id": 2, "lang": "es", "n_chars": "not_a_number"}\n'
        '{"doc_id": 3, "lang": "fr"}\n',  # missing field: clean w/ NULL
    )
    out = str(tmp_path / "corpus")
    gate = StreamingQuarantineIngest(spark, SCHEMA, fmt="jsonl")
    gate.bind_stream(landing, out).awaitTermination()
    clean = spark.read.parquet(out)
    got = {r.doc_id: r.n_chars for r in clean.collect()}
    assert got == {1: 100, 3: None}
    assert spark.read.parquet(out + "_quarantine").count() == 2


def test_bad_format_rejected(spark):
    with pytest.raises(ValueError, match="csv.*jsonl"):
        StreamingQuarantineIngest(spark, SCHEMA, fmt="parquet")
