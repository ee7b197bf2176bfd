"""Streaming decontamination gate (streaming/decontam.py): per-batch
admission equals batch-mode decontaminate over the union (the gate is
stateless by design), and the foreachBatch binding is end-to-end
idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.contamination import decontaminate
from l1dbproto_spark.sources.catalog import load_table
from l1dbproto_spark.streaming.decontam import StreamingDecontamGate

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def test_streaming_matches_batch_decontaminate(spark):
    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    gate = StreamingDecontamGate(spark, ev, n=3, max_contamination=0.0)
    admitted = set()
    for lo, hi in [(0, 150), (150, 320), (320, 10_000)]:
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        admitted |= {r.doc_id for r in gate.admit(batch).collect()}
    clean, _ = decontaminate(docs, ev, n=3, max_contamination=0.0)
    assert admitted == {r.doc_id for r in clean.select("doc_id").collect()}
    # the gate actually rejected something (every eval member at least)
    assert admitted.isdisjoint({r.doc_id for r in ev.select("doc_id").collect()})


def test_admit_idempotent_and_schema_preserving(spark):
    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    gate = StreamingDecontamGate(spark, ev, n=3)
    batch = docs.filter(F.col("doc_id") < 120)
    a1 = {r.doc_id for r in gate.admit(batch).collect()}
    a2 = {r.doc_id for r in gate.admit(batch).collect()}
    assert a1 == a2
    assert gate.admit(batch).columns == batch.columns


def test_bind_stream_end_to_end(spark, tmp_path):
    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    src = tmp_path / "src"
    out = tmp_path / "out"
    docs.write.parquet(str(src))
    gate = StreamingDecontamGate(spark, ev, n=3, max_contamination=0.0)
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    q = gate.bind_stream(stream, str(out))
    q.awaitTermination(120)
    got = {
        r.doc_id
        for r in spark.read.parquet(str(out)).select("doc_id").collect()
    }
    clean, _ = decontaminate(docs, ev, n=3, max_contamination=0.0)
    assert got == {r.doc_id for r in clean.select("doc_id").collect()}


def test_epoch_retry_overwrites_not_duplicates(spark, tmp_path):
    """A retried foreachBatch epoch must REPLACE its own output partition:
    simulate the retry by invoking the epoch writer twice and assert the
    output equals one clean run (per-epoch dynamic overwrite)."""
    docs = _docs(spark).filter(F.col("doc_id") < 100)
    ev = _docs(spark).filter(F.col("doc_id") % 50 == 0)
    out = str(tmp_path / "out")
    gate = StreamingDecontamGate(spark, ev, n=3, max_contamination=0.0)

    def write_epoch(batch, epoch_id):
        admitted = gate.admit(batch).withColumn("epoch", F.lit(epoch_id))
        (
            admitted.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out)
        )

    write_epoch(docs, 0)
    once = spark.read.parquet(out).count()
    write_epoch(docs, 0)  # the retry
    again = spark.read.parquet(out)
    assert again.count() == once
    # no doc appears twice
    assert again.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_bind_stream_restart_is_noop(spark, tmp_path):
    """Restarting the bound stream against its checkpoint reprocesses
    nothing: the output is unchanged after a second run over the same
    source."""
    docs = _docs(spark).filter(F.col("doc_id") < 150)
    ev = _docs(spark).filter(F.col("doc_id") % 50 == 0)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    docs.write.parquet(src)
    gate = StreamingDecontamGate(spark, ev, n=3)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    gate.bind_stream(stream, out).awaitTermination(120)
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    # second run: same source, same checkpoint -> no new epoch, same rows
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    gate.bind_stream(stream2, out).awaitTermination(120)
    second = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == second
