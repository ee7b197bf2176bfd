"""Streaming exact weighted reservoir (streaming/sample_stream.py):
streamed fold == the batch operator over the union of all batches (exact,
ranks included), replay/at-least-once idempotency from the key algebra,
payload carry-through, and the availableNow stream wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.operators.sampling import weighted_topk_sample
from l1dbproto_spark.streaming.sample_stream import StreamingWeightedSample


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
    )


def _key(df):
    return {
        (r.src, r.sample_rank): (r.doc_id, r.text) for r in df.collect()
    }


def test_streamed_fold_equals_batch_operator(spark, tmp_path):
    gate = StreamingWeightedSample(
        spark, str(tmp_path / "s"), k=4, weight_col="w",
        group_col="src", payload_cols=["text"],
    )
    for lo, hi in ((0, 300), (300, 650), (650, 1000)):
        gate.merge(_docs(spark, lo, hi))
    want = weighted_topk_sample(
        _docs(spark, 0, 1000), k=4, weight_col="w", group_col="src"
    )
    want_k = {
        (r.src, r.sample_rank): r.doc_id for r in want.collect()
    }
    got = _key(gate.sample())
    assert {k: v[0] for k, v in got.items()} == want_k
    assert len(got) == 12
    # payload rode along with the winning documents
    assert all(v[1] == f"payload-{v[0]}" for v in got.values())


def test_replay_and_at_least_once_idempotent(spark, tmp_path):
    gate = StreamingWeightedSample(
        spark, str(tmp_path / "s"), k=4, weight_col="w", group_col="src",
    )
    b1, b2 = _docs(spark, 0, 400), _docs(spark, 400, 800)
    gate.merge(b1)
    gate.merge(b2)
    before = _key_ids(gate.sample())
    gate.merge(b2)  # replayed epoch
    assert _key_ids(gate.sample()) == before
    gate.merge(_docs(spark, 100, 500))  # at-least-once overlap re-delivery
    assert _key_ids(gate.sample()) == before


def _key_ids(df):
    return {(r.src, r.sample_rank): r.doc_id for r in df.collect()}


def test_available_now_binding(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    _docs(spark, 0, 500).write.parquet(src_dir)
    gate = StreamingWeightedSample(
        spark, str(tmp_path / "s"), k=3, weight_col="w", group_col="src",
    )
    stream = spark.readStream.schema(
        "doc_id long, src string, w double, text string"
    ).parquet(src_dir)
    gate.bind_stream(stream, str(tmp_path / "ckpt")).awaitTermination()
    want = _key_ids(
        weighted_topk_sample(
            _docs(spark, 0, 500), k=3, weight_col="w", group_col="src"
        )
    )
    assert _key_ids(gate.sample()) == want and len(want) == 9


def test_global_sample_no_group(spark, tmp_path):
    gate = StreamingWeightedSample(
        spark, str(tmp_path / "s"), k=5, weight_col="w",
    )
    gate.merge(_docs(spark, 0, 200))
    gate.merge(_docs(spark, 200, 600))
    want = {
        r.sample_rank: r.doc_id
        for r in weighted_topk_sample(
            _docs(spark, 0, 600), k=5, weight_col="w"
        ).collect()
    }
    got = {r.sample_rank: r.doc_id for r in gate.sample().collect()}
    assert got == want and len(got) == 5


def test_crash_mid_write_preserves_prior_sample(spark, tmp_path):
    """r11 review find: the first cut overwrote the store in place, so a
    crash between delete and write lost ALL reservoir state. The store
    is now versioned with Spark's _SUCCESS marker as the commit: a
    marker-less directory (crashed writer) above the current version is
    never selected, and the next merge supersedes it."""
    import os

    gate = StreamingWeightedSample(
        spark, str(tmp_path / "s"), k=4, weight_col="w", group_col="src",
    )
    b1, b2 = _docs(spark, 0, 400), _docs(spark, 400, 800)
    gate.merge(b1)
    committed = _key_ids(gate.sample())
    # simulate a crashed writer: a higher version dir WITHOUT _SUCCESS
    crashed = str(tmp_path / "s" / "v=7")
    _docs(spark, 900, 905).write.parquet(crashed)
    os.remove(os.path.join(crashed, "_SUCCESS"))
    assert _key_ids(gate.sample()) == committed  # crash invisible
    gate.merge(b2)  # proceeds past the wreck (writes v=8, GCs the rest)
    want = _key_ids(
        weighted_topk_sample(
            _docs(spark, 0, 800), k=4, weight_col="w", group_col="src"
        )
    )
    assert _key_ids(gate.sample()) == want
    leftover = [
        d for d in os.listdir(str(tmp_path / "s")) if d.startswith("v=")
    ]
    assert leftover == ["v=8"]  # superseded + crashed versions collected
