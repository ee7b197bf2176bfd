"""Streaming media ingest gate (streaming/media_stream.py): probe
classification, epoch outputs, replay idempotency, restart-reads-only-
new-files — the text ingest gate's contract over binary media."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.streaming.media_stream import (
    ADMITTED_SCHEMA,
    QUARANTINE_SCHEMA,
    StreamingMediaIngest,
    media_ingest_rate,
    read_admitted,
    read_quarantined,
)

SR = 8000


def ppm_bytes(seed: int) -> bytes:
    rgb = np.random.default_rng(seed).integers(0, 256, (16, 16, 3)).astype(
        np.uint8
    )
    return b"P6 16 16 255\n" + rgb.tobytes()


def wav_bytes(ms: int = 250) -> bytes:
    t = np.arange(SR * ms // 1000) / SR
    ints = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def avi_bytes(n_frames: int = 3) -> bytes:
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<10I", 40000, 0, 0, 0, n_frames, 0, 1, 0, 16, 16)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", b"vids" + b"MJPG" + b"\x00" * 48)),
    )
    movi = lst(
        b"movi", b"".join(chunk(b"00dc", ppm_bytes(i)) for i in range(n_frames))
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _land(d, name, data):
    (d / name).write_bytes(data)


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    _land(d, "a.ppm", ppm_bytes(1))
    _land(d, "b.wav", wav_bytes())
    _land(d, "c.avi", avi_bytes())
    _land(d, "d.jpg", b"\xff\xd8 not actually decodable here")
    return d


def test_gate_classifies_and_quarantines(spark, landing, tmp_path):
    out = str(tmp_path / "media")
    gate = StreamingMediaIngest(spark)
    q = gate.bind_stream(str(landing), out)
    q.awaitTermination(120)
    adm = {r.path.split("/")[-1]: r for r in spark.read.parquet(out).collect()}
    assert {n for n in adm} == {"a.ppm", "b.wav", "c.avi"}
    assert adm["a.ppm"].kind == "image" and adm["a.ppm"].width == 16
    assert adm["b.wav"].kind == "audio" and adm["b.wav"].sample_rate == SR
    assert adm["b.wav"].duration_ms == pytest.approx(250.0)
    assert adm["c.avi"].kind == "video" and adm["c.avi"].n_frames == 3
    assert adm["c.avi"].fps == pytest.approx(25.0)
    qua = spark.read.parquet(out + "_quarantine").collect()
    assert len(qua) == 1 and qua[0].path.endswith("d.jpg")
    assert qua[0].fingerprint is not None
    rate = media_ingest_rate(spark, out).collect()[0]
    assert (rate.n_admitted, rate.n_quarantined) == (3, 1)
    assert (rate.n_image, rate.n_audio, rate.n_video) == (1, 1, 1)
    assert rate.rate == pytest.approx(0.25)


def test_streamed_equals_batch_probe(spark, landing, tmp_path):
    out = str(tmp_path / "media")
    gate = StreamingMediaIngest(spark)
    gate.bind_stream(str(landing), out).awaitTermination(120)
    batch = spark.read.format("binaryFile").load(str(landing))
    adm, qua = gate.probe(batch)
    streamed = spark.read.parquet(out).drop("epoch")
    assert sorted(streamed.columns) == sorted(adm.columns)
    a = {tuple(r) for r in adm.select(*sorted(adm.columns)).collect()}
    s = {tuple(r) for r in streamed.select(*sorted(adm.columns)).collect()}
    assert a == s
    assert qua.count() == spark.read.parquet(out + "_quarantine").count()


def test_replayed_epoch_is_idempotent(spark, landing, tmp_path):
    out = str(tmp_path / "media")
    gate = StreamingMediaIngest(spark)
    batch = spark.read.format("binaryFile").load(str(landing))
    body = gate.foreach_batch(out)
    body(batch, 0)
    n1 = spark.read.parquet(out).count()
    body(batch, 0)  # replay: dynamic overwrite replaces epoch 0
    assert spark.read.parquet(out).count() == n1
    assert spark.read.parquet(out + "_metrics").count() == 1


def test_restart_reads_only_new_files(spark, landing, tmp_path):
    out = str(tmp_path / "media")
    gate = StreamingMediaIngest(spark)
    gate.bind_stream(str(landing), out).awaitTermination(120)
    epochs1 = {
        r.epoch for r in spark.read.parquet(out).select("epoch").collect()
    }
    _land(landing, "e.ppm", ppm_bytes(2))
    gate.bind_stream(str(landing), out).awaitTermination(120)
    df = spark.read.parquet(out)
    assert df.count() == 4
    new = df.filter(~F.col("epoch").isin(list(epochs1)))
    assert [r.path.split("/")[-1] for r in new.collect()] == ["e.ppm"]


def test_all_valid_first_epoch_has_empty_quarantine(spark, tmp_path):
    """The common happy path: epoch 0 lands ONLY decodable media, so the
    quarantine side writes an empty frame (a partition directory with no
    parquet files). The metrics read-back must survive schema-less
    directories on either side instead of dying on UNABLE_TO_INFER_SCHEMA."""
    d = tmp_path / "landing"
    d.mkdir()
    _land(d, "a.ppm", ppm_bytes(7))
    _land(d, "b.wav", wav_bytes())
    out = str(tmp_path / "media")
    gate = StreamingMediaIngest(spark)
    q = gate.bind_stream(str(d), out)
    q.awaitTermination(120)
    rate = media_ingest_rate(spark, out).collect()[0]
    assert (rate.n_admitted, rate.n_quarantined) == (2, 0)
    assert rate.rate == pytest.approx(0.0)
    assert read_quarantined(spark, out).count() == 0
    # the declared contracts match what the writer actually lands
    landed = spark.read.parquet(out)
    assert [(f.name, f.dataType) for f in landed.schema.fields] == [
        (f.name, f.dataType) for f in ADMITTED_SCHEMA.fields
    ]


def test_all_invalid_first_epoch_has_empty_admitted(spark, tmp_path):
    """Mirror case: a fully-poisoned epoch 0 leaves the admitted side as
    the file-less directory; the gate must still land the metrics row."""
    d = tmp_path / "landing"
    d.mkdir()
    _land(d, "x.bin", b"\x00\x01 not media at all")
    out = str(tmp_path / "media")
    gate = StreamingMediaIngest(spark)
    gate.bind_stream(str(d), out).awaitTermination(120)
    rate = media_ingest_rate(spark, out).collect()[0]
    assert (rate.n_admitted, rate.n_quarantined) == (0, 1)
    assert rate.rate == pytest.approx(1.0)
    assert read_admitted(spark, out).count() == 0
    landed = spark.read.parquet(out + "_quarantine")
    assert [(f.name, f.dataType) for f in landed.schema.fields] == [
        (f.name, f.dataType) for f in QUARANTINE_SCHEMA.fields
    ]


def test_all_null_payloads_yield_empty_frames_everywhere(spark):
    """The all-skipped Arrow batch is the family's known pitfall (empty
    object columns break conversion) — drive every r11 media operator
    with only-null payloads and require clean empty results."""
    from l1dbproto_spark.operators.audio import (
        audio_features,
        decode_audio,
        segment_silence,
        spectrogram_hash,
    )
    from l1dbproto_spark.operators.multimodal import (
        decode_media,
        image_quality_signals,
        perceptual_hashes,
        probe_media,
    )

    nulls = spark.createDataFrame(
        [(i, None) for i in range(3)], "media_id long, payload binary"
    )
    adec = decode_audio(nulls)
    idec = decode_media(nulls)
    assert adec.count() == 0 and idec.count() == 0
    assert probe_media(nulls).count() == 0
    assert audio_features(adec).count() == 0
    assert segment_silence(adec).count() == 0
    assert spectrogram_hash(adec).count() == 0
    assert perceptual_hashes(idec).count() == 0
    assert image_quality_signals(idec).count() == 0
