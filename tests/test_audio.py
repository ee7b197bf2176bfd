"""Audio decode + quality features (operators/audio.py).

The WAV fixtures are built two independent ways: the stdlib ``wave``
module writes the 16-bit files (an encoder our decoder never saw), and
the 8/24-bit/float variants are hand-assembled per the RIFF spec — so a
header-math bug cannot hide behind a shared writer.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from l1dbproto_spark.operators.audio import (
    _decode_wav,
    audio_features,
    decode_audio,
)

SR = 8000


def wav16(x: np.ndarray, sr: int = SR, channels: int = 1) -> bytes:
    """16-bit PCM via the stdlib encoder. x in [-1, 1], shape (n,) or
    (n, channels)."""
    pcm = np.clip(x, -1, 1)
    ints = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def wav_manual(data: bytes, fmt: int, channels: int, sr: int, bits: int) -> bytes:
    """Hand-assembled RIFF with a LIST chunk BEFORE fmt (chunk-walk test)."""
    block = channels * bits // 8
    fmt_body = struct.pack("<HHIIHH", fmt, channels, sr, sr * block, block, bits)
    chunks = (
        b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def tone(freq: float, ms: int, sr: int = SR, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(sr * ms / 1000)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def test_decode_wav_16bit_roundtrip():
    x = tone(440, 200)
    sr, ch, bits, mono = _decode_wav(wav16(x))
    assert (sr, ch, bits) == (SR, 1, 16)
    assert len(mono) == len(x)
    assert np.max(np.abs(mono - x.astype(np.float32))) < 2e-4  # quantization


def test_decode_wav_stereo_mixdown():
    left, right = tone(440, 100, amp=0.8), tone(440, 100, amp=0.2)
    stereo = np.stack([left, right], axis=1)
    _, ch, _, mono = _decode_wav(wav16(stereo, channels=2))
    assert ch == 2
    assert np.max(np.abs(mono - (left + right) / 2)) < 2e-4


def test_decode_wav_8_24_float_and_extensible():
    x = tone(100, 50, amp=0.9)
    # 8-bit unsigned
    u8 = (np.clip(x, -1, 1) * 127 + 128).astype("u1").tobytes()
    sr, _, bits, mono = _decode_wav(wav_manual(u8, 1, 1, SR, 8))
    assert bits == 8 and np.max(np.abs(mono - x)) < 1 / 64
    # 24-bit signed little-endian
    i32 = (np.clip(x, -1, 1) * ((1 << 23) - 1)).astype("<i4")
    i24 = i32.astype("<i4").tobytes()
    i24 = b"".join(i24[i : i + 3] for i in range(0, len(i24), 4))
    _, _, bits, mono = _decode_wav(wav_manual(i24, 1, 1, SR, 24))
    assert bits == 24 and np.max(np.abs(mono - x)) < 1e-6
    # IEEE float32
    f32 = x.astype("<f4").tobytes()
    _, _, bits, mono = _decode_wav(wav_manual(f32, 3, 1, SR, 32))
    assert bits == 32 and np.array_equal(mono, x.astype(np.float32))
    # WAVE_FORMAT_EXTENSIBLE wrapping PCM: fmt body 40 bytes, subformat @24
    body = struct.pack("<HHIIHH", 0xFFFE, 1, SR, SR * 2, 2, 16)
    # cbSize=22, validbits=16, channel mask, then the 16-byte subformat
    # GUID whose first 2 bytes are the wrapped format code (1 = PCM)
    body += struct.pack("<HHI", 22, 16, 0) + struct.pack("<H", 1) + b"\x00" * 14
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", 4) + struct.pack("<hh", 16384, -16384)
    )
    sr, ch, bits, mono = _decode_wav(blob)
    assert (sr, ch, bits) == (SR, 1, 16)
    assert np.allclose(mono, [0.5, -0.5])


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"RIFF\x10\x00\x00\x00WAVE",  # no chunks
        b"ID3\x03\x00garbage-mp3-ish" * 3,  # not RIFF
        wav16(tone(440, 50))[:30],  # truncated mid-fmt
        wav_manual(b"\x00\x00", 85, 1, SR, 16),  # unknown format tag (MP3=85)
    ],
)
def test_decode_wav_rejects(blob):
    with pytest.raises(ValueError):
        _decode_wav(blob)


def _media_df(spark, blobs):
    return spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)],
        "media_id long, payload binary",
    )


def test_decode_audio_contract(spark):
    blobs = [
        wav16(tone(440, 120)),
        b"not audio at all",
        None,
        wav16(tone(200, 50, amp=0.3), channels=1),
    ]
    out = decode_audio(_media_df(spark, blobs)).orderBy("media_id").collect()
    assert [r.media_id for r in out] == [0, 1, 3]  # null payload skipped
    good = out[0]
    assert good.ok and good.sample_rate == SR and good.n_channels == 1
    assert good.n_samples == SR * 120 // 1000
    assert good.duration_ms == pytest.approx(120.0)
    assert len(good.pcm) == 4 * good.n_samples  # float32 mono
    bad = out[1]
    assert not bad.ok and bad.sample_rate is None and bad.pcm is None


def test_audio_features_against_numpy(spark):
    # half silence, half near-clipped tone -> known silence/clip/zcr
    sig = np.concatenate([np.zeros(SR // 2), tone(1000, 500, amp=1.0)])
    df = decode_audio(_media_df(spark, [wav16(sig)]))
    row = audio_features(df).collect()[0]
    assert row.ok and row.n_windows > 0
    x = np.frombuffer(
        decode_audio(_media_df(spark, [wav16(sig)])).collect()[0].pcm, "<f4"
    )
    win, hop = SR * 25 // 1000, SR * 10 // 1000
    starts = range(0, len(x) - win + 1, hop)
    rms = np.array([np.sqrt(np.mean(x[s : s + win] ** 2)) for s in starts])
    assert row.n_windows == len(rms)
    assert row.rms_db == pytest.approx(
        20 * np.log10(np.sqrt(np.mean(x**2))), abs=1e-6
    )
    assert row.peak == pytest.approx(float(np.max(np.abs(x))), abs=1e-7)
    assert row.silence_ratio == pytest.approx(
        float(np.mean(rms < 10 ** (-40 / 20))), abs=1e-9
    )
    assert row.clipping_ratio == pytest.approx(
        float(np.mean(np.abs(x) >= 0.999)), abs=1e-9
    )
    # 1 kHz tone at 8 kHz: 2 crossings/ms -> zcr ~ 0.25 over the tone half
    assert 0.05 < row.zcr_mean < 0.3


def test_audio_features_gate_semantics(spark):
    blobs = [wav16(tone(440, 100)), b"corrupt"]
    feats = (
        audio_features(decode_audio(_media_df(spark, blobs)))
        .orderBy("media_id")
        .collect()
    )
    assert feats[0].ok and feats[0].rms_db is not None
    assert not feats[1].ok and feats[1].rms_db is None  # passes through


def test_audio_short_recording_is_one_window(spark):
    # 5 ms at 8 kHz = 40 samples < one 200-sample window
    df = decode_audio(_media_df(spark, [wav16(tone(440, 5))]))
    row = audio_features(df).collect()[0]
    assert row.ok and row.n_windows == 1


def _decoded(spark, sigs):
    return decode_audio(_media_df(spark, [wav16(s) for s in sigs]))


def silence(ms: int) -> np.ndarray:
    return np.zeros(SR * ms // 1000)


def test_segment_silence_boundaries_and_click_drop(spark):
    from l1dbproto_spark.operators.audio import segment_silence

    sig = np.concatenate(
        [
            silence(400),
            tone(440, 300),
            silence(500),
            tone(600, 400),
            silence(400),
            tone(800, 50),  # 50 ms click < min_segment_ms
            silence(400),
        ]
    )
    segs = (
        segment_silence(_decoded(spark, [sig]))
        .orderBy("segment_idx")
        .collect()
    )
    assert [s.segment_idx for s in segs] == [0, 1]
    # boundaries within one window+hop of the construction
    assert segs[0].start_ms == pytest.approx(400, abs=35)
    assert segs[0].end_ms == pytest.approx(700, abs=35)
    assert segs[1].start_ms == pytest.approx(1200, abs=35)
    assert segs[1].duration_ms == pytest.approx(400, abs=70)
    assert all(s.rms_db > -40 for s in segs)


def test_segment_silence_merges_short_gaps(spark):
    from l1dbproto_spark.operators.audio import segment_silence

    sig = np.concatenate(
        [silence(300), tone(440, 200), silence(100), tone(440, 200), silence(300)]
    )
    segs = segment_silence(_decoded(spark, [sig])).collect()
    assert len(segs) == 1  # 100 ms gap < min_silence_ms merges
    assert segs[0].duration_ms == pytest.approx(500, abs=70)
    # all-silence recording emits zero rows
    assert segment_silence(_decoded(spark, [silence(800)])).count() == 0


def melody(freqs, ms_each=120, amp=0.4):
    return np.concatenate([tone(f, ms_each, amp=amp) for f in freqs])


def test_spectrogram_hash_gain_invariant_and_discriminative(spark):
    from l1dbproto_spark.operators.audio import spectrogram_hash

    a = melody([300, 500, 700, 900, 400], amp=0.3)
    hs = {
        r.media_id: r.spec_hash
        for r in spectrogram_hash(
            _decoded(
                spark,
                [
                    a,
                    2.0 * a,  # 6 dB louder, same content
                    a + RNG_NOISE.normal(0, 0.01, len(a)),  # mild noise
                    melody([900, 400, 300, 700, 500], amp=0.3),  # reordered
                    melody([250, 1100, 350, 1500, 600], amp=0.3),  # different
                ],
            )
        ).collect()
    }

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert hs[0] == hs[1]  # pure gain cancels in the log-mean comparison
    assert ham(hs[0], hs[2]) <= 4
    # same notes reordered: shared frequency content but shifted time
    # cells — outside near-dup range yet closer than unrelated content
    assert ham(hs[0], hs[3]) >= 6
    assert ham(hs[0], hs[4]) >= 12  # different notes -> far


RNG_NOISE = np.random.default_rng(7)


def test_spectrogram_hash_passthrough_and_short_pad(spark):
    from l1dbproto_spark.operators.audio import spectrogram_hash

    out = {
        r.media_id: r
        for r in spectrogram_hash(
            decode_audio(
                _media_df(spark, [wav16(tone(440, 10)), b"corrupt"])
            )
        ).collect()
    }
    assert out[0].ok and out[0].spec_hash is not None  # 80 samples < n_fft
    assert not out[1].ok and out[1].spec_hash is None


def test_wav_meta_matches_decoder():
    from l1dbproto_spark.operators.audio import wav_meta

    for blob, want_bits in [
        (wav16(tone(440, 200)), 16),
        (wav16(tone(440, 100, amp=0.8), channels=1), 16),
    ]:
        sr, ch, bits, frames = wav_meta(blob)
        sr2, ch2, bits2, mono = _decode_wav(blob)
        assert (sr, ch, bits) == (sr2, ch2, bits2) and bits == want_bits
        assert frames == len(mono)
    # stereo frame counting
    stereo = np.stack([tone(440, 100), tone(440, 100)], axis=1)
    _, ch, _, frames = wav_meta(wav16(stereo, channels=2))
    assert ch == 2 and frames == SR // 10
    # rejects the same format classes
    for bad in (b"", b"RIFF\x10\x00\x00\x00WAVE",
                wav_manual(b"\x00\x00", 85, 1, SR, 16)):
        with pytest.raises(ValueError):
            wav_meta(bad)


def test_wav_meta_truncated_data_counts_whole_frames():
    from l1dbproto_spark.operators.audio import wav_meta

    # a data chunk truncated mid-sample-frame: meta counts whole frames
    # (documented), the full decoder rejects the ragged buffer
    blob = wav_manual(b"\x00\x01\x02", 1, 1, SR, 16)  # 1.5 16-bit frames
    _, _, _, frames = wav_meta(blob)
    assert frames == 1
    with pytest.raises(ValueError):
        _decode_wav(blob)
    # stereo cut on a SAMPLE (not frame) boundary: whole int16 samples,
    # partial frame — meta counts whole frames, decoder rejects (the
    # channel-ragged case, distinct from the sample-width-ragged one)
    stereo_ragged = wav_manual(b"\x00\x01\x02\x03\x04\x05", 1, 2, SR, 16)
    _, ch, _, frames = wav_meta(stereo_ragged)
    assert ch == 2 and frames == 1
    with pytest.raises(ValueError, match="mid-frame"):
        _decode_wav(stereo_ragged)


def _flac_bytes(sr=44100, ch=2, bits=16, total=44100 * 3, last=True):
    import struct

    packed = (sr << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    streaminfo = (
        struct.pack(">HH", 1024, 1024)  # min/max block size
        + b"\x00\x00\x00" * 2  # min/max frame size (unknown)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of unencoded audio
    )
    hdr = bytes([(0x80 if last else 0x00) | 0x00]) + len(streaminfo).to_bytes(3, "big")
    return b"fLaC" + hdr + streaminfo


def test_flac_meta_parses_streaminfo():
    from l1dbproto_spark.operators.audio import flac_meta

    assert flac_meta(_flac_bytes()) == (44100, 2, 16, 132300)
    assert flac_meta(_flac_bytes(sr=8000, ch=1, bits=24, total=0)) == (
        8000, 1, 24, 0,
    )  # total=0 means 'unknown' per spec, passed through


def test_flac_meta_rejections():
    from l1dbproto_spark.operators.audio import flac_meta

    import struct

    wrong_first = b"fLaC" + bytes([0x84]) + (34).to_bytes(3, "big") + b"\x00" * 34
    zero_rate = _flac_bytes(sr=0)
    for bad in (b"", b"fLaCxx", _flac_bytes()[:20], wrong_first, zero_rate):
        with pytest.raises(ValueError):
            flac_meta(bad)


def test_probe_classifies_flac_as_audio(spark):
    from l1dbproto_spark.operators.multimodal import probe_media

    blobs = spark.createDataFrame(
        [(1, _flac_bytes(sr=16000, ch=1, total=16000 * 2)),
         (2, _flac_bytes()[:10])],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in probe_media(blobs).collect()}
    assert got[1].ok and got[1].kind == "audio"
    assert got[1].sample_rate == 16000
    assert got[1].duration_ms == pytest.approx(2000.0)
    assert not got[2].ok
