"""Audio column operators — the audio leg of the multimodal family
(operators/multimodal.py owns images and video frame sampling).

``decode_audio`` is a REAL decoder with no external dependency: a
pure-numpy RIFF/WAVE PCM parser (8/16/24/32-bit integer and 32-bit
float, any channel count) that emits typed metadata plus the mono
float32 PCM buffer, mirroring ``decode_media``'s (ok, ..., pixels)
contract — one corrupt member costs one ``ok=false`` row, never a stage
retry. Compressed containers (MP3/OGG/FLAC) have no in-sandbox decoder;
they emit ``ok=false`` like every format the active decoder lacks —
but FLAC gets HEADER-level coverage: :func:`flac_meta` parses the
mandatory STREAMINFO block (pure public-spec bit layout), so
``probe_media`` classifies 'fLaC' blobs with rate/channels/duration
without decoding a frame.

``audio_features`` is the speech-pipeline quality gate: framed RMS
energy, silence ratio, clipping ratio, zero-crossing rate, peak and
loudness — the columns a data curator filters on before transcription
(silence-only uploads, clipped recordings, wrong-rate resamples).

Both are sanctioned Arrow ``mapInPandas`` exceptions (same class as the
image decoders: byte-level semantics genuinely inexpressible in
``pyspark.sql.functions``). Scale shape: both ride the media scan with
zero shuffle; payloads dominate partition size, so size
``spark.sql.files.maxPartitionBytes`` for O(100) blobs per task and
shuffle fingerprints, never waveforms (see multimodal.py header).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _decode_wav(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """RIFF/WAVE PCM: (sample_rate, n_channels, bits, mono float32 in
    [-1, 1]). Chunk-walking parser (fmt may be preceded/followed by
    LIST/fact/etc.); PCM (format 1), IEEE float (format 3), and
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping either are accepted.
    Raises ValueError on anything else — the caller maps that to one
    ok=false row."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = int(np.frombuffer(blob, "<u4", 1, pos + 4)[0])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format = int(np.frombuffer(fmt, "<u2", 1, 0)[0])
    n_channels = int(np.frombuffer(fmt, "<u2", 1, 2)[0])
    sample_rate = int(np.frombuffer(fmt, "<u4", 1, 4)[0])
    bits = int(np.frombuffer(fmt, "<u2", 1, 14)[0])
    if audio_format == 0xFFFE:
        if len(fmt) < 40:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        audio_format = int(np.frombuffer(fmt, "<u2", 1, 24)[0])
    if n_channels < 1 or sample_rate < 1:
        raise ValueError(f"degenerate WAV ({n_channels} ch, {sample_rate} Hz)")
    if audio_format == 1:  # integer PCM
        if bits == 8:  # 8-bit WAV is unsigned
            x = np.frombuffer(data, "u1").astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            n = len(data) // 3
            b = np.frombuffer(data, "u1", n * 3).reshape(n, 3)
            raw = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            raw = np.where(raw >= 1 << 23, raw - (1 << 24), raw)
            x = raw.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, "<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(data, "<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format tag {audio_format}")
    if len(x) % n_channels:
        # a data chunk cut mid-sample-frame (whole samples, partial frame):
        # reject like the sample-width-ragged case np.frombuffer catches,
        # so wav_meta's whole-frame count is the only lenient reader
        raise ValueError(
            f"data chunk truncated mid-frame: {len(x)} samples over "
            f"{n_channels} channels"
        )
    frames = len(x) // n_channels
    if frames == 0:
        raise ValueError("empty data chunk")
    mono = x.reshape(frames, n_channels).mean(axis=1)
    return sample_rate, n_channels, bits, mono.astype(np.float32)


_DECODE_SCHEMA_TAIL = [
    ("ok", T.BooleanType(), "bool"),
    ("sample_rate", T.IntegerType(), "Int32"),
    ("n_channels", T.IntegerType(), "Int32"),
    ("bits", T.IntegerType(), "Int32"),
    ("n_samples", T.LongType(), "Int64"),
    ("duration_ms", T.DoubleType(), "float64"),
    ("pcm", T.BinaryType(), "object"),
]


def decode_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode WAV payloads to (id, ok, sample_rate, n_channels, bits,
    n_samples, duration_ms, pcm) where ``pcm`` is the channel-averaged
    mono float32 little-endian buffer and ``n_samples`` counts mono
    frames — the exact input :func:`audio_features` consumes.
    Undecodable blobs emit ``ok=false`` with null fields; null payloads
    are skipped, both per the decode_media contract."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType(), False)]
        + [T.StructField(n, t, n != "ok") for n, t, _ in _DECODE_SCHEMA_TAIL]
    )
    cols = [id_col] + [n for n, _, _ in _DECODE_SCHEMA_TAIL]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                if blob is None:
                    continue
                try:
                    sr, ch, bits, mono = _decode_wav(bytes(blob))
                    rows.append(
                        (
                            mid,
                            True,
                            sr,
                            ch,
                            bits,
                            len(mono),
                            1000.0 * len(mono) / sr,
                            mono.tobytes(),
                        )
                    )
                except Exception:
                    rows.append(
                        (mid, False, None, None, None, None, None, None)
                    )
            if not rows:
                yield pd.DataFrame(
                    {id_col: pd.Series([], dtype="int64")}
                    | {
                        n: pd.Series([], dtype=d)
                        for n, _, d in _DECODE_SCHEMA_TAIL
                    }
                )
                continue
            yield pd.DataFrame(rows, columns=cols).astype(
                {id_col: "int64", "ok": "bool"}
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)


def audio_features(
    decoded: DataFrame,
    id_col: str = "media_id",
    win_ms: int = 25,
    hop_ms: int = 10,
    silence_db: float = -40.0,
    clip_level: float = 0.999,
) -> DataFrame:
    """Per-recording quality signals from decoded mono PCM: one row per
    ok decode with (n_windows, rms_db, peak, clipping_ratio,
    silence_ratio, zcr_mean) — framed at ``win_ms``/``hop_ms`` like a
    speech front end. ``silence_ratio`` is the fraction of windows whose
    RMS is below ``silence_db`` dBFS; ``clipping_ratio`` the fraction of
    SAMPLES at or above ``clip_level`` absolute; ``zcr_mean`` the mean
    per-window zero-crossing rate (crossings / window samples — the
    cheap voiced/unvoiced + hiss signal). Recordings shorter than one
    window are a single truncated window. ok=false rows pass through
    with null features so a gate can count undecodables."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("n_windows", T.IntegerType(), True),
            T.StructField("rms_db", T.DoubleType(), True),
            T.StructField("peak", T.DoubleType(), True),
            T.StructField("clipping_ratio", T.DoubleType(), True),
            T.StructField("silence_ratio", T.DoubleType(), True),
            T.StructField("zcr_mean", T.DoubleType(), True),
        ]
    )
    cols = [
        id_col,
        "ok",
        "n_windows",
        "rms_db",
        "peak",
        "clipping_ratio",
        "silence_ratio",
        "zcr_mean",
    ]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, ok, sr, pcm in zip(
                pdf[id_col], pdf["ok"], pdf["sample_rate"], pdf["pcm"]
            ):
                if not ok or pcm is None:
                    rows.append((mid, False, None, None, None, None, None, None))
                    continue
                x = np.frombuffer(bytes(pcm), "<f4")
                win = max(1, int(sr) * win_ms // 1000)
                hop = max(1, int(sr) * hop_ms // 1000)
                # one strided view instead of a Python loop per window —
                # an hour of 16 kHz audio is 360k windows (review find);
                # a sub-window recording is its single truncated window
                view = (
                    np.lib.stride_tricks.sliding_window_view(x, win)[::hop]
                    if len(x) >= win
                    else x[None, :]
                )
                rms = np.sqrt((view**2).mean(axis=1))
                sb = np.signbit(view)
                zcr = (sb[:, 1:] != sb[:, :-1]).sum(axis=1) / view.shape[1]
                floor = 10.0 ** (silence_db / 20.0)
                overall = float(np.sqrt(np.mean(x**2)))
                rows.append(
                    (
                        mid,
                        True,
                        len(rms),
                        20.0 * float(np.log10(max(overall, 1e-10))),
                        float(np.max(np.abs(x))),
                        float(np.mean(np.abs(x) >= clip_level)),
                        float(np.mean(rms < floor)),
                        float(np.mean(zcr)),
                    )
                )
            if not rows:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "ok": pd.Series([], dtype="bool"),
                        "n_windows": pd.Series([], dtype="Int32"),
                        "rms_db": pd.Series([], dtype="float64"),
                        "peak": pd.Series([], dtype="float64"),
                        "clipping_ratio": pd.Series([], dtype="float64"),
                        "silence_ratio": pd.Series([], dtype="float64"),
                        "zcr_mean": pd.Series([], dtype="float64"),
                    }
                )
                continue
            yield pd.DataFrame(rows, columns=cols).astype(
                {id_col: "int64", "ok": "bool"}
            )

    return decoded.select(id_col, "ok", "sample_rate", "pcm").mapInPandas(
        extract, out_schema
    )


def segment_silence(
    decoded: DataFrame,
    id_col: str = "media_id",
    win_ms: int = 25,
    hop_ms: int = 10,
    silence_db: float = -40.0,
    min_silence_ms: int = 300,
    min_segment_ms: int = 200,
) -> DataFrame:
    """Silence-split utterance segmentation (the energy-VAD chunking a
    speech-data pipeline runs before transcription): one row per voiced
    segment — (id, segment_idx, start_ms, end_ms, duration_ms, rms_db)
    — where a segment is a maximal run of frames whose RMS clears
    ``silence_db`` dBFS, runs separated by less than ``min_silence_ms``
    of silence are merged (a mid-word stop is not a boundary), and
    merged runs shorter than ``min_segment_ms`` are dropped (clicks).
    Recordings that never clear the floor emit zero rows; ok=false
    decodes emit zero rows (count them on the decode frame). Fan-out is
    bounded by duration/min_segment_ms; like every operator here it
    rides the scan with zero shuffle."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("segment_idx", T.IntegerType(), False),
            T.StructField("start_ms", T.DoubleType(), False),
            T.StructField("end_ms", T.DoubleType(), False),
            T.StructField("duration_ms", T.DoubleType(), False),
            T.StructField("rms_db", T.DoubleType(), False),
        ]
    )
    cols = [id_col, "segment_idx", "start_ms", "end_ms", "duration_ms", "rms_db"]

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        floor = 10.0 ** (silence_db / 20.0)
        for pdf in batches:
            rows = []
            for mid, ok, sr, pcm in zip(
                pdf[id_col], pdf["ok"], pdf["sample_rate"], pdf["pcm"]
            ):
                if not ok or pcm is None:
                    continue
                x = np.frombuffer(bytes(pcm), "<f4")
                sr = int(sr)
                win = max(1, sr * win_ms // 1000)
                hop = max(1, sr * hop_ms // 1000)
                starts = np.arange(0, max(1, len(x) - win + 1), hop)
                # strided view, not a per-window Python loop (see
                # audio_features — same review find)
                view = (
                    np.lib.stride_tricks.sliding_window_view(x, win)[::hop]
                    if len(x) >= win
                    else x[None, :]
                )
                rms = np.sqrt((view**2).mean(axis=1))
                voiced = rms >= floor
                if not voiced.any():
                    continue
                # frame index -> ms; a frame covers [s, s+win)
                runs: list[list[int]] = []  # [first_frame, last_frame]
                for i in np.flatnonzero(voiced):
                    if runs and (i - runs[-1][1]) * hop_ms < min_silence_ms:
                        runs[-1][1] = i
                    else:
                        runs.append([i, i])
                idx = 0
                for first, last in runs:
                    s_ms = 1000.0 * starts[first] / sr
                    e_ms = 1000.0 * min(starts[last] + win, len(x)) / sr
                    if e_ms - s_ms < min_segment_ms:
                        continue
                    seg = x[starts[first] : starts[last] + win]
                    level = float(np.sqrt(np.mean(seg**2)))
                    rows.append(
                        (
                            mid,
                            idx,
                            s_ms,
                            e_ms,
                            e_ms - s_ms,
                            20.0 * float(np.log10(max(level, 1e-10))),
                        )
                    )
                    idx += 1
            if not rows:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "segment_idx": pd.Series([], dtype="Int32"),
                        "start_ms": pd.Series([], dtype="float64"),
                        "end_ms": pd.Series([], dtype="float64"),
                        "duration_ms": pd.Series([], dtype="float64"),
                        "rms_db": pd.Series([], dtype="float64"),
                    }
                )
                continue
            yield pd.DataFrame(rows, columns=cols).astype({id_col: "int64"})

    return decoded.select(id_col, "ok", "sample_rate", "pcm").mapInPandas(
        segment, out_schema
    )


def spectrogram_hash(
    decoded: DataFrame,
    id_col: str = "media_id",
    grid: int = 8,
    n_fft: int = 256,
) -> DataFrame:
    """Perceptual audio fingerprint: the aHash of the log-power
    spectrogram — frames of ``n_fft`` samples (half-overlap, Hann
    window) -> rfft power -> log -> box-resampled to a grid x grid
    time-frequency energy image (the image family's ``_box_resize_gray``,
    deliberately shared) -> bit = cell >= mean -> 64-bit long.

    Loudness-invariant (a global gain shifts every log cell equally and
    the mean comparison cancels it) and robust to mild noise; two
    renditions of the same clip land within a few bits while different
    content is ~32 bits apart, so ``dedup.simhash_near_dup_pairs(...,
    bits=64)`` gives sub-quadratic audio near-dup exactly like text
    SimHash and image aHash/dHash. Emits (id, ok, spec_hash) with
    ok=false passthrough; recordings shorter than one FFT frame are
    zero-padded to one."""
    from .multimodal import _box_resize_gray, _pack_bits_i64

    if grid * grid > 64:
        raise ValueError(f"grid {grid} overflows the 64-bit hash")
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("spec_hash", T.LongType(), True),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hann = np.hanning(n_fft)
        hop = n_fft // 2
        for pdf in batches:
            rows = []
            for mid, ok, pcm in zip(pdf[id_col], pdf["ok"], pdf["pcm"]):
                if not ok or pcm is None:
                    rows.append((mid, False, None))
                    continue
                x = np.frombuffer(bytes(pcm), "<f4").astype(np.float64)
                if len(x) < n_fft:
                    x = np.pad(x, (0, n_fft - len(x)))
                frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[
                    ::hop
                ]
                power = np.abs(np.fft.rfft(frames * hann, axis=1)) ** 2
                # drop DC; clamp to a 40 dB dynamic range RELATIVE to the
                # recording's own peak before the log: near-silent cells
                # saturate at the same floor with or without a mild noise
                # floor (an absolute epsilon made them wildly
                # noise-sensitive), and a pure gain scales peak and floor
                # together so invariance stays exact
                p = power[:, 1:]
                peak = max(float(p.max()), 1e-300)
                spec = np.log10(np.maximum(p, peak * 1e-4))
                cell = _box_resize_gray(spec, grid, grid)
                rows.append((mid, True, _pack_bits_i64(cell >= cell.mean())))
            if not rows:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "ok": pd.Series([], dtype="bool"),
                        "spec_hash": pd.Series([], dtype="Int64"),
                    }
                )
                continue
            yield pd.DataFrame(
                rows, columns=[id_col, "ok", "spec_hash"]
            ).astype({id_col: "int64", "ok": "bool"})

    return decoded.select(id_col, "ok", "pcm").mapInPandas(extract, out_schema)


def wav_meta(blob: bytes) -> tuple[int, int, int, int]:
    """Header-only WAV metadata: (sample_rate, n_channels, bits,
    n_frames) from the fmt chunk and the DATA CHUNK SIZE — no sample is
    converted, so a probe over petabytes of audio pays header bytes, not
    decode (operators/multimodal.probe_media uses this). Same chunk walk
    and format-class acceptance as :func:`_decode_wav` (a data chunk
    truncated mid-sample-frame counts whole frames here where the full
    decoder rejects the ragged buffer); raises ValueError on every
    format class that decoder rejects."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = int(np.frombuffer(blob, "<u4", 1, pos + 4)[0])
        if cid == b"fmt " and pos + 8 + 16 <= len(blob):
            fmt = blob[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data_len = min(size, len(blob) - pos - 8)
        pos += 8 + size + (size & 1)
        if fmt is not None and data_len is not None:
            break
    if fmt is None or data_len is None:
        raise ValueError("missing fmt or data chunk")
    audio_format = int(np.frombuffer(fmt, "<u2", 1, 0)[0])
    n_channels = int(np.frombuffer(fmt, "<u2", 1, 2)[0])
    sample_rate = int(np.frombuffer(fmt, "<u4", 1, 4)[0])
    bits = int(np.frombuffer(fmt, "<u2", 1, 14)[0])
    if audio_format == 0xFFFE:
        if len(fmt) < 40:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        audio_format = int(np.frombuffer(fmt, "<u2", 1, 24)[0])
    if n_channels < 1 or sample_rate < 1:
        raise ValueError(f"degenerate WAV ({n_channels} ch, {sample_rate} Hz)")
    ok_bits = {1: (8, 16, 24, 32), 3: (32, 64)}.get(audio_format)
    if ok_bits is None:
        raise ValueError(f"unsupported WAV format tag {audio_format}")
    if bits not in ok_bits:
        raise ValueError(f"unsupported bit depth {bits}")
    frames = data_len // (n_channels * (bits // 8))
    if frames == 0:
        raise ValueError("empty data chunk")
    return sample_rate, n_channels, bits, frames


def flac_meta(blob: bytes) -> tuple[int, int, int, int]:
    """Header-only FLAC metadata: (sample_rate, n_channels, bits,
    n_frames) from the mandatory STREAMINFO block (public spec: 'fLaC'
    magic, then metadata blocks each headed by 1 byte last+type and a
    24-bit big-endian length; STREAMINFO is ALWAYS first — type 0,
    34 bytes — and packs sample rate (20 bits), channels-1 (3),
    bits-per-sample-1 (5) and total inter-channel samples (36) into the
    8 bytes after the block/frame-size fields). ``n_frames`` is the
    total-samples field; 0 means 'unknown' per spec and is returned
    as-is. No audio frame is touched — the FLAC analogue of
    :func:`wav_meta`, and what probe_media's audio leg dispatches on the
    'fLaC' magic."""
    if len(blob) < 4 or blob[:4] != b"fLaC":
        raise ValueError("not a FLAC file")
    if len(blob) < 8 + 34:
        raise ValueError("truncated FLAC STREAMINFO")
    block_type = blob[4] & 0x7F
    block_len = int.from_bytes(blob[5:8], "big")
    if block_type != 0 or block_len != 34:
        raise ValueError(
            f"first FLAC block must be STREAMINFO(34), got type "
            f"{block_type} len {block_len}"
        )
    packed = int.from_bytes(blob[18:26], "big")
    sample_rate = packed >> 44
    n_channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total_samples = packed & ((1 << 36) - 1)
    if sample_rate == 0:
        raise ValueError("FLAC sample rate 0 is invalid")
    return sample_rate, n_channels, bits, total_samples
