"""Multimodal-column queries: binary payloads synthesized deterministically
from the documents table (encode(text) — the corpus is pure ASCII, verified:
length(text) == octet_length(encode(text)) for every row, so DuckDB's
character-indexed substr/ord are byte-accurate). That makes even the
mapInPandas feature/chunk paths fully oracle-checkable in SQL: the Spark side
runs the real Arrow-batch Python path a media decoder would use, the oracle
recomputes the same bytes-level features relationally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import byte_histogram_features, chunk_fingerprints
from ..sources.catalog import load_table
from . import query

_N_BINS = 32


def _as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


# Rotated OUT of the driver registry in round 7 (slot to doc_embed_ann —
# the registry is capped at 50; COVERAGE.md "Registry rotation history").
# The DuckDB oracle below stays live in-suite via
# tests/test_unregistered_batteries.py.
BLOB_METADATA_ORACLE = """
    SELECT
      doc_id AS media_id,
      octet_length(encode(text)) AS n_bytes,
      md5(text) AS fingerprint
    FROM documents
    """


def blob_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata without decode: byte length + md5 fingerprint of the payload
    (UTF-8 text bytes — md5(blob) == md5(text) for this encoding on both
    engines)."""
    media = _as_media(spark, sf_dir)
    return media.select(
        "media_id",
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("fingerprint"),
    )


_HIST_COLS = ",\n      ".join(
    f"CAST(COALESCE(SUM(CASE WHEN bin = {k} THEN n END), 0) AS DOUBLE)"
    f" / ANY_VALUE(total) AS f{k}"
    for k in range(_N_BINS)
)


# Rotated out of the 50-cap registry in driver round 8 (slot to q18_large_orders); the
# SAME DuckDB oracle (below, view-name form) runs in-suite in
# tests/test_unregistered_batteries.py and the multimodal family keeps the
# registered media_chunk_fingerprints row.
MEDIA_BYTE_HISTOGRAM_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id AS media_id, text, length(text) AS total FROM documents
    ),
    pos AS (
      SELECT media_id, ord(substr(text, CAST(i AS INT), 1)) // 8 AS bin
      FROM docs, unnest(range(1, total + 1)) AS t(i)
    ),
    agg AS (SELECT media_id, bin, COUNT(*) AS n FROM pos GROUP BY 1, 2)
    SELECT
      d.media_id,
      {_HIST_COLS}
    FROM docs d LEFT JOIN agg a ON a.media_id = d.media_id
    GROUP BY d.media_id
    """


def media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bin normalized byte-histogram features per blob through the Arrow
    mapInPandas batch path (numpy per batch — the exact plumbing a real
    decoder/featurizer uses), projected to one column per bin so the DuckDB
    oracle checks every value bit-for-bit (counts and the count/total double
    division are engine-exact)."""
    feats = byte_histogram_features(_as_media(spark, sf_dir))
    return feats.select(
        "media_id",
        *[F.element_at(F.col("features"), k + 1).alias(f"f{k}") for k in range(_N_BINS)],
    )


# Rotated out of the driver registry in round 12 (slot to
# image_dedup_families — the multimodal family trades its byte-fingerprint
# row for one that exercises the REAL decode -> perceptual-hash -> cluster
# stack). SAME oracle, driver-grade compare in
# tests/test_unregistered_batteries.py.
MEDIA_CHUNK_FINGERPRINTS_ORACLE = """
    WITH docs AS (
      SELECT doc_id AS media_id, text,
             greatest(length(text) // 4, 1) AS step
      FROM documents
    )
    SELECT
      media_id,
      CAST(i AS INT) AS chunk_idx,
      md5(substr(text, CAST(i * step + 1 AS INT), CAST(step AS INT))) AS chunk_hash
    FROM docs, unnest(range(4)) AS t(i)
    """


def media_chunk_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample stand-in: 4 equal byte chunks per blob, md5 per chunk,
    through mapInPandas; the oracle reproduces the identical chunking
    arithmetic (step = max(len//4, 1), remainder bytes dropped) with
    substr/md5 over the ASCII payload."""
    return chunk_fingerprints(_as_media(spark, sf_dir), n_chunks=4)


# ---------------------------------------------------------------------------
# image_dedup_families (driver round 12): the REAL image stack under the
# hard oracle signal — decode (multimodal.decode_media) -> perceptual dhash
# (multimodal.perceptual_hashes) -> Hamming<=3 block-bucketed pairs ->
# connected components -> canonicals (multimodal.image_dedup_clusters),
# over PPM images synthesized so the planted family structure is PROVABLE:
#
#  * each doc_id gets a 9x8 grayscale P6 whose 8x9-grid dhash equals a
#    chosen 64-bit codeword EXACTLY: the image is already at hash-grid
#    resolution (the box resample is the identity there) and each of the
#    64 row-adjacent luma comparisons is built as a +/-24 staircase step,
#    so the +/-4 per-pixel deterministic noise (different BYTES per image)
#    can never flip a comparison;
#  * family f = doc_id % 100 has codeword (f+1) * 0x9E3779B97F4A7C15 mod
#    2^64 (golden-ratio spread — min pairwise Hamming distance 19 across
#    the 100 codewords and NO equal 16-bit block anywhere, both pinned in
#    tests/test_media_query.py, so zero cross-family candidate pairs
#    survive the pigeonhole bucketing);
#  * variant v = (doc_id // 100) % 4 flips the first v of dhash bits
#    {0, 2, 4}: within-family distances are |v_i - v_j| <= 3 (every member
#    pairs with every other under max_bits=3) while cross-family distances
#    stay >= 19 - 3 - 3 = 13 > 3.
#
# The clusters are therefore EXACTLY the doc_id % 100 classes, canonical =
# min id (unscored default), component = min id (connected_components
# contract) — which the oracle predicts from `documents` with one window,
# never decoding a pixel. A wrong decode, hash bit order, bucketing miss,
# or component merge all hash-mismatch.
_IDF_MULT = 0x9E3779B97F4A7C15
_IDF_FAMILIES = 100


def _planted_ppm_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): the deterministic planted-family PPMs."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                code = ((i % _IDF_FAMILIES + 1) * _IDF_MULT) & (2**64 - 1)
                for j in range((i // _IDF_FAMILIES) % 4):
                    code ^= 1 << (2 * j)
                img = np.zeros((8, 9), np.uint8)
                for r in range(8):
                    vals = [0.0]
                    for c in range(8):
                        bit = (code >> (r * 8 + c)) & 1
                        vals.append(vals[-1] - 24 if bit else vals[-1] + 24)
                    row = np.array(vals)
                    row += 8 - row.min()
                    noise = np.array(
                        [((i * (r * 9 + c + 7)) % 9) - 4 for c in range(9)]
                    )
                    img[r] = (row + noise).astype(np.uint8)
                rgb = np.repeat(img[:, :, None], 3, axis=2)
                ids.append(i)
                blobs.append(b"P6 9 8 255\n" + rgb.tobytes())
            yield pd.DataFrame({"media_id": ids, "payload": blobs}).astype(
                {"media_id": "int64"}
            )

    return docs.select("doc_id").mapInPandas(synth, out_schema)


@query(
    "image_dedup_families",
    oracle=f"""
    SELECT doc_id AS media_id,
           MIN(doc_id) OVER w AS component,
           MIN(doc_id) OVER w AS canonical_id,
           doc_id = MIN(doc_id) OVER w AS is_canonical
    FROM documents
    WINDOW w AS (PARTITION BY doc_id % {_IDF_FAMILIES})
    """,
    survey=(
        "ext:multimodal (real image near-dup dedup: decode -> perceptual "
        "dhash -> Hamming block buckets -> connected components -> "
        "canonicals; operators/multimodal.py image_dedup_clusters)"
    ),
)
def image_dedup_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per image: (media_id, component, canonical_id,
    is_canonical) from the full corpus-level image dedup over the
    planted-family PPMs (see the block comment above for why the planted
    structure is exact).

    Scale shape: synthesis and decode ride the scan (two mapInPandas
    passes, zero shuffle); the pair stage is the pigeonhole Hamming
    bucketing (never all-pairs — zero cross-family candidates by
    codeword construction); components converge in O(log diameter)
    rounds on diameter-1 cliques; canonicals are one bounded
    aggregation."""
    from ..operators.multimodal import image_dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    media = _planted_ppm_media(docs)
    return image_dedup_clusters(media)


# ---------------------------------------------------------------------------
# wav_decode_meta (driver round 13): the audio family's REAL RIFF/WAVE
# chunk walk under the hard oracle signal — the r11/r12 pattern
# (csv_ingest_quarantine, image_dedup_families) applied to audio: WAV
# blobs are synthesized from doc_id arithmetic so the oracle predicts
# (ok, sample_rate, n_channels, bits, n_samples, duration_ms) without
# parsing a byte, while the Spark side runs operators/audio.decode_audio
# — the full chunk-walking parser + PCM conversion:
#
#  * doc_id %13==0 rows are not RIFF at all            -> ok=false;
#  * else %19==0 rows carry a WAV with format tag 85 (MP3-in-WAV) — a
#    well-formed container the format-class gate must REJECT -> ok=false;
#  * else the format class cycles by doc_id%5 over PCM 8/16/24/32-bit
#    and IEEE-float 32-bit, rate by (doc_id//5)%4 over four standard
#    rates, channels 1 + doc_id%3, frames 1 + doc_id%97; %11==0 rows
#    additionally carry a junk LIST chunk BEFORE fmt so the walk (not a
#    fixed-offset read) is what the green row proves.
#
# A wrong chunk walk, fmt layout, format-tag acceptance, frame count, or
# the duration division all land as value-hash mismatches.
_WAV_RATES = (8000, 11025, 16000, 44100)


def _wav_blob(i: int) -> bytes:
    """Deterministic planted WAV (see block comment) for doc_id ``i``."""
    import struct

    if i % 13 == 0:
        return b"GARBAGE!" + bytes(16)  # not RIFF
    rate = _WAV_RATES[(i // 5) % 4]
    ch = 1 + i % 3
    frames = 1 + i % 97
    if i % 19 == 0:
        tag, bits = 85, 16  # MPEG-in-WAV tag: rejected by the class gate
    else:
        tag, bits = ((1, 8), (1, 16), (1, 24), (1, 32), (3, 32))[i % 5]
    nbytes = frames * ch * (bits // 8)
    # deterministic sample bytes; CONTENT is irrelevant to the projected
    # metadata, but the buffer must be whole-frame so the decode succeeds
    data = bytes((i * 31 + k * 7) % 256 for k in range(nbytes))
    fmt = struct.pack(
        "<HHIIHH", tag, ch, rate, rate * ch * (bits // 8),
        ch * (bits // 8), bits,
    )
    junk = (
        b"LIST" + struct.pack("<I", 4) + b"INFO" if i % 11 == 0 else b""
    )
    body = (
        junk
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _planted_wav_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): the deterministic planted WAV blobs."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {"media_id": ids, "payload": [_wav_blob(i) for i in ids]}
            ).astype({"media_id": "int64"})

    return docs.select("doc_id").mapInPandas(synth, out_schema)


@query(
    "wav_decode_meta",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             doc_id % 13 = 0 OR doc_id % 19 = 0 AS bad,
             CASE ((doc_id // 5) % 4)
               WHEN 0 THEN 8000 WHEN 1 THEN 11025
               WHEN 2 THEN 16000 ELSE 44100 END AS rate,
             1 + doc_id % 3 AS ch,
             CASE (doc_id % 5)
               WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 24
               ELSE 32 END AS bits,
             1 + doc_id % 97 AS frames
      FROM documents
    )
    SELECT doc_id AS media_id,
           NOT bad AS ok,
           CASE WHEN bad THEN NULL ELSE CAST(rate AS INT) END AS sample_rate,
           CASE WHEN bad THEN NULL ELSE CAST(ch AS INT) END AS n_channels,
           CASE WHEN bad THEN NULL ELSE CAST(bits AS INT) END AS bits,
           CASE WHEN bad THEN NULL ELSE CAST(frames AS BIGINT) END
             AS n_samples,
           CASE WHEN bad THEN NULL
                ELSE 1000.0 * frames / rate END AS duration_ms
    FROM p
    """,
    survey=(
        "ext:audio (real RIFF/WAVE chunk-walk decode to typed metadata "
        "with per-blob ok=false isolation; operators/audio.py "
        "decode_audio/_decode_wav)"
    ),
)
def wav_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per blob: (media_id, ok, sample_rate, n_channels, bits,
    n_samples, duration_ms) from the REAL WAV decode over the planted
    fixture (block comment above) — non-RIFF garbage and the rejected
    MPEG format tag each cost exactly one ok=false row, never a task
    retry.

    Scale shape: synthesis and decode ride the scan (two mapInPandas
    passes — the sanctioned Arrow extension class), zero shuffle; the
    PCM buffer never leaves the decode task (the projection drops it
    before anything crosses)."""
    from ..operators.audio import decode_audio

    docs = load_table(spark, sf_dir, "documents")
    media = _planted_wav_media(docs)
    return decode_audio(media).select(
        "media_id",
        "ok",
        "sample_rate",
        "n_channels",
        "bits",
        "n_samples",
        "duration_ms",
    )


# ---------------------------------------------------------------------------
# avi_video_meta (r14 promotion candidate — declared in COVERAGE.md; NOT
# yet registered, the 50-cap registry is full): the wav_decode_meta
# pattern applied to the video family — planted RIFF/AVI containers whose
# header metadata the oracle predicts from doc_id arithmetic while the
# Spark side runs the REAL nested-LIST chunk walk
# (operators/video.py parse_avi/video_meta):
#
#  * doc_id %13==0 rows are not RIFF at all          -> ok=false;
#  * else %19==0 rows are RIFF but form 'WAVE'       -> ok=false;
#  * else geometry 16+8*(i%5) x 16+8*(i%3), frame cadence from four
#    standard us_per_frame values by (i//3)%4, 1 + i%7 video chunks
#    (declared == actual), a second (audio) stream on i%4==0, and a
#    top-level JUNK chunk BEFORE hdrl on i%11==0 so the walk (not a
#    fixed offset) is what a green row would prove.
_AVI_USF = (10000, 20000, 40000, 66733)


def _avi_blob(i: int) -> bytes:
    """Deterministic planted AVI (see block comment) for doc_id ``i``.
    All chunk bodies are even-length, so the word-alignment walk never
    needs pad bytes."""
    import struct

    if i % 13 == 0:
        return b"nota riff at all"
    if i % 19 == 0:
        return b"RIFF" + struct.pack("<I", 4) + b"WAVE"

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    w = 16 + 8 * (i % 5)
    h = 16 + 8 * (i % 3)
    usf = _AVI_USF[(i // 3) % 4]
    frames = 1 + i % 7
    has_audio = i % 4 == 0
    avih = struct.pack(
        "<10I", usf, 1_000_000, 0, 0x10, frames, 0,
        2 if has_audio else 1, 0, w, h,
    )
    hdr_body = chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", b"vids" + b"MJPG" + b"\x00" * 48)
    )
    if has_audio:
        hdr_body += lst(b"strl", chunk(b"strh", b"auds" + b"\x00" * 52))
    movi_body = b"".join(
        chunk(b"00dc", bytes(((i + j) % 256, 1, 2, 3)))
        for j in range(frames)
    )
    if has_audio:
        movi_body += chunk(b"01wb", b"\x00\x01")
    junk = chunk(b"JUNK", b"\x00" * 4) if i % 11 == 0 else b""
    body = b"AVI " + junk + lst(b"hdrl", hdr_body) + lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _planted_avi_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload): the deterministic planted AVI blobs."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {"media_id": ids, "payload": [_avi_blob(i) for i in ids]}
            ).astype({"media_id": "int64"})

    return docs.select("doc_id").mapInPandas(synth, out_schema)


AVI_VIDEO_META_ORACLE = """
    WITH p AS (
      SELECT doc_id,
             doc_id % 13 = 0 OR doc_id % 19 = 0 AS bad,
             16 + 8 * (doc_id % 5) AS w,
             16 + 8 * (doc_id % 3) AS h,
             CASE ((doc_id // 3) % 4)
               WHEN 0 THEN 10000 WHEN 1 THEN 20000
               WHEN 2 THEN 40000 ELSE 66733 END AS usf,
             1 + doc_id % 7 AS frames,
             CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 1 END AS nstreams
      FROM documents
    )
    SELECT doc_id AS media_id,
           NOT bad AS ok,
           CASE WHEN bad THEN NULL ELSE CAST(w AS INT) END AS width,
           CASE WHEN bad THEN NULL ELSE CAST(h AS INT) END AS height,
           CASE WHEN bad THEN NULL ELSE 1e6 / usf END AS fps,
           CASE WHEN bad THEN NULL ELSE CAST(frames AS INT) END
             AS declared_frames,
           CASE WHEN bad THEN NULL ELSE CAST(nstreams AS INT) END
             AS n_streams,
           CASE WHEN bad THEN NULL ELSE 'MJPG' END AS video_fourcc,
           CASE WHEN bad THEN NULL ELSE CAST(frames AS INT) END
             AS n_video_chunks
    FROM p
    """


@query(
    "avi_video_meta",
    oracle=AVI_VIDEO_META_ORACLE,
    survey="ext:multimodal (real RIFF/AVI nested-LIST chunk walk on planted "
    "containers; operators/video.py — promoted r14 per the staged queue)",
)
def avi_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per blob through the REAL AVI chunk walk: (media_id, ok,
    width, height, fps, declared_frames, n_streams, video_fourcc,
    n_video_chunks) — non-RIFF garbage and the wrong-form RIFF each cost
    one ok=false row. Scale shape identical to wav_decode_meta: two
    mapInPandas passes riding the scan, zero shuffle."""
    from ..operators.video import video_meta

    docs = load_table(spark, sf_dir, "documents")
    return video_meta(_planted_avi_media(docs))


# ---------------------------------------------------------------------------
# WebDataset shard verification (r15 promotion candidate, staged in
# COVERAGE.md) — driver-grade oracle runs in-suite in
# tests/test_unregistered_batteries.py until a registry slot opens.
#
# The builder packs the documents table into REAL tar shards through
# sources/webdataset.py write_webdataset (deterministic bytes: sorted
# keys, mtime 0), plants two damage modes (trailing-junk append on shard
# 2 — content still parses, CRC stale; whole-file delete on shard 5),
# then reads the directory back through read_webdataset and checks it
# with verify_webdataset_shards. The oracle NEVER touches the fixture:
# shard placement is doc_id % 8 (the shard_col override), each sample is
# exactly {txt: text bytes, json: '{"id":<doc_id>}'}, so per-shard sample
# counts, member counts, and payload bytes are count arithmetic over
# documents, and the two verify verdicts follow from the planted damage.
WEBDATASET_SHARD_VERIFY_ORACLE = """
    WITH s AS (
      SELECT CAST(doc_id % 8 AS INT) AS shard,
             octet_length(encode(text))
               + 7 + length(CAST(doc_id AS VARCHAR)) AS sample_bytes
      FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_samples,
           CAST(CASE WHEN shard = 5 THEN 0 ELSE COUNT(*) END
                AS BIGINT) AS n_read,
           CAST(CASE WHEN shard = 5 THEN 0 ELSE 2 * COUNT(*) END
                AS BIGINT) AS n_members,
           CAST(CASE WHEN shard = 5 THEN 0 ELSE SUM(sample_bytes) END
                AS BIGINT) AS payload_bytes,
           shard NOT IN (2, 5) AS crc_ok
    FROM s GROUP BY shard
    """


def _planted_shard_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write the documents table as 8 WebDataset tar shards (placement
    doc_id % 8 via the shard_col override) under a deterministic temp
    root, then plant the two damage modes. Re-runs rebuild from scratch
    (rmtree first) so prior damage never compounds."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..sources.webdataset import write_webdataset

    path = os.path.join(
        tempfile.gettempdir(),
        "l1db_wds_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(path, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    samples = docs.select(
        F.format_string("%09d", "doc_id").alias("key"),
        F.create_map(
            F.lit("txt"),
            F.encode(F.col("text"), "UTF-8"),
            F.lit("json"),
            F.encode(F.format_string('{"id":%d}', "doc_id"), "UTF-8"),
        ).alias("members"),
        (F.col("doc_id") % 8).cast("int").alias("shard"),
    )
    write_webdataset(samples, path, n_shards=8, shard_col="shard")
    # damage mode 1: trailing junk after the end-of-archive marker —
    # tarfile still parses every member, but size and CRC diverge from
    # the manifest (the copy-went-subtly-wrong case)
    with open(os.path.join(path, "shard-00002.tar"), "ab") as f:
        f.write(b"\x00" * 512)
    # damage mode 2: the shard is gone entirely (the lost-file case)
    os.remove(os.path.join(path, "shard-00005.tar"))
    return path


def webdataset_shard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard integrity report of a damaged WebDataset directory:
    (shard, n_samples [manifest], n_read / n_members / payload_bytes
    [re-read through the tar parser], crc_ok [manifest CRC-32 + size
    check]). Junk-appended shard 2 re-reads fully but fails crc_ok;
    deleted shard 5 reads as zero AND fails crc_ok — the report separates
    "stale copy" from "lost shard".

    Scale shape: the writer is ONE exchange (shard assignment) + one tar
    per task with executor-local writes; the re-read is a zero-shuffle
    binaryFile scan through Arrow mapInPandas; verification is a second
    scan with JVM-side crc32() folded per file; the report joins three
    8-row frames. Nothing driver-side but the final 8 rows."""
    from ..sources.webdataset import read_webdataset, verify_webdataset_shards

    path = _planted_shard_dir(spark, sf_dir)
    rd = read_webdataset(spark, path)
    counts = (
        rd.filter(F.col("ok"))
        .select(
            F.regexp_extract(F.col("shard"), r"shard-(\d+)\.tar", 1)
            .cast("int")
            .alias("shard"),
            "n_members",
            "n_bytes",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_read"),
            F.sum("n_members").cast("long").alias("n_members"),
            F.sum("n_bytes").alias("payload_bytes"),
        )
    )
    verdicts = verify_webdataset_shards(spark, path).select(
        "shard", F.col("ok").alias("crc_ok")
    )
    manifest = (
        spark.read.option("header", True)
        .csv(path + "/_manifest")
        .select(
            F.col("shard").cast("int").alias("shard"),
            F.col("n_samples").cast("long").alias("n_samples"),
        )
    )
    return (
        manifest.join(counts, "shard", "left")
        .join(verdicts, "shard", "left")
        .select(
            "shard",
            "n_samples",
            F.coalesce("n_read", F.lit(0).cast("long")).alias("n_read"),
            F.coalesce("n_members", F.lit(0).cast("long")).alias("n_members"),
            F.coalesce("payload_bytes", F.lit(0).cast("long")).alias(
                "payload_bytes"
            ),
            F.coalesce("crc_ok", F.lit(False)).alias("crc_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Image quality-gate signals under a driver-grade oracle (r14) — the one
# image-family operator that was pytest-only (VERDICT r13 "What's
# missing" 2). The fixture plants TWO-BAND 9x8 P6 images (left block of
# c = 3 + doc_id % 4 columns in color A, the rest in color B, both
# colors doc_id arithmetic; doc_id % 13 == 0 rows are non-image garbage)
# because a column-constant two-band image makes every signal CLOSED
# FORM: luma mean/std are two-point mixtures, the 4-neighbor Laplacian
# is nonzero only in the two boundary columns (variance exactly
# 2·(lumaA−lumaB)²/7 on the 7x6 interior), and Hasler–Süsstrunk
# colorfulness reduces to the same two-point algebra on the rg/yb
# opponent axes. The Spark side runs the REAL stack — PPM bytes ->
# decode_media -> image_quality_signals (numpy over Arrow batches) —
# while the oracle never decodes a pixel; both engines project the
# signals rounded (6/6/4/5 dp) far above the numpy-pairwise-vs-closed-
# form ulp noise (~1e-10 worst).
IMAGE_QUALITY_GATE_ORACLE = """
    WITH base AS (
      SELECT doc_id AS media_id,
             doc_id % 13 = 0 AS garbage,
             3 + doc_id % 4 AS c,
             40 + (doc_id % 5) * 30 AS ra,
             60 + (doc_id % 7) * 20 AS ga,
             50 + (doc_id % 3) * 40 AS ba,
             200 - (doc_id % 5) * 25 AS rb,
             30 + (doc_id % 6) * 30 AS gb,
             220 - (doc_id % 4) * 35 AS bb
      FROM documents
    ),
    m AS (
      SELECT media_id, garbage,
             (c * 8) / 72.0 AS pa, ((9 - c) * 8) / 72.0 AS pb,
             ((0.299 * ra + 0.587 * ga) + 0.114 * ba) AS la,
             ((0.299 * rb + 0.587 * gb) + 0.114 * bb) AS lb,
             CAST(ra - ga AS DOUBLE) AS rga,
             CAST(rb - gb AS DOUBLE) AS rgb2,
             0.5 * (ra + ga) - ba AS yba,
             0.5 * (rb + gb) - bb AS ybb
      FROM base
    )
    SELECT media_id,
           NOT garbage AS ok,
           CASE WHEN garbage THEN NULL ELSE
             round((pa * la + pb * lb) / 255.0, 6) END AS brightness,
           CASE WHEN garbage THEN NULL ELSE
             round(sqrt(pa * pb) * abs(la - lb) / 255.0, 6) END AS contrast,
           CASE WHEN garbage THEN NULL ELSE
             round((la - lb) * (la - lb), 4) END AS luma_step_sq,
           CASE WHEN garbage THEN NULL ELSE
             round(sqrt(pa * pb * ((rga - rgb2) * (rga - rgb2)
                                   + (yba - ybb) * (yba - ybb)))
                   + 0.3 * sqrt((pa * rga + pb * rgb2) * (pa * rga + pb * rgb2)
                                + (pa * yba + pb * ybb) * (pa * yba + pb * ybb)),
                   5) END AS colorfulness
    FROM m
    """


def _planted_band_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload) — two-band 9x8 P6 blobs from doc_id
    arithmetic (see IMAGE_QUALITY_GATE_ORACLE); doc_id % 13 == 0 rows
    carry non-image garbage."""
    import pandas as pd

    def synth(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 13 == 0:
                    payloads.append(b"not an image at all")
                    continue
                c = 3 + d % 4
                a = bytes(
                    (40 + (d % 5) * 30, 60 + (d % 7) * 20, 50 + (d % 3) * 40)
                )
                b = bytes(
                    (200 - (d % 5) * 25, 30 + (d % 6) * 30, 220 - (d % 4) * 35)
                )
                row = a * c + b * (9 - c)
                payloads.append(b"P6\n9 8\n255\n" + row * 8)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary"
    )


def image_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real decode -> quality signals over the planted two-band images:
    (media_id, ok, brightness, contrast, luma_step_sq, colorfulness),
    rounded 6/6/4/5 dp (luma_step_sq = sharpness x 7/2 = the squared
    band luma step — see the boundary-proofing note below). Garbage rows surface as ok=false with NULL
    signals, never a failed task.

    Scale shape: two Arrow mapInPandas passes riding the scan (the
    sanctioned multimodal path), zero shuffle."""
    from ..operators.multimodal import decode_media, image_quality_signals

    docs = load_table(spark, sf_dir, "documents")
    sig = image_quality_signals(decode_media(_planted_band_media(docs)))
    return sig.select(
        "media_id",
        "ok",
        F.round("brightness", 6).alias("brightness"),
        F.round("contrast", 6).alias("contrast"),
        # x 3.5: the raw Laplacian variance is 2*d^2/7 on this fixture,
        # whose exact decimal value often TERMINATES on the 4dp rounding
        # boundary (observed: 17/466 rows), letting 1e-12 numeric noise
        # pick the side. d^2 itself cannot sit on a half-boundary
        # (d = k/1000 -> needs k^2 = 50 mod 100, impossible: squares are
        # never 2 mod 4), so the projection is boundary-proof.
        F.round(F.col("sharpness") * 3.5, 4).alias("luma_step_sq"),
        F.round("colorfulness", 5).alias("colorfulness"),
    )
