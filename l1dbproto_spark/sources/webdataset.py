"""WebDataset-style tar-shard source/sink — the de-facto container
format for large-scale multimodal training corpora (a shard is a plain
POSIX tar; a SAMPLE is the group of adjacent members sharing a basename
up to the first dot: ``000123.jpg`` + ``000123.txt`` + ``000123.json``).

Read side: ``spark.read.format("binaryFile")`` scans ``*.tar`` (one row
per shard — size shards O(100 MB) so a task holds one comfortably), and
an Arrow ``mapInPandas`` walks each tar with the stdlib parser, grouping
members into samples and emitting ``(shard, key, members: map<ext,
binary>, n_members, n_bytes)``. Grouping is per-tar by the WebDataset
contract (samples never straddle shards), so the whole read is a
zero-shuffle scan; gzip-compressed shards (``.tar.gz``) decode
transparently. A malformed tar costs its own shard only (``ok=false``
row carrying the shard path), never the stage.

Write side: ``write_webdataset`` hash-assigns samples to ``n_shards``,
one exchange, then each task serializes ITS shard group to a real tar
via ``applyInPandas`` and writes it with plain file I/O — executor-local
writes, the same per-task-output shape as a Spark file sink (this
container's local/NFS roots; an object-store root would swap the
``open()`` for its client in ``_write_bytes``). Members are emitted in
sorted key order, so same input -> byte-identical shards. Returns the
(shard, n_samples, n_bytes, crc32) manifest, persisted under
``_manifest`` like the training-shard sink (sources/sinks.py); because
the tar bytes are deterministic, the manifest carries each shard's
CRC-32 and ``verify_webdataset_shards`` gives tar shards the same
damage-detection contract as ``sinks.verify_training_shards`` — run it
after a copy/restore, before a training run.
"""

from __future__ import annotations

import io
import tarfile
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sinks import write_csv

_READ_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField(
            "members", T.MapType(T.StringType(), T.BinaryType()), True
        ),
        T.StructField("n_members", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def _sample_key(name: str) -> tuple[str, str]:
    """WebDataset member naming: key = path up to the FIRST dot in the
    basename (so ``a/b/000123.seg.json`` -> key ``a/b/000123``, ext
    ``seg.json``)."""
    d, _, base = name.rpartition("/")
    stem, _, ext = base.partition(".")
    return (f"{d}/{stem}" if d else stem), ext


def read_webdataset(
    spark: SparkSession, path: str, extensions: list[str] | None = None
) -> DataFrame:
    """One row per sample: (shard, ok, key, members, n_members,
    n_bytes). ``extensions`` prunes members at parse time (the column-
    pruning analogue — ask for ``["txt", "json"]`` and the image bytes
    never cross Arrow). Unreadable shards emit one ok=false row."""
    want = set(extensions) if extensions is not None else None
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar*")
        .load(path)
        .select("path", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for shard, blob in zip(pdf["path"], pdf["content"]):
                try:
                    rows = _parse_tar(bytes(blob), shard, want)
                except Exception:
                    rows = [(shard, False, None, None, None, None)]
                out.extend(rows)
            if not out:
                yield pd.DataFrame(
                    {
                        "shard": pd.Series([], dtype="object"),
                        "ok": pd.Series([], dtype="bool"),
                        "key": pd.Series([], dtype="object"),
                        "members": pd.Series([], dtype="object"),
                        "n_members": pd.Series([], dtype="Int32"),
                        "n_bytes": pd.Series([], dtype="Int64"),
                    }
                )
                continue
            yield pd.DataFrame(
                out,
                columns=["shard", "ok", "key", "members", "n_members", "n_bytes"],
            ).astype({"ok": "bool"})

    return blobs.mapInPandas(parse, _READ_SCHEMA)


def _parse_tar(blob: bytes, shard: str, want: set[str] | None) -> list[tuple]:
    rows: list[tuple] = []
    cur_key: str | None = None
    cur: dict[str, bytes] = {}
    cur_total = 0  # ALL member bytes of the sample, pre-pruning

    def flush() -> None:
        if cur_key is not None:
            rows.append((shard, True, cur_key, dict(cur), len(cur), cur_total))

    # r:* transparently handles plain and gzip tars
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
        for member in tf:
            if not member.isfile():
                continue
            key, ext = _sample_key(member.name)
            if key != cur_key:
                flush()
                cur_key, cur, cur_total = key, {}, 0
            cur_total += member.size
            if want is None or ext in want:
                cur[ext] = tf.extractfile(member).read()
    flush()
    return rows


def _write_bytes(path: str, data: bytes) -> None:
    """Executor-local file write. Object-store roots would swap in the
    store's client here; the Spark-side shape (one file per task, no
    driver involvement) is already the scalable one."""
    with open(path, "wb") as f:
        f.write(data)


def write_webdataset(
    samples: DataFrame,
    path: str,
    n_shards: int = 16,
    key_col: str = "key",
    members_col: str = "members",
    shard_col: str | None = None,
) -> DataFrame:
    """Pack (key, members: map<ext, binary>) rows into ``n_shards`` real
    tar shards under ``path`` (``shard-%05d.tar``), samples
    hash-assigned by xxhash64(key) — ONE exchange — and written in sorted key
    order so same input gives byte-identical shards (tar mtimes pinned
    to 0). Returns and persists the (shard, n_samples, n_bytes, crc32)
    manifest — crc32 is the shard's tar-byte CRC-32, the damage-detection
    handle :func:`verify_webdataset_shards` checks. Duplicate keys raise
    inside the task: two samples with one name would silently shadow each
    other at training time.

    ``shard_col`` overrides the hash assignment with a caller-provided
    int column in ``[0, n_shards)`` — the curriculum/placement hook
    (e.g. length-sorted shards, domain-pure shards, or an
    arithmetically-predictable layout for verification). Out-of-range
    values raise rather than minting phantom shard files."""
    import os

    os.makedirs(path, exist_ok=True)
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("crc32", T.LongType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {
                    "shard": pd.Series([], dtype="int32"),
                    "n_samples": pd.Series([], dtype="int64"),
                    "n_bytes": pd.Series([], dtype="int64"),
                    "crc32": pd.Series([], dtype="int64"),
                }
            )
        shard = int(pdf["_shard"].iloc[0])
        if not (0 <= shard < n_shards):
            raise ValueError(
                f"shard id {shard} outside [0, {n_shards}) — bad {shard_col!r}"
            )
        pdf = pdf.sort_values(key_col)
        if pdf[key_col].duplicated().any():
            dup = pdf[key_col][pdf[key_col].duplicated()].iloc[0]
            raise ValueError(f"duplicate sample key {dup!r} in shard {shard}")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for key, members in zip(pdf[key_col], pdf[members_col]):
                for ext in sorted(members):
                    data = bytes(members[ext])
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(data))
        data = buf.getvalue()
        _write_bytes(f"{path}/shard-{shard:05d}.tar", data)
        # tar bytes are deterministic (sorted keys, mtime 0), so the
        # shard's CRC-32 is a stable content fingerprint — zlib and
        # Spark's crc32() share the IEEE polynomial, which is what lets
        # verify_webdataset_shards recompute it JVM-side from a scan
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(pdf)],
                "n_bytes": [len(data)],
                "crc32": [zlib.crc32(data)],
            }
        )

    if shard_col is None:
        # pmod, not abs()%: abs(Long.MIN_VALUE) is still negative in JVM
        # semantics and would mint a negative shard id
        assignment = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    else:
        assignment = F.col(shard_col)
    assigned = samples.select(
        F.col(key_col),
        F.col(members_col),
        assignment.cast("int").alias("_shard"),
    )
    manifest = assigned.groupBy("_shard").applyInPandas(pack, out_schema)
    # localCheckpoint, NOT cache: it materializes eagerly (so the tar
    # writes are not lazily re-run) AND breaks lineage without touching
    # the CacheManager — a cached manifest would be matched by its
    # CANONICALIZED plan, so a later rebuild over the same inputs would
    # silently read the old manifest from cache and never execute pack,
    # leaving the freshly-cleared directory without shard files (found
    # by the bench warm-rep double-build)
    manifest = manifest.localCheckpoint()
    write_csv(manifest.coalesce(1), path + "/_manifest")
    return manifest


def verify_webdataset_shards(spark: SparkSession, path: str) -> DataFrame:
    """Integrity check of a WebDataset shard directory against its own
    ``_manifest``: (shard, n_bytes, manifest_n_bytes, crc32,
    manifest_crc32, ok), one row per shard present on EITHER side — a
    shard missing from disk or from the manifest surfaces with NULLs and
    ok=false, never silently. The recompute is one binaryFile scan with
    the JVM-side ``crc32()`` over the tar bytes (same IEEE polynomial the
    writer's zlib.crc32 used), so verification costs a read-through, no
    Python. Mirrors ``sinks.verify_training_shards`` for the tar
    container."""
    actual = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(path.rstrip("/"))
        .select(
            F.regexp_extract(F.col("path"), r"shard-(\d{5})\.tar$", 1)
            .cast("int")
            .alias("shard"),
            F.length(F.col("content")).cast("long").alias("n_bytes"),
            F.crc32(F.col("content")).alias("crc32"),
        )
    )
    manifest = (
        spark.read.option("header", True)
        .csv(path.rstrip("/") + "/_manifest")
        .select(
            F.col("shard").cast("int").alias("shard"),
            F.col("n_bytes").cast("long").alias("manifest_n_bytes"),
            F.col("crc32").cast("long").alias("manifest_crc32"),
        )
    )
    return actual.join(manifest, "shard", "full_outer").select(
        "shard",
        "n_bytes",
        "manifest_n_bytes",
        "crc32",
        "manifest_crc32",
        (
            F.col("n_bytes").eqNullSafe(F.col("manifest_n_bytes"))
            & F.col("crc32").eqNullSafe(F.col("manifest_crc32"))
        ).alias("ok"),
    )
