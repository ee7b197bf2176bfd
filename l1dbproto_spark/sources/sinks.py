"""Sinks: per-visit CSV report (S10) and InfluxDB line protocol (S11).

Reference: CSV with header written once (``log2csv.py:206-217``); influx
line protocol ``measurement,tag=v field=v ts`` per visit
(``log2influx.py:306-320``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (S10). At scale: one file per partition; callers
    coalesce(1) only for small reports."""
    df.write.mode(mode).option("header", True).csv(path)


def influx_line_expr(
    measurement: str,
    tag_cols: list[str],
    field_cols: list[str],
    ts_col: str,
) -> Column:
    """Build an influx line-protocol string column:
    ``measurement,tag=v,... field=v,... <ns-epoch>`` (``log2influx.py:306-319``)."""
    tags = [F.concat(F.lit(f",{t}="), F.col(t).cast("string")) for t in tag_cols]
    fields = [
        F.concat(F.lit(f"{f}=" if i == 0 else f",{f}="), F.col(f).cast("string"))
        for i, f in enumerate(field_cols)
    ]
    ns = (F.unix_micros(F.col(ts_col)) * 1000).cast("string")
    return F.concat(
        F.lit(measurement), *tags, F.lit(" "), *fields, F.lit(" "), ns
    ).alias("line")


def write_influx_lines(
    df: DataFrame,
    path: str,
    measurement: str,
    tag_cols: list[str],
    field_cols: list[str],
    ts_col: str,
) -> None:
    df.select(influx_line_expr(measurement, tag_cols, field_cols, ts_col)).write.mode(
        "overwrite"
    ).text(path)


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 64,
    seed: str = "shuffle-v1",
    id_col: str = "doc_id",
    mode: str = "overwrite",
    count_col: str | None = None,
) -> DataFrame:
    """Training-shard sink — materialize the corpus as ``n_shards``
    hive-partitioned parquet shards (``shard=K/`` directories), each
    internally ordered by the deterministic shuffle key, so a data
    loader that reads shard files top-to-bottom consumes a reproducible
    pseudo-random permutation (operators/sampling.training_order is the
    key assignment; same seed -> identical shard contents and row order,
    pinned row-for-row in tests).

    Returns the manifest (shard, n_rows[, n_tokens]) the loader uses
    for balanced worker assignment — pass ``count_col`` (a per-row token
    count, e.g. BPE counts) to add the per-shard token mass loaders
    actually budget by; the same manifest is written under
    ``<path>/_manifest`` so a reader needs no extra pass.

    Scale shape: ONE hash exchange on the shard column (hash collisions
    may co-locate a few shards on one task — the sort and partitioned
    write still emit one ordered file per shard; raise ``n_shards`` or
    repartition wider if stragglers matter) + an in-task sort by
    (shard, key, id) — the id tie-break keeps the order total even when
    two rows collide in the 48-bit key space (~birthday-expected from
    ~2^24 rows), so same-seed writes are row-for-row identical at any
    size. No global sort; shard count decouples from cluster
    parallelism. The manifest is one aggregation over the written
    frame."""
    from ..operators.sampling import training_order

    sharded = training_order(docs, seed=seed, n_shards=n_shards, id_col=id_col)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
    spark = docs.sparkSession
    written = spark.read.parquet(path)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        _shard_content_sum(written).alias("content_sum"),
    ]
    if count_col is not None:
        aggs.append(F.sum(F.col(count_col)).cast("long").alias("n_tokens"))
    manifest = written.groupBy("shard").agg(*aggs)
    write_csv(manifest.coalesce(1), path + "/_manifest")
    return manifest


def _shard_content_sum(df: DataFrame) -> Column:
    """Order-insensitive per-shard content checksum: sum of crc32 over
    each row's canonical JSON (columns in sorted-name order, shard
    excluded — it is the group key). Detects lost/altered/duplicated
    rows; being a sum, it is independent of file and row order, which is
    what lets :func:`verify_training_shards` recompute it from an
    arbitrarily-parallel scan."""
    cols = sorted(c for c in df.columns if c != "shard")
    return F.sum(
        F.crc32(F.to_json(F.struct(*[F.col(c) for c in cols]))).cast("long")
    )


def verify_training_shards(spark, path: str) -> DataFrame:
    """Integrity check of a training-shard directory against its own
    ``_manifest`` sidecar: (shard, n_rows, manifest_n_rows, content_sum,
    manifest_content_sum, ok) with one row per shard present on either
    side (a shard missing from disk or from the manifest shows up with
    NULLs and ok=false, never silently). Run it after a copy/restore or
    before a long training run; ``ok`` covers row count AND the
    order-insensitive content checksum. One scan of the shards plus the
    tiny manifest read."""
    actual = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _shard_content_sum(spark.read.parquet(path)).alias("content_sum"),
        )
    )
    manifest = (
        spark.read.option("header", True)
        .csv(path.rstrip("/") + "/_manifest")
        .select(
            F.col("shard").cast("int").alias("shard"),
            F.col("n_rows").cast("long").alias("manifest_n_rows"),
            F.col("content_sum").cast("long").alias("manifest_content_sum"),
        )
    )
    return (
        actual.join(manifest, "shard", "full_outer")
        .select(
            "shard",
            "n_rows",
            "manifest_n_rows",
            "content_sum",
            "manifest_content_sum",
            (
                F.col("n_rows").eqNullSafe(F.col("manifest_n_rows"))
                & F.col("content_sum").eqNullSafe(F.col("manifest_content_sum"))
            ).alias("ok"),
        )
    )
