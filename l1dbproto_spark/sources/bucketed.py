"""Bucketed-table layout — pre-shuffled storage for repeat-join keys.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Writing the tables BUCKETED on the join key (``bucketBy`` +
``sortBy`` at write time) moves that shuffle to write time, once: every
subsequent join or aggregation on the bucket key reads co-located,
pre-sorted buckets and plans a SortMergeJoin with NO Exchange on the
bucketed side(s) — the physical plan the tests pin. This is the storage
analog of the reference engine's hand-bucketed spatial layout (the APDB
sorts DiaObject by pixelId so region reads hit one partition's files —
`apdb.py`; reference `_executors.py` partitions by pixel for the same
reason) generalized to arbitrary equi-join keys, and the complement of
:mod:`..operators.layout`'s Z-order clustering (Z-order buys scan
PRUNING for range predicates; bucketing buys shuffle ELISION for
equi-joins and aggregations).

Design rules encoded here:

* Bucket count is a layout contract, not a tuning knob — both sides of a
  co-located join must agree on it (Spark joins bucketed tables
  shuffle-free only when bucket counts match or one count divides the
  other). ``write_bucketed`` therefore takes it explicitly and
  ``assert_same_buckets`` makes the contract checkable.
* Always ``sortBy`` the bucket key (plus optional secondary keys): it
  costs one local sort at write time, tightens parquet row-group min/max
  envelopes on the sort columns (scan pruning), and — under
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` with the
  one-file-per-bucket layout this writer produces — removes the per-read
  Sort under SortMergeJoin too. (Current Spark defaults that flag off and
  plans a LOCAL sort per bucket on read; the Exchange elision — the part
  that matters at 100 TB — never depends on it.)
* One-side-bucketed joins still help: only the unbucketed side shuffles.
* Equality predicates on the bucket key prune to ONE bucket at scan time
  (``SelectedBucketsCount`` in the plan) — a hash-layout point-lookup
  path complementing parquet min/max pruning.

Catalog note: bucketing metadata lives in the session catalog
(``saveAsTable``), not in the parquet files — reading the same files with
``spark.read.parquet`` loses it. Local tests use the in-memory catalog
with an explicit ``path`` (external table); a production deployment
points the same calls at its metastore. This is Spark's own contract,
not an engine limitation.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def forced_bucketed_scan(spark: SparkSession):
    """Scope in which bucketed file layout is always honored on read.

    Spark's ``autoBucketedScan`` planner rule silently falls back to a
    plain file scan when it sees no interesting-partitioning consumer —
    which also forfeits bucket PRUNING for point predicates on the bucket
    key. Wrap point-lookup reads in this context to keep the pruned scan
    (``SelectedBucketsCount`` in the plan). Join plans don't need it."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    num_buckets: int,
    sort_extra: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table named ``table``.

    ``key`` — bucket column(s); also the leading sort columns.
    ``sort_extra`` — secondary sort columns after the key.
    ``path`` — external-table location (required with the in-memory
    catalog used in tests; optional under a real metastore).
    """
    if num_buckets < 1:
        raise ValueError("write_bucketed: num_buckets must be >= 1")
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError("write_bucketed: key must be non-empty")
    sort_cols = keys + list(sort_extra or [])
    # one file per bucket: repartition on the bucket key with exactly
    # num_buckets partitions BEFORE the write. Spark's repartition hash and
    # its bucket hash are the same Murmur3, so each write task holds whole
    # buckets and emits one file each. Without this, every write task emits
    # its own file per bucket, and Spark then refuses to trust the per-file
    # sortBy order on read — re-adding the per-read Sort under SMJ that
    # sortBy exists to remove. (At 100 TB pick num_buckets so one bucket
    # fits an executor; the write shuffle is the one-time cost the layout
    # amortizes across every later join.)
    df = df.repartition(num_buckets, *[df[k] for k in keys])
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(sort_cols[0], *sort_cols[1:])
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int] | None:
    """(bucket columns, bucket count) for a catalog table, or None if the
    table is not bucketed. Reads the catalog, not the files."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols: list[str] | None = None
    n: int | None = None
    for r in rows:
        if r.col_name == "Num Buckets":
            n = int(r.data_type)
        elif r.col_name == "Bucket Columns":
            # format: [`col1`, `col2`] — split on the '`, `' BETWEEN
            # backtick-quoted identifiers, not on bare ',', so a column
            # name containing a comma doesn't mis-parse into two
            inner = r.data_type.strip("[]")
            cols = [c.strip().strip("`") for c in inner.split("`, `")]
    if cols is None or n is None:
        return None
    return cols, n


def assert_same_buckets(spark: SparkSession, left: str, right: str) -> int:
    """Check two tables share bucket columns-count contract for a
    shuffle-free join; returns the bucket count. Raises ValueError with
    the mismatch spelled out otherwise."""
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    if ls is None or rs is None:
        missing = [t for t, s in ((left, ls), (right, rs)) if s is None]
        raise ValueError(f"not bucketed: {missing}")
    if ls != rs:
        raise ValueError(
            f"bucket contract mismatch: {left}={ls} vs {right}={rs}"
        )
    return ls[1]
