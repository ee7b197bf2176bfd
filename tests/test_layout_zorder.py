"""Z-order layout clustering: key formula vs the DuckDB oracle (single SQL
source of truth), multiset preservation, and the actual data-skipping claim —
measured from parquet footer min/max stats, not assumed."""

from __future__ import annotations

import glob

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.operators.layout import (
    cluster_by_zorder,
    normalize_to_bits,
    zorder_key,
    zorder_key_sql,
)
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_zorder_key_matches_duckdb_oracle(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    got = {
        r.l_orderkey: r.z
        for r in li.groupBy("l_orderkey")
        .agg(F.max(zorder_key([F.col("l_partkey"), F.col("l_suppkey")])).alias("z"))
        .collect()
    }
    sql = zorder_key_sql(["l_partkey", "l_suppkey"])
    want = {
        k: z
        for k, z in duckdb.sql(
            f"SELECT l_orderkey, max({sql}) FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1"
        ).fetchall()
    }
    assert got == want


def test_zorder_key_interleaves():
    # bit j of col i lands at j*n+i: (x=0b11, y=0b01) -> z = 0b0111
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    df = spark.createDataFrame([(3, 1)], "x LONG, y LONG")
    z = df.select(zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")).first().z
    assert z == 0b0111


def test_normalize_to_bits_clamps_and_scales(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], ["v"])
    out = [
        r.n
        for r in df.select(normalize_to_bits(F.col("v"), 0.0, 100.0, bits=8).alias("n"))
        .collect()
    ]
    assert out[0] == 0 and out[1] == 0  # clamped low / lo bound
    assert out[2] == 127  # midpoint -> ~255/2
    assert out[3] == 255 and out[4] == 255  # hi bound / clamped high
    with pytest.raises(ValueError):
        normalize_to_bits(F.col("v"), 1.0, 1.0)


def test_cluster_preserves_multiset(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem")
    key = zorder_key([F.col("l_partkey"), F.col("l_suppkey")])
    out = str(tmp_path / "z")
    cluster_by_zorder(li, key, 8).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    a = li.groupBy("l_orderkey", "l_linenumber").count()
    b = back.groupBy("l_orderkey", "l_linenumber").count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert "__zkey" not in back.columns


def _files_overlapping(path: str, predicates: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(files whose min/max envelope intersects ALL predicate ranges, total).

    Reads parquet footers only — this is exactly the information a scan's
    row-group pruning uses."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        overlaps = True
        for col, (lo, hi) in predicates.items():
            cmins, cmaxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        cmins.append(c.statistics.min)
                        cmaxs.append(c.statistics.max)
            if cmins and (max(cmaxs) < lo or min(cmins) > hi):
                overlaps = False
                break
        hit += overlaps
    return hit, len(files)


def test_zorder_skips_more_files_than_linear_sort(spark, tmp_path):
    """The point of the operator: a conjunctive 2-D range predicate prunes
    MORE files under Z-order than under a single-column sort. Measured from
    the actual parquet min/max footers at equal file counts."""
    li = load_table(spark, SF_DIR, "lineitem")
    n_files = 16
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    (
        li.repartitionByRange(n_files, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(linear)
    )
    key = zorder_key([F.col("l_partkey"), F.col("l_suppkey")])
    cluster_by_zorder(li, key, n_files).write.parquet(zord)

    # narrow 2-D box: ~1/8 of each dimension
    lo_p, hi_p = 100, 350
    lo_s, hi_s = 10, 22
    pred = {"l_partkey": (lo_p, hi_p), "l_suppkey": (lo_s, hi_s)}
    lin_hit, lin_total = _files_overlapping(linear, pred)
    z_hit, z_total = _files_overlapping(zord, pred)
    assert lin_total == z_total == n_files
    # linear layout scatters partkey across every file -> ~no pruning
    assert z_hit < lin_hit, (z_hit, lin_hit)
    assert z_hit <= n_files // 2, f"zorder pruned too little: {z_hit}/{n_files}"

    # and the pruned layout still returns identical query results
    q = (
        F.col("l_partkey").between(lo_p, hi_p)
        & F.col("l_suppkey").between(lo_s, hi_s)
    )
    want = li.filter(q).count()
    assert spark.read.parquet(zord).filter(q).count() == want
    assert spark.read.parquet(linear).filter(q).count() == want


def test_normalize_to_bits_propagates_null(spark):
    """NULL keys must NOT silently clamp to bucket 0 (review find r8): the
    component — and therefore the z-key — stays NULL."""
    df = spark.createDataFrame([(None,), (50.0,)], "v DOUBLE")
    out = df.select(
        normalize_to_bits(F.col("v"), 0.0, 100.0, bits=8).alias("n"),
        zorder_key([normalize_to_bits(F.col("v"), 0.0, 100.0, bits=8)], bits=8).alias("z"),
    ).collect()
    by_null = {r.n is None: r for r in out}
    assert by_null[True].z is None
    assert by_null[False].n == 127 and by_null[False].z is not None
