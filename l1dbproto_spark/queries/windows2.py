"""Window frames, ranking, unpivot, array and cube batteries — rounding out
the analytic-SQL surface (SURVEY §2.5 'not present' items: frame specs,
ranking beyond row_number; §2.7 'not present': array functions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import query


def window_frames_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame battery per order version: cumulative spend + 3-row moving
    average (frame specs), the SCD-2 validity interval derived with lead()
    (the batch form of the reference's validityEnd truncation, metrics.md:57
    — SURVEY.md W2), and the as-of flag marking the version active at T (the
    version-table read path behind ``getDiaObjects`` when the materialized
    Last table is bypassed).

    Unregistered in round 6 (50-slot registry cap): its slot went to
    ``dedup_corpus_lines`` so the C4/CCNet cleaning family sits under the
    driver's hard signal; W2 stays driver-covered via
    ``latest_version_per_key`` and the SCD-2 pytest suite. Kept as API
    surface under the same DuckDB oracle in
    tests/test_unregistered_batteries.py."""
    orders = load_table(spark, sf_dir, "orders")
    t = F.lit("1997-06-01 00:00:00").cast("timestamp")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    validity_end = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(cum).cast("double").alias("running_spend"),
        (
            F.sum(dec).over(mov).cast("double")
            / F.count(F.lit(1)).over(mov)
        ).alias("moving_avg_3"),
        F.col("o_orderdate").alias("validity_start"),
        validity_end.alias("validity_end"),
        (
            (F.col("o_orderdate") <= t)
            & (validity_end.isNull() | (validity_end > t))
        ).alias("active_at_t"),
    )


def string_pattern_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions, LIKE/regex predicates, and ranking windows in one
    per-part projection (the three former separate batteries, merged to keep
    the registry within the driver's correctness budget).

    Unregistered in round 4 (50-slot registry cap): its slot went to
    ``ivf_pq_topk`` so the composed ANN family sits under the driver's hard
    signal; F13 stays driver-covered via ``doc_fingerprint``. Kept as API
    surface under the same DuckDB oracle in
    tests/test_unregistered_batteries.py."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return part.filter(F.col("p_name").like("%o%")).select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.substring("p_name", 5, 6).alias("mid"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("repl"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brandsize"
        ),
        F.length("p_name").cast("long").alias("name_len"),
        F.instr(F.col("p_name"), "o").cast("long").alias("o_pos"),
        F.col("p_name").like("%widget%").alias("has_widget"),
        F.col("p_name").like("cold%").alias("starts_cold"),
        F.col("p_brand").like("Brand#1_").alias("brand_1x"),
        F.col("p_type").rlike("^(ECONOMY|STANDARD)$").alias("simple_type"),
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
    )


def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long unpivot via stack() — the inverse of the metrics pivot.

    Unregistered in round 4 (50-slot registry cap): its slot went to
    ``contamination_report``. Oracle kept in
    tests/test_unregistered_batteries.py."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', CAST(o_totalprice AS DOUBLE),"
            " 'custkey', CAST(o_custkey AS DOUBLE)) AS (metric, value)"
        ),
    )


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery (size / element_at / max / min / filter).

    Unregistered in round 3 (50-slot registry cap): its slot went to
    ``quantized_topk``, which exercises a strictly larger array surface
    (transform / zip_with / aggregate / array_max) under a driver oracle.
    Kept for API use and tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(v).cast("long").alias("dim"),
        F.element_at(v, 1).cast("double").alias("first_dim"),
        F.array_max(v).cast("double").alias("max_dim"),
        F.array_min(v).cast("double").alias("min_dim"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


