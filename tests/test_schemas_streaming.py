"""Schema API contracts (P9 renames, extension merge, felis mapping) and the
Structured Streaming forms of the events aggregations (T1/T2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from l1dbproto_spark.schemas import (
    API_RENAMES,
    FELIS_TO_SPARK,
    extend_schema,
    from_api_names,
    table_def,
    to_api_names,
)
from l1dbproto_spark.sources.catalog import load_table


def test_felis_mapping_complete():
    for t in ("float", "double", "int", "long", "short", "byte", "boolean",
              "binary", "char", "string", "unicode", "text", "timestamp"):
        assert t in FELIS_TO_SPARK


def test_table_defs():
    assert table_def("DiaObject").fieldNames()[0] == "diaObjectId"
    assert "validityEnd" not in table_def("DiaObjectLast").fieldNames()
    with pytest.raises(KeyError):
        table_def("NoSuchTable")


def test_api_renames_roundtrip(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0, 0)], "diaObjectId long, ra double, dec double, parentDiaSourceId long")
    api = to_api_names(df)
    assert set(api.columns) == {"id", "coord_ra", "coord_dec", "parent"}
    back = from_api_names(api)
    assert set(back.columns) == set(df.columns)


def test_extend_schema_client_columns():
    base = table_def("DiaSource")
    extra = T.StructType(
        [
            T.StructField("clientCol", T.DoubleType()),
            T.StructField("diaSourceId", T.StringType()),  # dup: managed wins
        ]
    )
    merged = extend_schema(base, extra)
    assert "clientCol" in merged.fieldNames()
    assert merged["diaSourceId"].dataType == T.LongType()


def test_streaming_tumbling_window_events(spark, sf_dir):
    """The streaming form of visit_window_agg: file-stream the events table,
    1-hour tumbling windows with watermark, update mode; totals must match
    the batch aggregation exactly."""
    batch = load_table(spark, sf_dir, "events")
    # stream from a dedicated copy (a directory stream over sf_dir would mix
    # incompatible table schemas)
    import tempfile

    d = tempfile.mkdtemp(prefix="ev_stream_")
    batch.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(batch.schema).parquet(d)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sv"),
        )
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("ev_win")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql(
        "SELECT window.start AS ws, event_type, n, sv FROM ev_win"
    ).toPandas()
    expect = (
        batch.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("ws"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sv"),
        )
        .toPandas()
    )
    m = got.merge(expect, on=["ws", "event_type"], suffixes=("_s", "_b"))
    assert len(m) == len(got) == len(expect)
    assert (m.n_s == m.n_b).all()
    assert (m.sv_s == m.sv_b).all()
