"""Watermarked stream-stream interval join — purchases joined to the same
user's clicks within the preceding 30 minutes. The batch as-of/interval join
(operators/asof.py) is the batch form; this pins the streaming form."""

from __future__ import annotations

from pyspark.sql import functions as F

from l1dbproto_spark.sources.catalog import load_table


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    d = str(tmp_path / "events_copy")
    ev.write.mode("overwrite").parquet(d)
    schema = ev.schema

    clicks = (
        spark.readStream.schema(schema)
        .parquet(d)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_event"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(d)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_event"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) FROM ss_join").collect()[0][0]

    # batch oracle: identical join on the static table
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    expect = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).count()
    assert got == expect
    assert got > 0
