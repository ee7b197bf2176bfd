"""AQE skew-join pin — the runtime half of the engine's skew strategy.

operators/skew.py handles AGGREGATION skew by salting (two-stage, oracle
`salted_skew_agg` in-suite); JOIN skew is deliberately left to AQE's
OptimizeSkewedJoin, which splits oversized shuffle partitions at runtime
using real sizes — strictly better information than any compile-time
salting heuristic. This test pins that the engine's session actually gets
that behavior (adaptive enabled, skew-join not disabled by some config
drift): a 90%-one-key join must execute as `SortMergeJoin(skew=true)`
with skewed AQEShuffleReads, and produce exact results. Thresholds are
lowered to make the local 200k-row frame 'big'; on a real cluster the
defaults (256MB advisory) fire on genuinely oversized partitions."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _conf(spark, **kv):
    prev = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    with _conf(
        spark,
        **{
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        # 90% of left rows share key 0 — one shuffle partition dwarfs the rest
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("a"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("b")
        )
        j = left.join(right, "k").select("k")
        rows = j.collect()  # executes THIS QueryExecution -> AQE finalizes
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan, plan[:2000]  # AQEShuffleRead ... skewed
        # exact result: 180k rows of key 0 (hot key joins right's k=0 row)
        # + 100 distinct ids >= 1000... none (right has k < 1000 only, and
        # left's non-hot keys are ids with id % 10 == 9, so matches are
        # ids in [0, 1000) with id % 10 == 9 -> 100 rows
        assert len(rows) == 180_000 + 100


def test_skew_session_defaults_keep_aqe_on(spark):
    """The engine session must not have wandered away from the AQE
    defaults the skew strategy depends on."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
