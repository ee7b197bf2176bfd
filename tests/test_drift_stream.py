"""Streaming drift monitor (streaming/drift_stream.py): streamed ==
batch report, per-epoch rows with replay idempotency, the drifted-epochs
alerting query catching a planted shifted epoch, and constructor
validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.streaming.drift_stream import (
    StreamingDriftMonitor,
    drifted_epochs,
)

_SCHEMA = "doc_id long, n_chars long, lang string"


def _frame(spark, n, shift=0, lang_skew=False):
    langs = (
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("de"))
        if lang_skew
        else F.when(F.col("id") % 4 == 0, F.lit("de")).otherwise(F.lit("en"))
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 200 + shift).cast("long").alias("n_chars"),
        langs.alias("lang"),
    )


def _land(spark, df, landing, name):
    """Write one batch's parquet files into the landing ROOT (the file
    stream source does not recurse into subdirectories)."""
    import shutil

    tmp = str(landing.parent / f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    landing.mkdir(exist_ok=True)
    import os

    for i, f in enumerate(sorted(os.listdir(tmp))):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(tmp, f), str(landing / f"{name}_{i}.parquet")
            )
    shutil.rmtree(tmp, ignore_errors=True)


def test_streamed_equals_batch_and_alerting(spark, tmp_path):
    ref = _frame(spark, 2000)
    landing = tmp_path / "landing"
    # epoch files: one in-distribution, one shifted hard
    _land(spark, _frame(spark, 500), landing, "a")
    mon = StreamingDriftMonitor(
        spark, ref, numeric_cols=["n_chars"], categorical_cols=["lang"],
        bins=32,
    )
    out = str(tmp_path / "drift")
    mon.bind_stream(str(landing), out, _SCHEMA).awaitTermination(120)
    first = spark.read.parquet(out)
    assert {r.column for r in first.collect()} == {"n_chars", "lang"}
    epochs1 = {r.epoch for r in first.select("epoch").collect()}
    # batch parity: the stream's rows equal the direct operator's
    direct = {
        (r.column, r.kind, r.statistic)
        for r in mon.report(_frame(spark, 500)).collect()
    }
    streamed = {
        (r.column, r.kind, r.statistic) for r in first.collect()
    }
    assert streamed == direct
    # second landing: a hard shift on both axes
    _land(spark, _frame(spark, 500, shift=150, lang_skew=True), landing, "b")
    mon.bind_stream(str(landing), out, _SCHEMA).awaitTermination(120)
    all_rows = spark.read.parquet(out)
    new_epochs = {
        r.epoch for r in all_rows.select("epoch").collect()
    } - epochs1
    assert len(new_epochs) == 1
    alerts = drifted_epochs(spark, out, ks_threshold=0.2, tvd_threshold=0.1)
    got = {(r.epoch, r.column) for r in alerts.collect()}
    bad = next(iter(new_epochs))
    assert got == {(bad, "n_chars"), (bad, "lang")}
    mover = {
        r.column: r.top_mover for r in alerts.collect() if r.top_mover
    }
    assert mover["lang"] in ("en", "de")


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    ref = _frame(spark, 1000)
    mon = StreamingDriftMonitor(
        spark, ref, numeric_cols=["n_chars"], bins=16
    )
    out = str(tmp_path / "drift")
    body = mon.foreach_batch(out)
    batch = _frame(spark, 300, shift=10)
    body(batch, 0)
    n1 = spark.read.parquet(out).count()
    body(batch, 0)  # replay replaces epoch 0, never duplicates
    assert spark.read.parquet(out).count() == n1 == 1


def test_constructor_validation(spark):
    with pytest.raises(ValueError, match="no columns"):
        StreamingDriftMonitor(spark, _frame(spark, 10))


def test_drained_epoch_alerts(spark, tmp_path):
    """r12 ADVICE (low): an EMPTY (or all-NULL) epoch produces a NULL
    statistic, and NULL compares false against any threshold — the
    alerting query must surface it as a drift event, not a quiet pass."""
    ref = _frame(spark, 1000)
    mon = StreamingDriftMonitor(
        spark, ref, numeric_cols=["n_chars"], categorical_cols=["lang"],
        bins=16,
    )
    out = str(tmp_path / "drift")
    body = mon.foreach_batch(out)
    body(_frame(spark, 300), 0)  # healthy epoch, same distribution
    body(_frame(spark, 300).filter(F.lit(False)), 1)  # drained epoch
    alerts = drifted_epochs(spark, out, ks_threshold=0.2, tvd_threshold=0.1)
    got = {(r.epoch, r.column) for r in alerts.collect()}
    assert got == {(1, "n_chars"), (1, "lang")}
    stats = {r.column: r.statistic for r in alerts.collect()}
    assert all(v is None for v in stats.values())


def test_quantile_cols_in_monitor(spark, tmp_path):
    """quantile_cols (r13): the monitor measures long-tailed columns with
    equal-mass reference bins — a shifted epoch alerts on the tvd axis
    where the fixed-width KS mode on the same column is blinded by a
    planted outlier stretching its grid."""
    def frame(n, shift=0):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 100 == 0, F.lit(10_000_000))
            .otherwise((F.col("id") % 200 + shift))
            .cast("long")
            .alias("n_chars"),
            F.lit("en").alias("lang"),
        )

    ref = frame(1000)
    mon = StreamingDriftMonitor(
        spark, ref, numeric_cols=["n_chars"], quantile_cols=["n_chars"],
        bins=16,
    )
    out = str(tmp_path / "drift")
    body = mon.foreach_batch(out)
    body(frame(400), 0)          # same distribution
    body(frame(400, shift=60), 1)  # shifted epoch
    rows = spark.read.parquet(out).collect()
    # two rows per epoch for the same column, distinguished by kind
    kinds = {(r.epoch, r.kind) for r in rows}
    assert kinds == {(0, "ks"), (0, "chi2"), (1, "ks"), (1, "chi2")}
    by = {(r.epoch, r.kind): r for r in rows}
    # identical epoch: both modes read 0 drift
    assert by[(0, "chi2")].tvd == pytest.approx(0.0)
    # shifted epoch: quantile bins see it; the outlier-stretched
    # fixed-width grid barely moves
    assert by[(1, "chi2")].tvd > 0.2
    assert by[(1, "ks")].statistic < by[(1, "chi2")].tvd
    alerts = drifted_epochs(spark, out, ks_threshold=0.5, tvd_threshold=0.1)
    assert {(r.epoch, r.kind) for r in alerts.collect()} == {(1, "chi2")}
