"""Log parsing + metrics pipeline (batch and streaming) — SURVEY §3.3.

Fixture per FIXTURES.md metrics_log: out-of-order lines within a bounded
window, >=4 distinct visits, pandas oracle for the per-visit means."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from l1dbproto_spark.sources.logs import (
    format_log_line,
    parse_metrics_lines,
    read_log_batch,
    read_log_stream,
)
from l1dbproto_spark.sources.sinks import influx_line_expr, write_csv
from l1dbproto_spark.streaming.metrics import (
    per_visit_stats,
    streaming_per_visit_stats,
    sum_select_real,
    visit_wide_row,
)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("logs")
    lines = []
    # 4 visits x 4 tables x select/insert timers, with deliberate disorder:
    # visit v's lines carry timestamps interleaved +/- a few seconds
    base = "2026-02-10 18:{m:02d}:{s:02d},{ms:03d}"
    rows = []
    for v in range(1, 5):
        for ti, table in enumerate(
            ["DiaObject", "DiaObjectLast", "DiaSource", "DiaForcedSource"]
        ):
            for k, metric in enumerate(["select_time", "insert_time"]):
                # two samples per (visit, table, metric)
                for s in (0, 1):
                    real = 0.1 * v + 0.01 * ti + 0.001 * k + 0.0005 * s
                    ts = base.format(m=v, s=(59 - ti * 2 - s) % 60, ms=(v * 100 + ti) % 1000)
                    lines.append(
                        format_log_line(ts, metric, v, {"real": real}, table)
                    )
                    rows.append((v, metric, table, real))
        lines.append(f"2026-02-10 18:{v:02d}:30,000 - x - INFO - no marker here")
    # shuffle lines deterministically to simulate multi-process interleave
    import random

    rng = random.Random(7)
    rng.shuffle(lines)
    (d / "ap_proto.log").write_text("\n".join(lines) + "\n")
    oracle = (
        pd.DataFrame(rows, columns=["visit", "name", "table", "real"])
        .groupby(["visit", "name", "table"])["real"]
        .mean()
        .reset_index()
    )
    return {"dir": str(d), "oracle": oracle}


def test_parse_drops_unmarked_lines(spark, log_dir):
    parsed = read_log_batch(spark, log_dir["dir"])
    assert parsed.count() == 4 * 4 * 2 * 2
    assert parsed.filter(F.col("ts").isNull()).count() == 0
    assert parsed.filter(F.col("visit").isNull()).count() == 0


def test_per_visit_stats_matches_pandas_oracle(spark, log_dir):
    parsed = read_log_batch(spark, log_dir["dir"])
    got = (
        per_visit_stats(parsed)
        .select("visit", "name", "table", "avg_real")
        .toPandas()
        .sort_values(["visit", "name", "table"])
        .reset_index(drop=True)
    )
    oracle = log_dir["oracle"].sort_values(["visit", "name", "table"]).reset_index(drop=True)
    assert len(got) == len(oracle)
    merged = got.merge(oracle, on=["visit", "name", "table"])
    assert (abs(merged.avg_real - merged.real) < 1e-12).all()


def test_wide_row_shape_and_derived_column(spark, log_dir):
    parsed = read_log_batch(spark, log_dir["dir"])
    wide = sum_select_real(visit_wide_row(parsed))
    pdf = wide.toPandas()
    assert list(pdf["visit"]) == [1, 2, 3, 4]
    assert "select_time_DiaObject" in pdf.columns
    assert "sum_select_real" in pdf.columns
    # derived col = sum of the three select averages
    import numpy as np

    expect = (
        pdf["select_time_DiaObject"].fillna(0)
        + pdf["select_time_DiaSource"].fillna(0)
        + pdf["select_time_DiaForcedSource"].fillna(0)
    )
    assert np.allclose(pdf["sum_select_real"], expect)


def test_streaming_matches_batch(spark, log_dir):
    """File-stream the same log dir; watermarked agg must converge to the
    batch result (T2/W5/W6 in engine-native form). Update mode: a one-shot
    (availableNow) run never advances the watermark past the newest window,
    so append mode would emit nothing — update emits every final aggregate
    (each group's lines arrive in one batch here, so no intermediate rows)."""
    stream = read_log_stream(spark, log_dir["dir"])
    agg = streaming_per_visit_stats(stream)
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("visit_stats_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql(
        "SELECT visit, name, `table`, avg_real FROM visit_stats_stream"
    ).toPandas()
    oracle = log_dir["oracle"]
    assert len(got) == len(oracle), "every (visit, metric, table) group must emit"
    merged = got.merge(
        oracle, left_on=["visit", "name", "table"], right_on=["visit", "name", "table"]
    )
    assert len(merged) == len(got)
    assert (abs(merged.avg_real - merged.real) < 1e-12).all()


def test_csv_sink_roundtrip(spark, log_dir, tmp_path):
    parsed = read_log_batch(spark, log_dir["dir"])
    wide = visit_wide_row(parsed)
    out = str(tmp_path / "report")
    write_csv(wide.coalesce(1), out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 4
    assert "select_time_DiaObject" in back.columns


def test_influx_line_format(spark):
    df = spark.createDataFrame(
        [(1, "DiaObject", 0.5, "2026-02-10 18:00:00")],
        "visit int, tbl string, real double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    line = df.select(
        influx_line_expr("select_time", ["visit", "tbl"], ["real"], "ts")
    ).collect()[0]["line"]
    assert line.startswith("select_time,visit=1,tbl=DiaObject real=0.5 ")
    assert line.endswith("000")  # ns epoch


def test_gzip_log_source(spark, log_dir, tmp_path):
    """S9: gzip logs read transparently by the batch source."""
    import gzip
    import os

    src = os.path.join(log_dir["dir"], "ap_proto.log")
    gz_dir = tmp_path / "gz"
    gz_dir.mkdir()
    with open(src, "rb") as f, gzip.open(gz_dir / "ap_proto.log.gz", "wb") as g:
        g.write(f.read())
    parsed = read_log_batch(spark, str(gz_dir))
    assert parsed.count() == 4 * 4 * 2 * 2
