"""gap_fill_resample semantics on constructed data: grid bounds, LOCF fill,
gap flags, exact sums, and the per-key span invariant."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from l1dbproto_spark.operators.timeseries import gap_fill_resample
from l1dbproto_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ts(day: int, hour: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


def test_locf_and_gap_flags(spark):
    rows = [
        (1, _ts(1), 10.0),
        (1, _ts(1, 13), 2.5),  # same bucket as above -> summed
        (1, _ts(4), 7.0),      # days 2,3 are gaps
        (2, _ts(2), 1.0),      # single-bucket key: no gaps
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, value DOUBLE")
    out = {
        (r.user_id, r.bucket_ts.day): (r.n_events, r.sum_value, r.filled_value, r.is_gap)
        for r in gap_fill_resample(df, "user_id", "ts", "value", unit="day").collect()
    }
    assert out[(1, 1)] == (2, 12.5, 12.5, False)
    assert out[(1, 2)] == (0, None, 12.5, True)   # gap carries day-1 sum
    assert out[(1, 3)] == (0, None, 12.5, True)
    assert out[(1, 4)] == (1, 7.0, 7.0, False)    # observation resets the carry
    assert out[(2, 2)] == (1, 1.0, 1.0, False)
    assert len(out) == 5  # 4-day span for key 1 + 1 bucket for key 2


def test_span_invariant_and_no_null_fill(spark):
    """Per key: rows == (max-min days + 1); filled_value never NULL (first
    bucket is observed by construction); every non-gap bucket has
    filled == sum."""
    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_type") == "purchase")
    out = gap_fill_resample(ev, "user_id", "ts", "value", unit="day")
    assert out.filter(F.col("filled_value").isNull()).count() == 0
    assert (
        out.filter(~F.col("is_gap") & (F.col("filled_value") != F.col("sum_value"))).count()
        == 0
    )
    bad_span = (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            (F.datediff(F.max("bucket_ts"), F.min("bucket_ts")) + 1).alias("span"),
        )
        .filter(F.col("rows") != F.col("span"))
        .count()
    )
    assert bad_span == 0
    # and gaps actually exist in the fixture (the test is not vacuous)
    assert out.filter(F.col("is_gap")).count() > 0


def test_hour_unit_and_bad_unit(spark):
    import pytest

    rows = [(1, _ts(1, 5), 1.0), (1, _ts(1, 8), 2.0)]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, value DOUBLE")
    out = gap_fill_resample(df, "user_id", "ts", "value", unit="hour").collect()
    assert len(out) == 4  # hours 5..8
    assert sum(r.is_gap for r in out) == 2
    with pytest.raises(ValueError):
        gap_fill_resample(df, "user_id", "ts", "value", unit="fortnight")
