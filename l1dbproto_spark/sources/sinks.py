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
