"""MJD <-> timestamp conversion expressions.

The reference mixes astropy Time (TAI), MJD floats, ISO strings, and epoch
seconds (``_executors.py:351,407``; ``visit_info.py:74,96``;
``_executors.py:494-496`` — SURVEY.md F9/F10). Spark stores TimestampType
(UTC microseconds); these expressions convert to/from MJD as doubles.

Convention note: the reference uses MJD in the TAI scale. TAI-UTC offset
handling (leap seconds, 37 s in the current era) is a domain constant; the
engine treats stored timestamps as TAI-scale wall time — i.e. conversions
here are scale-preserving, matching how the reference round-trips
``Time(mjd, format="mjd", scale="tai")`` (``ap_proto_visit.py:124``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MJD_UNIX_EPOCH = 40587.0  # MJD of 1970-01-01
SECONDS_PER_DAY = 86400.0


def timestamp_to_mjd(ts: Column) -> Column:
    """TimestampType -> MJD double (sub-second precision preserved)."""
    micros = F.unix_micros(ts)
    return micros / F.lit(SECONDS_PER_DAY * 1e6) + F.lit(MJD_UNIX_EPOCH)


def mjd_to_timestamp(mjd: Column) -> Column:
    """MJD double -> TimestampType (microsecond resolution)."""
    micros = ((mjd - F.lit(MJD_UNIX_EPOCH)) * F.lit(SECONDS_PER_DAY * 1e6)).cast("long")
    return F.timestamp_micros(micros)


def mjd_month_bucket(mjd: Column) -> Column:
    """Temporal partition key: ~30-day buckets of MJD — the reference's
    months-bounded history reads (``README.md:139-151``) prune on this."""
    return F.floor(mjd / 30.0).cast("int")


def python_datetime_to_mjd(dt) -> float:
    """Driver-side twin (plan constants)."""
    import datetime

    epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return (dt - epoch).total_seconds() / SECONDS_PER_DAY + MJD_UNIX_EPOCH
