"""StructType registry for the APDB tables + the felis-type mapping.

The reference declares schemas through felis table definitions consumed via
``tableDef(table)`` (``_executors.py:445-452``) with the primitive type
lattice enumerated at ``_executors.py:466-496``. Schemas here follow
FIXTURES.md (the driver's synthesis contract), which is the same shape.

Column-name renames between DB schema and client convention
(``README.md:52-61``) are exposed via :data:`API_RENAMES`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# felis primitive -> Spark type (reference _executors.py:466-496)
FELIS_TO_SPARK: dict[str, T.DataType] = {
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "short": T.ShortType(),
    "byte": T.ByteType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "char": T.StringType(),
    "string": T.StringType(),
    "unicode": T.StringType(),
    "text": T.StringType(),
    "timestamp": T.TimestampType(),
}

# DB-side name <-> client-side name (reference README.md:52-61)
API_RENAMES: dict[str, str] = {
    "diaObjectId": "id",
    "ra": "coord_ra",
    "dec": "coord_dec",
    "parentDiaSourceId": "parent",
}


def _f(name: str, t: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, t, nullable)


DIA_OBJECT = T.StructType(
    [
        _f("diaObjectId", T.LongType(), False),
        _f("validityStart", T.TimestampType(), False),
        _f("validityEnd", T.TimestampType(), True),
        _f("ra", T.DoubleType(), False),
        _f("dec", T.DoubleType(), False),
        _f("nDiaSources", T.LongType(), False),
        _f("lastNonForcedSource", T.TimestampType(), True),
        _f("pixelId", T.LongType(), False),
        # representative felis-typed extras (_executors.py:466-493)
        _f("flux_f32", T.FloatType(), True),
        _f("chi2_f64", T.DoubleType(), True),
        _f("flags_i32", T.IntegerType(), True),
        _f("note_s8", T.StringType(), True),
    ]
)

# DiaObjectLast = DiaObject minus validityEnd; exactly one row per object
DIA_OBJECT_LAST = T.StructType(
    [f for f in DIA_OBJECT.fields if f.name != "validityEnd"]
)

DIA_SOURCE = T.StructType(
    [
        _f("diaSourceId", T.LongType(), False),
        _f("diaObjectId", T.LongType(), False),
        _f("visit", T.IntegerType(), False),
        _f("detector", T.IntegerType(), False),
        _f("parentDiaSourceId", T.LongType(), True),
        _f("psFlux", T.DoubleType(), True),
        _f("psFluxErr", T.DoubleType(), True),
        _f("midpointMjdTai", T.DoubleType(), False),
        _f("ra", T.DoubleType(), False),
        _f("dec", T.DoubleType(), False),
        _f("pixelId", T.LongType(), False),
    ]
)

DIA_FORCED_SOURCE = T.StructType(
    [
        _f("diaObjectId", T.LongType(), False),
        _f("ra", T.DoubleType(), False),
        _f("dec", T.DoubleType(), False),
        _f("visit", T.IntegerType(), False),
        _f("detector", T.IntegerType(), False),
        _f("midpointMjdTai", T.DoubleType(), False),
    ]
)

VISITS = T.StructType(
    [
        _f("visitId", T.IntegerType(), False),
        _f("visitTime", T.TimestampType(), False),
        _f("lastObjectId", T.LongType(), False),
        _f("lastSourceId", T.LongType(), False),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "DiaObject": DIA_OBJECT,
    "DiaObjectLast": DIA_OBJECT_LAST,
    "DiaSource": DIA_SOURCE,
    "DiaForcedSource": DIA_FORCED_SOURCE,
    "visits": VISITS,
}


def table_def(table: str) -> T.StructType:
    """The ``tableDef(table)`` contract (``_executors.py:445``)."""
    return TABLE_SCHEMAS[table]


def extend_schema(base: T.StructType, extra: T.StructType) -> T.StructType:
    """Client-supplied schema extension: extra columns merged into the managed
    schema (``README.md:80-84``). Duplicate names keep the managed def."""
    names = {f.name for f in base.fields}
    return T.StructType(
        list(base.fields) + [f for f in extra.fields if f.name not in names]
    )


def to_api_names(df: DataFrame) -> DataFrame:
    """DB-side -> client-side column names (``README.md:52-61``)."""
    return df.withColumnsRenamed(API_RENAMES)


def from_api_names(df: DataFrame) -> DataFrame:
    return df.withColumnsRenamed({v: k for k, v in API_RENAMES.items()})
