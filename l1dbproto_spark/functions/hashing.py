"""Engine-portable hashing expressions.

Spark's built-in ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
algorithms, so every hash that participates in an oracle-checked result is
derived from md5 (identical hex output in both engines) and converted to a
60-bit non-negative integer via base-16 parse. 60 bits keeps the value safely
inside int64 in both engines.

At 100 TB this md5-based hash is ~2-3x slower than xxhash64 but still
JVM-side, codegen'd, and embarrassingly parallel; swap ``portable_hash64`` for
``F.xxhash64`` in production paths where cross-engine reproducibility is not
required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_LEN = 15  # 15 hex chars = 60 bits < int64 max


def portable_hash64(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit hash of a string column, identical in DuckDB as
    ``CAST(concat('0x', substr(md5(concat('<salt>', x)), 1, 15)) AS BIGINT)``."""
    salted = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, HASH_HEX_LEN), 16, 10).cast("long")


def portable_hash64_sql(expr: str, salt: str = "") -> str:
    """The DuckDB-side rendering of :func:`portable_hash64`."""
    inner = f"concat('{salt}', {expr})" if salt else expr
    return f"CAST(concat('0x', substr(md5({inner}), 1, {HASH_HEX_LEN})) AS BIGINT)"
