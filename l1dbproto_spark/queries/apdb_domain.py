"""APDB-domain query shapes (visit pipeline semantics) expressed over the
driver's relational tables so the DuckDB oracle can check them.

Filled incrementally; the full APDB layer lives in l1dbproto_spark/apdb.py and
is exercised by the pytest suite on generated Dia* fixtures."""

from __future__ import annotations
