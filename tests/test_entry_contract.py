"""The driver contract (__spark_entry__.py): entry() produces rows on
sf0.001, queries()/oracle_sql() expose exactly the 50-entry registry
with oracles a subset of queries — the literal shape the driver's
verify probes, guarded in CI."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrypoint


def test_driver_contract_shape(spark):
    df = entrypoint.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0
    q = entrypoint.queries()
    o = entrypoint.oracle_sql()
    assert len(q) == 50
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
