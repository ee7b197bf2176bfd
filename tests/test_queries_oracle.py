"""Every registered query with an oracle must match DuckDB on sf0.001.

This mirrors the driver's t2 correctness gate (it runs at sf0.01); running it
at sf0.001 keeps the pytest loop fast.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from l1dbproto_spark.queries import load_all
from tools.check_correctness import compare, duck_connection

SPECS = load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    sdf = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke
        return
    odf = duck.execute(spec.oracle).df()
    issues = compare(name, sdf, odf)
    assert not issues, f"{name}: {issues}"
