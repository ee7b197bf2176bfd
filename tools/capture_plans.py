#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries into plans/$SPARK_GRAFT_PLANS_DIR
(default r15).

Usage:
    python tools/capture_plans.py before [query ...]   # -> plans/<dir>/<q>_before.txt
    python tools/capture_plans.py after  [query ...]   # -> plans/<dir>/<q>_after.txt

With no query names, captures every registered query. The plan is the
static formatted physical plan at sf0.1 (the bench SF) under the bench
session config — the artifact the optimization round's claims are checked
against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from l1dbproto_spark.queries import load_all  # noqa: E402
from l1dbproto_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    assert suffix in ("before", "after"), "first arg must be before|after"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    specs = load_all()
    if names:
        missing = [n for n in names if n not in specs]
        assert not missing, f"unknown queries: {missing}"
        specs = {n: specs[n] for n in names}
    for name, spec in specs.items():
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
