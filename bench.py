"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed once for warm-up-free realism? No — JVM+codegen warmup
dominates at this scale, so we run one untimed warmup pass of a trivial action,
then time each query end-to-end (plan + execute + collect count).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from l1dbproto_spark.queries import load_all
from l1dbproto_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    specs = load_all()
    headline = {n: s for n, s in specs.items() if s.headline}
    spark = get_spark("bench")
    # warmup: touch every table + trigger codegen paths once
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name, spec in headline.items():
        t0 = time.time()
        df = spec.builder(spark, sf_dir)
        # count() executes the full plan without driver-side materialization cost
        df.count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
