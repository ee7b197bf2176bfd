"""Same-session headline A/B probe: time ONLY the registered headline
queries (one untimed warm rep at the measured SF, then min-of-3 — the
exact bench.py methodology) in the CURRENT checkout and print one JSON
line. No extras, no streaming, so one run is minutes, which makes an
alternating old-vs-new series affordable.

Usage (the PERFORMANCE.md r13 attribution protocol for the 6.2 -> 7.8 s
clean-headline drift question — VERDICT r12 task 5):

    git worktree add /tmp/ab_old <r11-final-commit>
    for i in 1 2 3 4 5; do
        (cd /tmp/ab_old && python tools/ab_headline.py)   # A
        python tools/ab_headline.py                        # B
    done

ap_visit is deliberately excluded: the question is the pure-query
headline block (whose plans are unchanged across the rounds in
question); the visit loop has its own sustained/worst record."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from l1dbproto_spark.queries import load_all
from l1dbproto_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    headline = {n: s for n, s in specs.items() if s.headline}
    spark = get_spark("ab_headline")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for spec in headline.values():
            spec.builder(spark, warm_dir).count()
    timings: dict[str, float] = {}
    for name, spec in headline.items():
        spec.builder(spark, sf_dir).count()  # untimed warm rep
        reps = []
        for _ in range(3):
            t0 = time.time()
            spec.builder(spark, sf_dir).count()
            reps.append(time.time() - t0)
        timings[name] = round(min(reps), 3)
    print(
        json.dumps(
            {
                "metric": "ab_headline_8q",
                "total": round(sum(timings.values()), 3),
                "queries": timings,
                "sf_dir": sf_dir,
                "cwd": os.path.dirname(os.path.abspath(__file__)),
            }
        )
    )


if __name__ == "__main__":
    main()
