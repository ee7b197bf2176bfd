"""Same-session streaming-visit A/B probe — the VERDICT r13 task-2
attribution tool. Runs a SHORT visit series (default 8 visits, NO
maintenance so the loop is pure) through bench.bench_visit_stream in the
CURRENT checkout and prints one JSON line with the per-visit times and
the tail median (visits 3.., skipping the cold store-populate head).

One probe is ~1 minute, which makes an alternating old-vs-new series
affordable on the same host minutes apart — the protocol that separates
"the code got slower" (a consistent A/B gap) from "the host was busy"
(both sides move together):

    git worktree add /tmp/ab_r12 <r12-final-commit>
    cp tools/ab_visits.py /tmp/ab_r12/tools/        # probe is new in r14
    for i in 1 2 3; do
        (cd /tmp/ab_r12 && python tools/ab_visits.py)   # A: old code
        python tools/ab_visits.py                        # B: new code
    done

The headline sibling (tools/ab_headline.py) deliberately excludes the
visit loop; this probe covers exactly the gap the r13 verdict named
(streaming_visit_times 2.77 -> 6.59 s sustained, unattributed)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_visit_stream
from l1dbproto_spark.session import get_spark


def main() -> None:
    n_visits = int(os.environ.get("AB_VISITS", "8"))
    spark = get_spark("ab_visits")
    t0 = time.time()
    # maintain_every > n_visits: no compaction event inside the probe —
    # the question is the per-visit loop, not the maintenance cycle
    times, events = bench_visit_stream(
        spark, n_visits=n_visits, maintain_every=n_visits + 1
    )
    tail = sorted(times[2:])
    print(
        json.dumps(
            {
                "metric": "ab_visit_series",
                "n_visits": n_visits,
                "times": times,
                "tail_median": tail[len(tail) // 2],
                "events": events,
                "wall": round(time.time() - t0, 1),
                "cwd": os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
