#!/usr/bin/env python
"""Measure what a visit pays right after a compaction (VERDICT r14 item 3).

Builds a small APDB store, runs visits until the tables have real file
counts, compacts DiaObject (the table the bench's maintenance event
rewrites), and times the driver-side construction of each table read
(`spark.read.parquet` — file listing + schema inference footer read)
plus one Q1 region read, in three states:

  * steady      — before the compaction (listing cache warm from the visit)
  * postcompact — right after compact() (the overwrite invalidated the
                  session FileStatusCache for the path)
  * warmed      — after a warm touch (re-constructing the read once in the
                  maintenance gap), i.e. what the next visit would see if
                  compact() warmed the listing itself

Driver-side wall only — the numbers isolate the listing/footer cost the
maintenance thread can absorb, independent of executor load.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from l1dbproto_spark.apdb import ApdbSpark  # noqa: E402
from l1dbproto_spark.plans.region import Circle  # noqa: E402
from l1dbproto_spark.session import get_spark  # noqa: E402
from l1dbproto_spark.workload.dia import DiaConfig, detect_sources  # noqa: E402
from l1dbproto_spark.workload.generators import rand_cone_xyz  # noqa: E402
from l1dbproto_spark.workload.visit_pipeline import process_visit  # noqa: E402


def t_construct(db, table):
    t0 = time.time()
    df = db._read(table)
    df.schema  # force analysis
    return round(time.time() - t0, 3)


def t_q1(db, pointing):
    t0 = time.time()
    db.get_dia_objects(pointing).count()
    return round(time.time() - t0, 3)


def main() -> None:
    spark = get_spark("probe_postcompact")
    root = tempfile.mkdtemp(prefix="apdb_probe_")
    pointing = Circle(40.0, -30.0, 1.76)
    db = ApdbSpark(spark, root)
    db.make_schema(drop=True)
    cat = rand_cone_xyz(spark, 10_000, pointing.ra, pointing.dec, pointing.radius_deg, seed=71).cache()
    cat.count()
    cfg = DiaConfig()
    t0v = datetime.datetime(2026, 1, 1, 3, 0)
    last_obj = 0
    for v in range(1, 13):
        t = t0v + datetime.timedelta(seconds=45 * v)
        det, last_obj = detect_sources(spark, cat, pointing, cfg, visit_seed=900 + v, last_object_id=last_obj)
        process_visit(db, v, t, det.select("diaObjectId", "ra", "dec"), pointing)
    out = {"file_counts": {t: max(db.partition_file_counts(t).values() or [0]) for t in ("DiaObject", "DiaObjectLast", "DiaSource", "DiaForcedSource")}}
    tables = ["DiaObject", "DiaObjectLast", "DiaSource", "DiaForcedSource"]
    out["steady_construct"] = {t: t_construct(db, t) for t in tables}
    out["steady_q1"] = t_q1(db, pointing)
    db.compact("DiaObject")
    db.compact("DiaObjectLast")
    out["postcompact_construct"] = {t: t_construct(db, t) for t in ("DiaObject", "DiaObjectLast")}
    # warm touch simulation: construct again — what a next visit sees when
    # the maintenance gap already re-listed
    out["warmed_construct"] = {t: t_construct(db, t) for t in ("DiaObject", "DiaObjectLast")}
    out["postcompact_q1"] = t_q1(db, pointing)
    out["warmed_q1"] = t_q1(db, pointing)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
