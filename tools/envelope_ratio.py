"""Quantify the pixel-envelope over-approximation ratio — the planner's
main read-path tuning lever (VERDICT r13 task 7 / PERFORMANCE.md
known-costs). For the bench pointing (the ap_visit FOV, radius 1.76°)
and a few other radii, measure at quad-cube levels 7 and 8:

  ratio = P(point in envelope) / P(point in exact cone)

over a dense uniform sample of a 3×-radius surrounding cap (so the
envelope's slop has background points to over-select — sampling only
the cone itself would report 1.0 by construction). Also reports the
planner-side cost: number of merged ranges and envelope cells.

The ratio is what the coarse scan READS; the exact refine discards the
rest, so (ratio − 1) is pure wasted I/O. Prints one JSON line; the
measured pair is recorded in PERFORMANCE.md."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from l1dbproto_spark.functions.pixelize import (
    cone_envelope_ranges,
    pixel_expr,
    ranges_predicate,
)
from l1dbproto_spark.plans.region import Circle
from l1dbproto_spark.session import get_spark
from l1dbproto_spark.workload.generators import rand_cone_xyz


def measure(spark, pointing: Circle, level: int, n: int = 400_000) -> dict:
    sample = rand_cone_xyz(
        spark,
        n,
        pointing.ra,
        pointing.dec,
        min(pointing.radius_deg * 3.0, 89.0),
        seed=7,
    )
    ranges = pointing.pixel_ranges(level, max_ranges=64)
    pix = pixel_expr(F.col("x"), F.col("y"), F.col("z"), level)
    # exact containment from the unit vector: cos(angle to axis) >= cos r
    import math

    ax, ay, az = pointing.center_xyz()
    cos_r = math.cos(math.radians(pointing.radius_deg))
    exact = (
        F.col("x") * ax + F.col("y") * ay + F.col("z") * az
    ) >= F.lit(cos_r)
    row = sample.select(
        F.sum(ranges_predicate(pix, ranges).cast("long")).alias("env"),
        F.sum(exact.cast("long")).alias("cone"),
        F.sum((ranges_predicate(pix, ranges) & ~exact).cast("long")).alias(
            "waste"
        ),
    ).first()
    n_cells = sum(hi - lo for lo, hi in ranges)
    return {
        "level": level,
        "n_ranges": len(ranges),
        "n_cells": n_cells,
        "envelope_hits": row.env,
        "cone_hits": row.cone,
        "ratio": round(row.env / row.cone, 4) if row.cone else None,
        "wasted_fraction": round(row.waste / row.env, 4) if row.env else None,
    }


def main() -> None:
    spark = get_spark("envelope_ratio")
    out = []
    for radius in (1.76, 0.5, 5.0):
        pointing = Circle(40.0, -30.0, radius)
        for level in (7, 8):
            m = measure(spark, pointing, level)
            m["radius_deg"] = radius
            out.append(m)
    print(json.dumps({"metric": "envelope_ratio", "measurements": out}))


if __name__ == "__main__":
    main()
