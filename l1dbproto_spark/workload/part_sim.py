"""Partitioning Monte-Carlo study — the reference's ``part_sim``
(``part_sim.py:52-140``, SURVEY §3.3 4th entry point): for N random pointings,
measure how many spatial partitions / pixel ranges a region query touches,
and the points-per-partition distribution (A8).

The reference prints means over MC trials; here the per-trial stats become a
DataFrame so the same A8 aggregations run distributed, and the planner stats
(`num_sp_part` / `num_queries`, ``metrics.md:43-44``) are measured for OUR
envelope planner."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.pixelize import DEFAULT_LEVEL, cone_envelope_ranges


@dataclass
class TrialStats:
    trial: int
    ra: float
    dec: float
    n_ranges: int  # num_queries analog
    n_pixels: int  # num_sp_part analog
    envelope_deg2: float


def run_partition_study(
    n_trials: int = 100,
    fov_deg: float = 3.52,
    level: int = DEFAULT_LEVEL,
    max_ranges: int = 64,
    seed: int = 42,
) -> list[TrialStats]:
    """Driver-side MC over random southern pointings (like the reference's
    random pointings, ``ap_proto.py:306-309``)."""
    rng = np.random.default_rng(seed)
    out = []
    pixel_area_deg2 = 4 * 180.0**2 / np.pi / (6 * (1 << level) ** 2)
    for t in range(n_trials):
        z = -rng.random()  # southern hemisphere
        phi = rng.random() * 2 * np.pi
        dec = float(np.degrees(np.arcsin(z)))
        ra = float(np.degrees(phi))
        ranges = cone_envelope_ranges(ra, dec, fov_deg / 2, level, max_ranges)
        n_pix = sum(hi - lo for lo, hi in ranges)
        out.append(
            TrialStats(t, ra, dec, len(ranges), n_pix, n_pix * pixel_area_deg2)
        )
    return out


def summarize(spark, stats: list[TrialStats]):
    """A8 aggregation of the trial stats as a DataFrame."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(s.trial, s.ra, s.dec, s.n_ranges, s.n_pixels, s.envelope_deg2) for s in stats],
        "trial int, ra double, dec double, n_ranges int, n_pixels int, envelope_deg2 double",
    )
    return df.agg(
        F.avg("n_ranges").alias("avg_ranges"),
        F.max("n_ranges").alias("max_ranges"),
        F.avg("n_pixels").alias("avg_pixels"),
        F.avg("envelope_deg2").alias("avg_envelope_deg2"),
    )
