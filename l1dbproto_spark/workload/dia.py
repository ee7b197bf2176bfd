"""DIA — difference-image-analysis simulation as DataFrame transforms.

Re-expresses ``DIA.py:60-88`` of the reference:
* cone cross-match of the pointing against the variable-source catalog
  (``DIA.py:72-77``: ``inner(pointing, vars) > cos(open_angle/2)``) — J1;
* Bernoulli detection sampling (``DIA.py:78-80``, ``config.py:70-73``) — F18;
* Poisson transient/false-positive counts (``DIA.py:82``) drawn driver-side
  (scalar per visit, like the reference) — F17;
* union of variables + transients (``DIA.py:85-86``) — U1.

Transient ID allocation (``ap_proto.py:286-291,329-332`` — W4) assigns
``high_water + 1..k`` via row_number over a deterministic ordering.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.geo import cone_contains_xyz
from ..plans.region import Circle
from ..workload.generators import rand_cone_xyz, with_radec

TRANSIENT_START_ID = 1_000_000_000  # ap_proto.py:84, _executors.py:61


@dataclass
class DiaConfig:
    fov_deg: float = 3.52  # config.py:36
    detection_fraction: float = 1.0  # config.py:70-73
    false_per_visit: int = 5050  # config.py:39
    transient_per_visit: int = 100  # config.py:38


def detect_sources(
    spark: SparkSession,
    var_sources: DataFrame,
    pointing: Circle,
    cfg: DiaConfig,
    visit_seed: int,
    last_object_id: int,
) -> tuple[DataFrame, int]:
    """One visit's detections: (DataFrame[diaObjectId, ra, dec, is_transient],
    new_last_object_id).

    The variable-source side is a filter over the (broadcast-friendly) shared
    catalog — no shuffle; the transient side is generated in the cone. The
    returned id high-water mark is exact: transient count is drawn
    driver-side (Poisson, seeded), mirroring the reference's driver-side
    draw (``DIA.py:82``)."""
    c = pointing.center_xyz()
    detected = var_sources.filter(
        cone_contains_xyz(F.col("x"), F.col("y"), F.col("z"), c, pointing.radius_deg)
    )
    if cfg.detection_fraction < 1.0:
        detected = detected.filter(F.rand(visit_seed) < cfg.detection_fraction)
    variables = with_radec(detected).select(
        F.col("source_idx").alias("diaObjectId"),
        "ra",
        "dec",
        F.lit(False).alias("is_transient"),
    )

    rng = np.random.default_rng(visit_seed)
    n_trans = int(rng.poisson(cfg.transient_per_visit + cfg.false_per_visit))
    start = max(last_object_id, TRANSIENT_START_ID - 1)
    transients = with_radec(
        rand_cone_xyz(
            spark,
            n_trans,
            pointing.ra,
            pointing.dec,
            pointing.radius_deg,
            seed=visit_seed + 7,
        )
    ).select(
        (F.col("source_idx") + F.lit(start + 1)).alias("diaObjectId"),
        "ra",
        "dec",
        F.lit(True).alias("is_transient"),
    )
    return variables.unionByName(transients), start + n_trans
