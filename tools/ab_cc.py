"""Interleaved same-session A/B: r14 min-label CC vs r15 star-contraction CC
on the four CC-consuming bench paths, at two SFs (r14 VERDICT item 7: sf0.1
headline numbers are overhead-bound, so every r15 A/B quotes both SFs).

Usage: python tools/ab_cc.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from l1dbproto_spark.operators import corpus as corpus_mod
from l1dbproto_spark.operators import graph as graph_mod
from l1dbproto_spark.queries import load_all
from l1dbproto_spark.session import get_spark

STAR = graph_mod.connected_components_star
MINLABEL = graph_mod.connected_components


def set_arm(arm: str) -> None:
    fn = STAR if arm == "star" else MINLABEL
    graph_mod.connected_components = fn
    corpus_mod.connected_components = fn  # top-level import in corpus.py


def make_media_2k(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    bases = [rng.integers(0, 256, (32, 32, 3)).astype("uint8") for _ in range(200)]
    rows = []
    for i in range(2000):
        b = bases[i % 200]
        if i >= 200:
            b = np.clip(
                b.astype("int16") + rng.integers(-2, 3, b.shape), 0, 255
            ).astype("uint8")
        rows.append((i, b"P6 32 32 255\n" + b.tobytes()))
    return spark.createDataFrame(
        rows, "media_id long, payload binary"
    ).localCheckpoint()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_cc")
    sc = spark.sparkContext
    specs = load_all()

    from l1dbproto_spark.operators.multimodal import image_dedup_clusters

    media = make_media_2k(spark)

    def thunks(sf_dir):
        return {
            f"dedup_clusters@{os.path.basename(sf_dir)}": lambda: specs[
                "dedup_clusters"
            ].builder(spark, sf_dir).count(),
            f"image_dedup_families@{os.path.basename(sf_dir)}": lambda: specs[
                "image_dedup_families"
            ].builder(spark, sf_dir).count(),
            f"weburl_dedup_mix@{os.path.basename(sf_dir)}": lambda: specs[
                "weburl_dedup_mix"
            ].builder(spark, sf_dir).count(),
        }

    cases = {}
    cases.update(thunks("/root/testdata/sf0.1"))
    cases.update(thunks("/root/testdata/sf0.01"))
    cases["image_dedup_2k"] = lambda: image_dedup_clusters(media).count()

    # warm both arms once per case (codegen/page-cache; bench methodology)
    for name, t in cases.items():
        for arm in ("minlabel", "star"):
            set_arm(arm)
            t()

    results = {n: {"minlabel": [], "star": []} for n in cases}
    jobs = {n: {"minlabel": None, "star": None} for n in cases}
    rows = {n: {"minlabel": None, "star": None} for n in cases}
    for rep in range(reps):
        for arm in ("minlabel", "star"):
            set_arm(arm)
            for name, t in cases.items():
                j0 = len(sc.statusTracker().getJobIdsForGroup(None))
                t0 = time.time()
                n_rows = t()
                dt = time.time() - t0
                j1 = len(sc.statusTracker().getJobIdsForGroup(None))
                results[name][arm].append(round(dt, 3))
                jobs[name][arm] = j1 - j0
                rows[name][arm] = n_rows

    print("case | arm | reps | min | med | jobs | rows")
    for name in cases:
        for arm in ("minlabel", "star"):
            r = sorted(results[name][arm])
            print(
                f"{name} | {arm} | {results[name][arm]} | {r[0]:.3f} | "
                f"{r[len(r) // 2]:.3f} | {jobs[name][arm]} | {rows[name][arm]}"
            )
        assert rows[name]["minlabel"] == rows[name]["star"], name


if __name__ == "__main__":
    main()
