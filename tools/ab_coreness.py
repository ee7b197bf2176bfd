#!/usr/bin/env python
"""core_numbers algorithmic A/B (VERDICT r14 item 2): h-index fixpoint
(shipped, unroll sweep) vs bucket-peeling k-core decomposition, at two
graph scales, fresh numbers on this host.

Arms:
  * hindex-u2 / hindex-u4 / hindex-u6 — the shipped operator at several
    unroll depths (the round-count lever the r10-r14 ledgers measured);
  * peel — bucket peeling: repeatedly assign core=k to every node whose
    current degree <= k (k = running max of the remaining min degree),
    remove them, cascade. Exact by construction (standard sequential
    peeling batched per k-bound); rounds = total cascade count.

Scales (same co-purchase derivation as the bench extra):
  * x1  — the bench graph (1-in-10 orders subset at sf0.1, ~33k edges)
  * x10 — full sf0.1 lineitem co-purchase graph (~325k edges)

Usage: python tools/ab_coreness.py [arms...]   (default: all, x1 then x10)
Prints one JSON line per (arm, scale) with wall seconds and a checksum
(sum of core values + node count) so exactness across arms is visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from l1dbproto_spark.operators.graph import canonical_edges, core_numbers  # noqa: E402
from l1dbproto_spark.checkpoint import pin  # noqa: E402
from l1dbproto_spark.session import get_spark  # noqa: E402
from l1dbproto_spark.sources.catalog import load_table  # noqa: E402


def core_numbers_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 10_000,
) -> DataFrame:
    """(node, core) by distributed bucket peeling: each round removes
    EVERY node whose degree in the remaining graph is <= the current
    bound k (k = running max of the observed min remaining degree, so
    cascades stay at the same k until exhausted). Exact: identical to
    sequential min-degree peeling, batched."""
    e = canonical_edges(edges, src, dst)
    und = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).transform(pin, eager=False)
    out: list[DataFrame] = []
    cur = und
    k = 0
    for _ in range(max_rounds):
        degs = cur.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).transform(
            pin, eager=False
        )
        row = degs.agg(
            F.min("deg").alias("mn"), F.count(F.lit(1)).alias("n")
        ).head()
        if row["n"] == 0:
            break
        k = max(k, row["mn"])
        peel = degs.filter(F.col("deg") <= k).select(
            F.col("u").alias("node")
        ).transform(pin, eager=True)
        out.append(peel.select("node", F.lit(k).cast("long").alias("core")))
        cur = (
            cur.join(peel.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(peel.withColumnRenamed("node", "v"), "v", "left_anti")
            .transform(pin, eager=False)
        )
    else:
        raise RuntimeError("peeling did not finish")
    res = out[0]
    for d in out[1:]:
        res = res.unionAll(d)
    return res


def co_purchase_edges(spark, sf_dir: str, modulus: int | None):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25)
    if modulus:
        li = li.filter(F.col("l_orderkey") % modulus == 0)
    li = li.select("l_orderkey", "l_partkey")
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )


ARMS = {
    "hindex-u2": lambda e: core_numbers(e, "u", "v", unroll=2),
    "hindex-u4": lambda e: core_numbers(e, "u", "v", unroll=4),
    "hindex-u6": lambda e: core_numbers(e, "u", "v", unroll=6),
    "peel": lambda e: core_numbers_peel(e, "u", "v"),
}


def main() -> None:
    arms = sys.argv[1:] or list(ARMS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_coreness")
    sc = spark.sparkContext
    for scale, modulus in (("x1", 10), ("x10", None)):
        edges = co_purchase_edges(spark, sf_dir, modulus).transform(
            pin, eager=True
        )
        n_edges = edges.count()
        for arm in arms:
            fn = ARMS[arm]
            fn(edges).count()  # untimed warm rep
            reps = []
            chk = None
            for _ in range(2):
                sc.setJobDescription(f"coreness {arm} {scale}")
                t0 = time.time()
                res = fn(edges)
                chk_row = res.agg(
                    F.sum("core").alias("s"), F.count(F.lit(1)).alias("n")
                ).head()
                reps.append(round(time.time() - t0, 3))
                chk = (int(chk_row["s"]), int(chk_row["n"]))
                sc.setJobDescription(None)
            print(
                json.dumps(
                    {
                        "arm": arm,
                        "scale": scale,
                        "n_edges": n_edges,
                        "reps": reps,
                        "min": min(reps),
                        "checksum": chk,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
