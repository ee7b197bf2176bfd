"""Measure the core_numbers plain-vs-frontier crossover (r9 verdict item 7).

The frontier=True variant prunes each round's h-recomputation to nodes
adjacent to the previous round's changed set, at the cost of two extra
semi-joins + a distinct + a pin per round. The docstring claims it "wins
at scale"; this script MEASURES where, on three sizes of the bench
co-purchase graph:

  x1   = the bench subset (l_orderkey % 10 == 0) at $SPARK_GRAFT_SF_DIR
  x10  = the full co-purchase graph at the same SF
  x100 = ten disjoint node-offset copies of the full graph (10x the data
         volume with the identical convergence structure — isolating the
         data-volume axis the pruning is supposed to help with)
  tail = x100 UNION a 60-node path: the path's end-degree-1 correction
         creeps inward one node per round (~30 rounds with a ~4-node
         frontier), while the bulk settles in a few — the long
         SMALL-frontier convergence tail. Plain pays a full-graph
         recomputation for every tail round; frontier skips the settled
         bulk. This is the regime the frontier flag exists for.

Usage: python tools/coreness_crossover.py   (prints one JSON line; paste
the numbers into PERFORMANCE.md's crossover section)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from l1dbproto_spark.operators.graph import core_numbers
from l1dbproto_spark.session import get_spark
from l1dbproto_spark.sources.catalog import load_table


def copurchase_edges(spark, sf_dir, subset: bool):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25)
    if subset:
        li = li.filter(F.col("l_orderkey") % 10 == 0)
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


def replicate(edges, copies: int, offset: int = 10_000_000):
    out = edges
    for k in range(1, copies):
        out = out.unionByName(
            edges.select(
                (F.col("u") + k * offset).alias("u"),
                (F.col("v") + k * offset).alias("v"),
            )
        )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("coreness_crossover")
    shapes = {}
    sub = copurchase_edges(spark, sf_dir, subset=True).cache()
    full = copurchase_edges(spark, sf_dir, subset=False).cache()
    shapes["x1"] = sub
    shapes["x10"] = full
    shapes["x100"] = replicate(full, 10)
    path = spark.range(59).select(
        (F.col("id") + 900_000_000).alias("u"),
        (F.col("id") + 900_000_001).alias("v"),
    )
    shapes["tail"] = replicate(full, 10).unionByName(path)
    result = {}
    for tag, edges in shapes.items():
        n_edges = edges.count()  # also warms the cached frames
        row = {"edges": n_edges}
        for frontier in (False, True):
            t0 = time.time()
            n = core_numbers(edges, "u", "v", frontier=frontier).count()
            row["frontier" if frontier else "plain"] = round(time.time() - t0, 2)
            row["nodes"] = n
        result[tag] = row
    print(json.dumps({"sf_dir": sf_dir, "coreness_crossover": result}))


if __name__ == "__main__":
    main()
