"""Iterative graph operators: connected components for dedup clustering.

Near-dup pairs (from Jaccard / MinHash / embedding similarity) form an
undirected graph; the dedup *clusters* are its connected components, and the
canonical document of each cluster is the minimum doc id. Implemented as
driver-looped min-label propagation — each iteration is one join + aggregate,
converging in O(diameter) rounds (dedup clusters are tiny: diameter 1-3).

This is the one operator family where the driver loop is idiomatic even at
scale (GraphX/GraphFrames do the same under the hood); each round is a full
distributed job, the driver only checks the convergence counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    ``edges`` is undirected (each pair once). Isolated nodes don't appear —
    callers union them back with component = own id if needed."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    undirected = fwd.unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    # initial label: min neighbor (or self) — then propagate mins
    labels = (
        undirected.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("label"))
        .select(F.col("u").alias("node"), "label")
    )
    undirected = undirected.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        # candidate: min of own label and neighbors' labels
        neighbor_labels = (
            undirected.join(
                labels.withColumnRenamed("node", "v").withColumnRenamed(
                    "label", "nlabel"
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nlabel").alias("nmin"))
            .select(F.col("u").alias("node"), "nmin")
        )
        new_labels = (
            labels.join(neighbor_labels, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))
