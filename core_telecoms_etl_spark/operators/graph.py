"""Iterative graph operators: connected components via min-label
propagation — the step that turns near-dup PAIRS into dedup CLUSTERS
(keep one representative per component).

Spark has no native recursion; the idiomatic pattern (same as
GraphX/Pregel and GraphFrames under the hood) is a driver-coordinated
loop of joins with the lineage cut every iteration:

- each node starts labeled with its own id;
- every iteration, each node takes the min label among itself and its
  neighbors (one join edges⋈labels + one groupBy min);
- stop when an iteration changes no label (convergence ≤ graph diameter
  iterations — near-dup clusters are tiny cliques, so 2-3 in practice).

Scale notes: labels/edges shuffle on node id each iteration; at 100 TB
`localCheckpoint` becomes `checkpoint` to an HDFS dir (it exists to cut
the exponentially-growing join lineage either way), and big components
call for the large-star/small-star variant — same loop skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) — component = min node id reachable through the
    undirected edge set. Deterministic; raises if not converged within
    max_iter (diameter bound exceeded)."""
    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()  # cut the per-iteration join lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .isEmpty()
        )
        labels = new_labels
        if changed:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iter} iterations")
