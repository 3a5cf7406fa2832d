"""Connected components over a DataFrame edge list (SURVEY §2.11 —
the clustering step of near-dup dedup: pairwise similar docs → groups).

Iterative min-label propagation: every node starts labeled with itself;
each round a node adopts the minimum label among itself and its
neighbors; fixpoint when no label changes. Rounds are bounded by the
largest component's diameter.

Scale contract (the d08 lessons, VERDICT r1):
- each round is one shuffle (join + groupBy on node);
- `localCheckpoint` after every round truncates lineage, so the logical
  plan stays one-round deep no matter how many rounds run — without it
  analysis/optimization cost grows per iteration and deep-diameter
  graphs stall the driver;
- the edge list is cached once and reused every round (it never
  changes), so only label rows move per iteration.

The reference has no graph surface; this backs `d08_dup_clusters`
(plans/dedup2.py) and is exposed for pipeline use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iters: int = 20,
) -> DataFrame:
    """Label each node of the undirected graph `edges` with the minimum
    node id in its component. Returns (node, label).

    `edges` may list each pair once in either direction; symmetry is
    added internally. Nodes must be orderable (min-label semantics).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    both = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).cache()
    both.count()  # materialize: read twice per round
    nodes = both.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint()
    for _ in range(max_iters):
        msgs = both.join(labels, both.a == labels.node).select(
            F.col("b").alias("node"), "label"
        )
        new_labels = (
            labels.select("node", "label")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # loop exhausted WITHOUT converging: the graph has a component
        # whose label-propagation diameter exceeds max_iters, and
        # returning here would silently split it into several
        # components (near-dup chains are exactly this shape)
        both.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations ({changed} labels still changing) — raise "
            "max_iters; the component diameter exceeds it"
        )
    both.unpersist()
    return labels
