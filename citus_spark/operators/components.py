"""Connected components over candidate-duplicate pairs → duplicate
clusters.

The final step of the near-dup pipeline: LSH emits candidate pairs,
verification keeps true duplicates, and connected components groups
them into clusters with a canonical representative (min doc_id) for
keep-one-per-cluster dedup.

Algorithm: iterative min-label propagation (the standard Pregel-style
formulation as DataFrame joins — each round is one shuffle keyed on
the edge endpoint; rounds needed = graph diameter, and localCheckpoint
truncates lineage per round). Deterministic: labels only decrease,
fixpoint is the per-component minimum id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 20
) -> DataFrame:
    """(src,dst) undirected edges → (doc_id, component) with
    component = min doc_id in the component. Nodes = edge endpoints."""
    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    both = both.distinct().persist()

    labels = (
        both.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # candidate labels arriving over edges
        prop = (
            both.join(labels, both.v == labels.doc_id)
            .select(F.col("u").alias("doc_id"), "component")
        )
        merged = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
        )
        # pointer doubling: follow component -> its component, halving
        # label-propagation distance each round (O(log diameter) rounds
        # instead of O(diameter) — essential for long chains)
        reps = merged.select(
            F.col("doc_id").alias("rep_id"), F.col("component").alias("rep_comp")
        )
        new_labels = (
            merged.join(reps, merged.component == reps.rep_id, "left")
            .select(
                "doc_id",
                F.least(F.col("component"), F.col("rep_comp")).alias("component"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    both.unpersist()
    return labels
