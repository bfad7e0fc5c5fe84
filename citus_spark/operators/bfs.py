"""Distributed BFS: minimum hop count from a source set.

The level-synchronous formulation: each round joins the current
distance table to the edge list and keeps the per-node minimum — the
standard distributed-BFS shape (hop-bounded, one shuffle per round,
never a transitive-closure materialization). All-integer state makes
the result exact and independently re-derivable (the query-side
oracle is a DuckDB recursive CTE with UNION-dedup over (node, dist)).

↔ reference: the recursive-CTE traversal family
(operators/recursive.py covers the generic fixpoint; this is the
shortest-path specialization a graph workload actually runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame, sources: list[int], max_hops: int = 8
) -> DataFrame:
    """edges(src, dst) + source node ids → (node, hops) for every
    node reachable within max_hops (minimum hop count, exact)."""
    spark = edges.sparkSession
    edges = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).cache()
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sources], "node long, hops int"
    )
    for i in range(max_hops):
        frontier = dist.filter(F.col("hops") == i)
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), F.lit(i + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("hops").cast("int").alias("hops"))
        )
        if i % 3 == 2:
            dist = dist.localCheckpoint(eager=True)
    return dist
