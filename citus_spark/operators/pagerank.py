"""Distributed PageRank in exact integer fixed-point arithmetic.

Graph analytics is part of the reference's recursive-query surface
(SURVEY §1.4 / §2.3 — users run iterative graph queries through
recursive CTEs, e.g. the reachability patterns
operators/recursive.py covers); PageRank is the canonical iterative
extension of that family, and the entity-importance signal a
training-data pipeline uses to weight sources.

Why integer fixed-point: float PageRank sums are order-dependent, so
results drift across partitionings and engines. Here ranks are
BIGINT in units of 1e-12 (SCALE = 10^12) and every step is integer
arithmetic — `rank div outdeg` per edge, exact BIGINT sums, damping
as (85 * s) div 100 — so the result is BIT-IDENTICAL under any
partitioning AND independently re-derivable by another engine (the
DuckDB oracle unrolls the same iterations in SQL). Quantization
error is bounded by iters * (1e-12 * max_degree) — noise at ranking
granularity.

Scale shape: per iteration one join on src (broadcastable degree
side), one shuffle on dst for the contribution sum. No driver-side
data motion at all — even the node count is the only collected
scalar. Lineage is cut with localCheckpoint every few rounds, the
same guard kmeans uses (operators/kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
DAMP_NUM = 85  # damping 0.85 as an integer percentage


def pagerank(edges: DataFrame, iters: int = 8,
             compact: bool = False) -> DataFrame:
    """edges(src BIGINT, dst BIGINT) → (node BIGINT, rank BIGINT).

    rank is in SCALE units; ranks of dangling-in nodes settle at the
    teleport base. Callers wanting an undirected walk pass both edge
    directions.

    ``compact=True`` (callers pass it below the corpus cutover, where
    the rank table is trivially broadcastable) removes every
    PER-ITERATION shuffle (guide §2.4): the static degree join is
    paid once, the edge table is hash-partitioned by ``dst`` once and
    cached, and each iteration then broadcasts the small rank table
    into the pre-partitioned edges — the contribution aggregation
    reuses the dst partitioning (alias-aware output partitioning), so
    no exchange remains inside the loop. The arithmetic is untouched
    and integer-exact (order-free BIGINT sums), so ranks are
    bit-identical to the default path under any partitioning. At
    scale ``compact`` must stay off: ranks has one row per node and
    cannot be broadcast."""
    edges = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()  # the single bounded driver scalar
    init = SCALE // n
    base = (15 * init) // 100
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    if compact:
        # one-time: degree attached per edge, partitioned by dst so
        # the per-iteration contribution sum never re-shuffles
        edges_deg = (
            edges.join(deg, "src")
            .select("src", "dst", "outdeg")
            .repartition("dst")
            .cache()
        )
        for i in range(iters):
            contrib = edges_deg.join(
                F.broadcast(ranks), edges_deg.src == ranks.node
            ).select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
            summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
            ranks = nodes.join(
                F.broadcast(summed), "node", "left"
            ).select(
                "node",
                F.coalesce(
                    F.lit(base) + F.expr(f"({DAMP_NUM} * s) div 100"),
                    F.lit(base).cast("long"),
                ).alias("rank"),
            )
            if i % 3 == 2:
                ranks = ranks.localCheckpoint(eager=True)
        return ranks
    for i in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            F.coalesce(
                F.lit(base) + F.expr(f"({DAMP_NUM} * s) div 100"),
                F.lit(base).cast("long"),
            ).alias("rank"),
        )
        if i % 3 == 2:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
