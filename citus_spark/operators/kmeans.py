"""Distributed k-means over embedding columns — the iterative-algorithm
class (not SQL-expressible; driver loops over DataFrame plans).

Each iteration is two shuffle-free-ish stages:
  1. assign: broadcast the K centroids, score every vector JVM-side
     (sequential-fold dot products — no Python), argmin via
     least-of-structs;
  2. update: per-dimension mean of member vectors via posexplode →
     groupBy(cluster, dim) partial/final agg → re-assemble arrays.

At 100 TB the broadcast is K×d doubles (tiny) and the update is one
shuffle keyed on (cluster, dim) — the canonical scalable formulation.
Deterministic: init = first K vectors by vec_id, ties broken by
centroid id, so runs are reproducible (required for tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sq_dist_expr(a: str, b: str) -> str:
    """Squared L2 distance between two float arrays, sequential fold."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def assign_clusters(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding) × (cluster_id, centroid) → nearest cluster
    per vector. Broadcast join + window argmin."""
    scored = vectors.join(F.broadcast(centroids)).select(
        "vec_id",
        "embedding",
        "cluster_id",
        F.expr(_sq_dist_expr("embedding", "centroid")).alias("d2"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cluster_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "embedding", "cluster_id", "d2")
    )


def update_centroids(assigned: DataFrame) -> DataFrame:
    """Per-cluster mean vector via positional explode + reassembly."""
    longform = assigned.select(
        "cluster_id", F.posexplode("embedding").alias("dim", "x")
    )
    dim_means = longform.groupBy("cluster_id", "dim").agg(
        (F.sum(F.col("x").cast("double")) / F.count("*")).alias("m")
    )
    return dim_means.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))),
            lambda s: s["m"].cast("float"),
        ).alias("centroid")
    )


def kmeans(
    vectors: DataFrame, k: int = 8, n_iter: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Run k-means; returns (assignments, centroids). Deterministic
    init: the first k vectors by vec_id."""
    centroids = (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy("vec_id"))
            .cast("int")
            .alias("cluster_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    assigned = None
    for _ in range(n_iter):
        assigned = assign_clusters(vectors, centroids)
        centroids = update_centroids(assigned)
        # materialize each iteration's centroids: breaks the growing
        # lineage (essential for iterative algorithms on Spark)
        centroids = centroids.localCheckpoint(eager=True)
    assigned = assign_clusters(vectors, centroids)
    return assigned, centroids


def kmeans_cost(assigned: DataFrame) -> float:
    """Sum of squared distances — the objective k-means minimizes."""
    return assigned.agg(F.sum("d2")).collect()[0][0]
