"""k-means iterative operator: objective must decrease monotonically
and assignments must be deterministic across runs."""

from pyspark.sql import functions as F

from citus_spark.operators.kmeans import (
    assign_clusters,
    kmeans,
    kmeans_cost,
    update_centroids,
)
from pyspark.sql.window import Window
from tests.conftest import SF_SMALL


def _vectors(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_objective_decreases(spark):
    v = _vectors(spark)
    cents = (
        v.orderBy("vec_id")
        .limit(4)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).cast("int").alias(
                "cluster_id"
            ),
            F.col("embedding").alias("centroid"),
        )
    )
    costs = []
    for _ in range(3):
        assigned = assign_clusters(v, cents)
        costs.append(kmeans_cost(assigned))
        cents = update_centroids(assigned).localCheckpoint(eager=True)
    # Lloyd's algorithm: cost is non-increasing
    assert costs[0] >= costs[1] >= costs[2]
    assert costs[2] < costs[0]  # made actual progress on this data


def test_kmeans_deterministic(spark):
    v = _vectors(spark)
    a1, c1 = kmeans(v, k=4, n_iter=2)
    a2, c2 = kmeans(v, k=4, n_iter=2)
    m1 = {r.vec_id: r.cluster_id for r in a1.collect()}
    m2 = {r.vec_id: r.cluster_id for r in a2.collect()}
    assert m1 == m2


def test_every_vector_assigned_once(spark):
    v = _vectors(spark)
    assigned, _ = kmeans(v, k=4, n_iter=1)
    assert assigned.count() == v.count()
    assert assigned.select("vec_id").distinct().count() == v.count()
