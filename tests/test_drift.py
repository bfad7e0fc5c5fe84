"""Embedding distribution-shift detection (operators/drift.py)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_drift_zero_on_identical_slices(spark, emb):
    from citus_spark.operators.drift import embedding_drift

    d = embedding_drift(emb, emb, "embedding")
    assert d["mean_shift_sq_e6"] == 0
    assert d["max_coord_shift_e6"] == 0
    assert d["max_var_ratio_e6"] == 1_000_000  # ratio exactly 1.0


def test_drift_partitioning_invariance(spark, emb):
    from citus_spark.operators.drift import embedding_drift

    a = emb.filter("vec_id % 2 = 0")
    b = emb.filter("vec_id % 2 = 1")
    d1 = embedding_drift(a.repartition(1), b.repartition(1), "embedding")
    d32 = embedding_drift(
        a.repartition(32), b.repartition(32), "embedding"
    )
    assert d1 == d32  # int sums are order-free → bit-identical stats


def test_drift_detects_a_planted_shift(spark, emb):
    from citus_spark.operators.drift import embedding_drift

    shifted = emb.withColumn(
        "embedding",
        F.expr("transform(embedding, x -> x + CAST(0.5 AS FLOAT))"),
    )
    base = embedding_drift(
        emb.filter("vec_id % 2 = 0"),
        emb.filter("vec_id % 2 = 1"),
        "embedding",
    )
    drift = embedding_drift(emb, shifted, "embedding")
    # a uniform +0.5 on 64 coords: mean shift² ≈ 64·0.25 = 16
    assert drift["mean_shift_sq_e6"] > 10_000_000
    assert drift["mean_shift_sq_e6"] > 100 * base["mean_shift_sq_e6"]
    assert drift["max_coord_shift_e6"] == pytest.approx(500_000, rel=0.01)


def test_drift_empty_slice_rejected(spark, emb):
    from citus_spark.operators.drift import embedding_drift

    with pytest.raises(ValueError, match="empty"):
        embedding_drift(emb, emb.filter("vec_id < 0"), "embedding")
