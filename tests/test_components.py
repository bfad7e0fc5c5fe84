"""Connected components on known graphs."""

from citus_spark.operators.components import connected_components


def test_chain_and_islands(spark):
    # components: {1..5} chain, {10,11}, {20,21,22} triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a bigint, doc_b bigint",
    )
    got = {
        r.doc_id: r.component for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_long_path_converges(spark):
    # a 30-node path exercises multi-round propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 130)], "doc_a bigint, doc_b bigint"
    )
    got = {r.doc_id: r.component for r in connected_components(edges).collect()}
    assert set(got.values()) == {100}
    assert len(got) == 31
