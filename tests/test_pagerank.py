"""Integer fixed-point PageRank (operators/pagerank.py): exactness
under partitioning, convergence direction, and a hand-checkable
two-node closed form."""

import pytest

from citus_spark.operators.pagerank import SCALE, pagerank


def _edges(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "src long, dst long")
    return df.repartition(parts) if parts else df


def test_partitioning_invariance(spark):
    rows = [(i % 7, (i * 3 + 1) % 7) for i in range(30)] + [
        (6, 0),
        (5, 2),
    ]
    a = {
        (r.node, r.rank)
        for r in pagerank(_edges(spark, rows, 1), iters=6).collect()
    }
    b = {
        (r.node, r.rank)
        for r in pagerank(_edges(spark, rows, 13), iters=6).collect()
    }
    assert a == b  # bit-identical, not approximately equal


def test_two_node_symmetric_fixed_point():
    # analytic check of the integer arithmetic, no Spark needed: the
    # symmetric 2-cycle has uniform rank SCALE/2; verify the update
    # formula reproduces it exactly (base + 85% of SCALE/2)
    init = SCALE // 2
    base = (15 * init) // 100
    nxt = base + (85 * init) // 100
    assert abs(nxt - init) <= 1  # fixed point up to quantization


def test_two_node_cycle_spark(spark):
    out = {
        r.node: r.rank
        for r in pagerank(
            _edges(spark, [(1, 2), (2, 1)]), iters=5
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1] == out[2]  # symmetry is exact in integer arithmetic
    assert out[1] == pytest.approx(SCALE // 2, rel=1e-6)


def test_sink_heavy_node_ranks_higher(spark):
    # star graph: everyone points at 0, 0 points back at 1. The true
    # fixed point has r0 ≈ 0.473 > r1 ≈ 0.427 (solve r0 = b + .85(r1
    # + 4b), r1 = b + .85 r0), but the 0↔1 cycle OSCILLATES with
    # amplitude decaying by 0.85² per round — so this needs enough
    # iterations to converge past the swing, unlike the default 8
    rows = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    out = {
        r.node: r.rank
        for r in pagerank(_edges(spark, rows), iters=30).collect()
    }
    assert out[0] == max(out.values())
    assert out[0] == pytest.approx(0.4730 * SCALE, rel=1e-2)
    assert out[1] == pytest.approx(0.4271 * SCALE, rel=1e-2)
    assert out[2] == out[3] == out[4] == out[5]


def test_mass_approximately_conserved(spark):
    rows = [(i, (i + 1) % 9) for i in range(9)]
    out = pagerank(_edges(spark, rows), iters=8).collect()
    total = sum(r.rank for r in out)
    # integer division only LOSES mass, boundedly
    assert 0 <= SCALE - total < 10**7


def test_bfs_hops_exact_small_graph(spark):
    from citus_spark.operators.bfs import bfs_hops

    # path 1-2-3-4 plus a shortcut 1-4
    rows = [(1, 2), (2, 3), (3, 4), (1, 4)]
    edges = spark.createDataFrame(
        rows + [(b, a) for a, b in rows], "src long, dst long"
    )
    out = {r.node: r.hops for r in bfs_hops(edges, [1], 5).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 1}


def test_bfs_hop_bound_and_partitioning(spark):
    from citus_spark.operators.bfs import bfs_hops

    chain = [(i, i + 1) for i in range(10)]
    edges1 = spark.createDataFrame(chain, "src long, dst long")
    edges2 = edges1.repartition(7)
    a = {r.node: r.hops for r in bfs_hops(edges1, [0], 4).collect()}
    b = {r.node: r.hops for r in bfs_hops(edges2, [0], 4).collect()}
    assert a == b
    assert max(a.values()) == 4 and 5 not in a  # bound respected


def test_compact_loop_is_bit_identical_and_shuffle_free(spark):
    # r12: below the corpus cutover the compact loop broadcasts the
    # rank table into dst-partitioned cached edges — bit-identical
    # ranks (integer fixed-point, order-free sums) with no shuffled
    # join anywhere in the loop.
    rows = [(i, (i * 3 + 1) % 17) for i in range(17)] + [(4, 9), (9, 2)]
    edges = _edges(spark, rows)
    classic = pagerank(edges, iters=8, compact=False)
    compact = pagerank(edges, iters=8, compact=True)
    a = sorted((r.node, r.rank) for r in classic.collect())
    b = sorted((r.node, r.rank) for r in compact.collect())
    assert a == b
    plan = compact._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" not in plan
    assert "SortMergeJoin" not in plan
