"""Unit tests: generic recursive CTE and GROUPS-frame emulation."""

import pytest
from pyspark.sql import functions as F


def test_recursive_cte_transitive_closure_with_cycle(spark):
    """A cyclic graph must still converge (UNION-distinct semantics):
    reachability saturates and the fixpoint test stops the loop."""
    from citus_spark.operators.recursive import recursive_cte

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5)], "src int, dst int"
    )
    base = edges.selectExpr("src", "dst AS reach")

    def step(frontier):
        return (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.reach") == F.col("e.src"))
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("reach"))
        )

    got = {
        (r.src, r.reach) for r in recursive_cte(base, step, max_iter=10).collect()
    }
    # cycle 1→2→3→1: each of {1,2,3} reaches all of {1,2,3}
    want = {(a, b) for a in (1, 2, 3) for b in (1, 2, 3)} | {(4, 5)}
    assert got == want


def test_recursive_cte_max_iter_raises(spark):
    from citus_spark.operators.recursive import recursive_cte

    base = spark.createDataFrame([(0,)], "n int")

    def step(frontier):  # strictly growing — never converges
        return frontier.select((F.col("n") + 1).alias("n"))

    with pytest.raises(RuntimeError, match="did not converge"):
        recursive_cte(base, step, max_iter=5)


def test_groups_frame_matches_bruteforce(spark):
    """GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING against a Python
    brute force on data with peer groups and value gaps."""
    from citus_spark.operators.window_groups import groups_frame

    rows = [
        # (part, order_key_with_gaps, value)
        ("a", 1, 10), ("a", 1, 11), ("a", 5, 20), ("a", 9, 30), ("a", 9, 31),
        ("b", 2, 1), ("b", 7, 2),
    ]
    df = spark.createDataFrame(rows, "p string, k int, v int")
    out = groups_frame(
        df, ["p"], "k", F.sum("v"), preceding=1, following=1, out_col="s"
    )
    got = {(r.p, r.k, r.v): r.s for r in out.collect()}

    # brute force: frame = rows whose distinct-k index is within ±1
    from collections import defaultdict

    by_p = defaultdict(list)
    for p, k, v in rows:
        by_p[p].append((k, v))
    for p, kvs in by_p.items():
        ks = sorted({k for k, _ in kvs})
        idx = {k: i for i, k in enumerate(ks)}
        for k, v in kvs:
            want = sum(
                v2 for k2, v2 in kvs if abs(idx[k2] - idx[k]) <= 1
            )
            assert got[(p, k, v)] == want, (p, k, v)
