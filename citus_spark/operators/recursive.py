"""Generic recursive-CTE evaluation (WITH RECURSIVE ... UNION).

The reference supports recursive CTEs by passing them through to
PostgreSQL's executor on the coordinator
(src/test/regress/sql/with_basics.sql:404); Spark has no native
equivalent. The dominant analytical use — transitive closure — has a
specialized O(log n)-round operator in operators/components.py
(pointer doubling); this module is the *general* iterate-to-fixpoint
form for arbitrary step queries:

    result = base
    frontier = base
    repeat: new = step(frontier) − result   (semi-naive: the step
            sees only last round's new rows, not the whole result)
    until new is empty or max_iter

Each round localCheckpoints the accumulator to cut lineage (otherwise
the plan doubles per iteration and the driver OOMs compiling it —
same discipline as kmeans/components). The per-round `count()` is a
driver-side scalar, not a data collect. Rounds equal the recursion
depth, as in any engine's recursive CTE; at scale each round is one
distributed join/shuffle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iter: int = 100,
) -> DataFrame:
    """UNION-semantics (distinct) recursive evaluation.

    `step` maps the previous round's *new* rows to candidate rows with
    the same schema. Raises if `max_iter` rounds don't reach the
    fixpoint (matching the safety valve most engines lack — PG would
    happily loop forever).
    """
    acc = base.distinct().localCheckpoint()
    frontier = acc
    for _ in range(max_iter):
        new = step(frontier).distinct().exceptAll(acc).localCheckpoint()
        if not new.take(1):
            return acc
        acc = acc.unionByName(new).localCheckpoint()
        frontier = new
    raise RuntimeError(f"recursive_cte did not converge in {max_iter} rounds")
