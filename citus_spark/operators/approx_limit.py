"""Approximate LIMIT — per-partition row-fetch bound.

↔ reference citus.limit_clause_row_fetch_count
(shared_library_init.c:1853; test multi_limit_clause_approximate.sql):
for GROUP BY + ORDER BY + LIMIT queries the reference fetches only N
rows per shard before the final merge, trading exactness for a hard
bound on data movement. Spark's TakeOrderedAndProject already bounds
ordered limits; this operator provides the same explicit knob for
*grouped* top-k pipelines where the per-group universe is huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def per_partition_limit(df: DataFrame, n: int, order_by: list | None = None) -> DataFrame:
    """Keep at most `n` rows per physical partition (the shard-local
    row fetch). With `order_by`, keeps each partition's top-n by that
    order — making a subsequent global top-n exact; without it, an
    arbitrary-but-deterministic-per-layout subset (the reference's
    approximate semantics)."""
    pid = F.spark_partition_id().alias("_pid")
    w = Window.partitionBy("_pid")
    if order_by:
        w = w.orderBy(*order_by)
    else:
        w = w.orderBy(F.monotonically_increasing_id())
    return (
        df.withColumn("_pid", pid)
        .withColumn("_rf", F.row_number().over(w))
        .filter(F.col("_rf") <= n)
        .drop("_pid", "_rf")
    )


def approx_grouped_topk(
    df: DataFrame,
    group_cols: list,
    order_col: str,
    k: int,
    row_fetch: int = 1000,
    tiebreak: list | None = None,
) -> DataFrame:
    """Grouped top-k with a per-partition pre-truncation: each
    partition contributes at most `row_fetch` best rows, bounding the
    shuffle no matter how hot a group is.

    Exactness (r9 ADVICE #4 correction): the pre-truncation keeps each
    partition's top-`row_fetch` rows by the GLOBAL order column, not
    per group — so a hot group's high values can evict every row of a
    colder group sharing the partition. The guarantee is therefore:
    exact when `row_fetch` ≥ rows-per-partition (nothing is pruned),
    or when every group's true top-k rows rank within their
    partition's global top-`row_fetch`. `k × groups-per-partition` is
    NOT a sufficient bound. `tiebreak` columns make equal-value ranks
    deterministic (and thus oracle-comparable)."""
    order = [F.desc(order_col)] + [F.col(c) for c in (tiebreak or [])]
    pruned = per_partition_limit(df, row_fetch, order_by=order)
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        pruned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumnRenamed("_rk", "rank")
    )
