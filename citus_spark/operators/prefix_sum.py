"""Distributed global prefix sum (running offset) — the two-phase
formulation that scales.

A naive `sum() OVER (ORDER BY k)` with no PARTITION BY collapses to a
single task (Spark puts the whole frame in one window partition) —
correct at test scale, dead at 100 TB. The classic fix (same shape the
reference would push to workers + coordinator merge):

  1. range-repartition on the order key (partitions are disjoint,
     ordered ranges);
  2. per-partition totals → driver (one tiny row per partition);
  3. exclusive prefix of the totals → broadcast map;
  4. per-partition running sum (window WITHIN the partition) + the
     partition's base offset.

Every phase is bounded: the only driver-side data is one long per
partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_offset(
    df: DataFrame,
    order_col: str,
    value_col: Column | str,
    out_col: str = "offset",
    n_partitions: int | None = None,
) -> DataFrame:
    """Adds `out_col` = exclusive running sum of `value_col` in global
    `order_col` order. `order_col` values must be unique (they define
    the total order)."""
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    v = F.col(value_col) if isinstance(value_col, str) else value_col

    d = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    d = d.withColumn("_v", v.cast("long"))
    # persist BEFORE collecting totals: the range partitioner samples
    # per execution, so an unpersisted lineage recomputed for the
    # window phase can place rows in different partitions than the
    # ones the totals describe → wrong offsets. Persisting pins one
    # materialized partitioning that both phases read (same guard the
    # LSH band join uses).
    d = d.persist()
    # phase 2: tiny per-partition totals; exclusive prefix driver-side
    totals = {
        r._pid: r.t
        for r in d.groupBy("_pid").agg(F.sum("_v").alias("t")).collect()
    }
    base, acc = {}, 0
    for pid in sorted(totals):
        base[pid] = acc
        acc += totals[pid]
    base_map = F.create_map(
        *[F.lit(x) for kv in sorted(base.items()) for x in kv]
    )
    # phase 4: in-partition running sum + broadcast base offset
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        d.withColumn(
            out_col,
            (F.sum("_v").over(w) - F.col("_v") + base_map[F.col("_pid")]).cast(
                "long"
            ),
        )
        .drop("_pid", "_v")
    )
