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


def two_phase_row_number(
    df: DataFrame,
    order_exprs: list[Column],
    out_col: str = "rn",
    n_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Global row_number() without a single-partition window — the
    scale path for unpartitioned `OVER (ORDER BY ...)` ranks (r10
    verdict item #5: a full-table global window single-partitions the
    table at 100×; this is the same two-phase shape as
    with_global_offset, counting rows instead of summing values).

      1. range-repartition on the order expressions (disjoint ordered
         ranges, parallel);
      2. per-partition row counts → driver (one long per partition);
      3. exclusive prefix of the counts → broadcast base offsets;
      4. per-partition row_number (window WITHIN the partition) + the
         partition's base = the global rank.

    `order_exprs` must define a TOTAL order (same contract as any
    rank the oracle checks). Returns (df_with_rank, total_rows).

    The range-partitioned input is persist()ed and NOT unpersisted
    here: the persisted partitioning is load-bearing (the range
    sampler is re-seeded per execution — an unpersisted recompute
    could place rows differently than the collected counts describe),
    and the returned frame is lazy, so the function cannot know when
    consumption ends. Callers running timing/gate loops release it
    between iterations with spark.catalog.clearCache() — the same
    contract as the LSH band-table persist (bench.py run()/run_big()/
    run_sf3() already do)."""
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    # persist BEFORE collecting counts: the range partitioner samples
    # per execution — an unpersisted lineage recomputed for the window
    # phase can place rows differently than the counts describe
    d = d.persist()
    counts = {
        r._pid: r.c
        for r in d.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    base, acc = {}, 0
    for pid in sorted(counts):
        base[pid] = acc
        acc += counts[pid]
    base_map = F.create_map(
        *[F.lit(x) for kv in sorted(base.items()) for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(*order_exprs)
    out = d.withColumn(
        out_col,
        (F.row_number().over(w) + base_map[F.col("_pid")]).cast("long"),
    ).drop("_pid")
    return out, acc


def ntile_from_rank(rank: Column, total: int, n_buckets: int) -> Column:
    """PG/Spark NTILE(n) bucket from a 1-based global rank: with N
    rows, the first N%n buckets hold ceil(N/n) rows, the rest
    floor(N/n) (window_ntile semantics, arithmetically — so the
    two-phase rank path is value-identical to the windowed form)."""
    b = total // n_buckets
    rem = total % n_buckets
    big = rem * (b + 1)
    if b == 0:
        return rank.cast("int")
    return (
        F.when(rank <= big, (rank - 1) / (b + 1))
        .otherwise(rem + (rank - big - 1) / b)
        .cast("int")
        + 1
    ).cast("int")
