"""Distributed sequence-value assignment.

↔ reference sequence handling (coordinator-allocated ranges pushed to
workers; multi_sequence_default.sql regress). A statement that needs
N sequence values reserves [base, base + N·inc) driver-side, then the
two-phase prefix sum (operators/prefix_sum.py) hands each row its
offset without a global sort: per-partition counts → exclusive prefix
of partition bases → per-partition local index. Driver traffic is one
long per partition — scale-safe at any N.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citus_spark.operators.prefix_sum import with_global_offset


def with_sequence_values(
    df: DataFrame, alloc: Callable[[int], int], inc: int, out_col: str
) -> DataFrame:
    """Adds `out_col` = base + k·inc with k a distinct 0..N-1 per row;
    `alloc(n)` reserves n values from the sequence AFTER the row count
    is known (offsets are computed first, so the reservation is exact
    — no over-draw, one count on the persisted base).

    Row→value pairing follows physical partition order (the reference
    likewise guarantees uniqueness, not which row draws which value).
    Keeps the input column order, appending `out_col` last.
    """
    keyed = df.withColumn("_seq_mid", F.monotonically_increasing_id())
    out = with_global_offset(keyed, "_seq_mid", F.lit(1), "_seq_off")
    base = alloc(out.count())
    val = (F.lit(base) + F.col("_seq_off") * F.lit(inc)).cast("long")
    return out.withColumn(out_col, val).drop("_seq_mid", "_seq_off")
