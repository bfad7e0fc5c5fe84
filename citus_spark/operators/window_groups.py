"""GROUPS window-frame mode — emulated on Spark.

The reference inherits GROUPS frames from PostgreSQL
(src/test/regress/sql/window_functions.sql); Spark implements only
ROWS and RANGE. But a GROUPS frame is definitionally a RANGE frame
over the *peer-group index*: number the distinct ORDER BY values with
dense_rank(), then aggregate with
RANGE BETWEEN lo PRECEDING AND hi FOLLOWING over that rank. Peers
share a rank, so every peer row sees the identical frame — exactly
GROUPS semantics. Two window passes over the same partitioning (one
shuffle; the second window reuses the first's sort).

Oracle-checked against DuckDB's native GROUPS mode
(queries/analytics.py: window_groups_frame).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def groups_frame(
    df: DataFrame,
    partition_by: list[str | Column],
    order_by: str | Column,
    agg: Column,
    preceding: int,
    following: int,
    out_col: str,
    rank_col: str = "_grp_rank",
) -> DataFrame:
    """`agg` over a GROUPS BETWEEN `preceding` PRECEDING AND
    `following` FOLLOWING frame (ascending `order_by`).

    `agg` must reference input columns (e.g. ``F.sum("x")``); the
    temporary dense-rank column `rank_col` is dropped on return.
    """
    w_rank = Window.partitionBy(*partition_by).orderBy(order_by)
    ranked = df.withColumn(rank_col, F.dense_rank().over(w_rank))
    w_frame: WindowSpec = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(rank_col))
        .rangeBetween(-preceding, following)
    )
    return ranked.withColumn(out_col, agg.over(w_frame)).drop(rank_col)
