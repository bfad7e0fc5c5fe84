"""Window-frame EXCLUDE clause (CURRENT ROW / GROUP / TIES) — emulated
on Spark.

The reference inherits frame exclusion from PostgreSQL
(src/test/regress/sql/window_functions.sql exercises EXCLUDE);
Spark's window spec has no EXCLUDE. For the distributive aggregates
(sum/count/avg) exclusion is pure arithmetic over TWO frames computed
in the same window pass — the requested frame and the degenerate
peer-group frame (RANGE BETWEEN CURRENT ROW AND CURRENT ROW):

    EXCLUDE CURRENT ROW: frame_sum − x          (NULL when the frame
                                                 held only this row)
    EXCLUDE GROUP:       frame_sum − peer_sum   (NULL when the frame
                                                 held only peers)
    EXCLUDE TIES:        frame_sum − peer_sum + x

Both windows share one partitioning+sort, so the emulation costs no
extra shuffle — Catalyst evaluates them in a single Window node. The
NULL cases mirror SQL's sum-over-empty-set = NULL, checked against
DuckDB's native EXCLUDE (queries/analytics.py: window_exclude_modes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sum_with_exclude(
    df: DataFrame,
    partition_by: list[str | Column],
    order_by: str | Column,
    value: str | Column,
    preceding: int,
    following: int,
) -> DataFrame:
    """Appends `excl_current`, `excl_group`, `excl_ties`: sum(value)
    over RANGE BETWEEN preceding PRECEDING AND following FOLLOWING
    under the three EXCLUDE modes. `value` must be integral (exact
    sums; doubles would need the decimal idiom)."""
    x = F.col(value) if isinstance(value, str) else value
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(order_by)
        .rangeBetween(-preceding, following)
    )
    w_peers = (
        Window.partitionBy(*partition_by)
        .orderBy(order_by)
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    s, cnt = F.sum(x).over(w), F.count(x).over(w)
    ps, pc = F.sum(x).over(w_peers), F.count(x).over(w_peers)
    return (
        df.withColumn(
            "excl_current",
            F.when(cnt - 1 == 0, F.lit(None)).otherwise(s - x),
        )
        .withColumn(
            "excl_group",
            F.when(cnt - pc == 0, F.lit(None)).otherwise(s - ps),
        )
        .withColumn("excl_ties", s - ps + x)
    )
