"""As-of (temporal) join — latest right-side row at or before each
left-side timestamp, per key.

Absent from both the reference (SURVEY.md §2.3 marks it n/a) and
Spark; a training-data/time-series staple (join events to the most
recent config/model/price snapshot). The scalable formulation is the
union + window trick:

  tag left/right, union, sort per key by (ts, right-first),
  last_value(right cols, ignore nulls) over the preceding frame.

One shuffle on the key — same cost as a co-located join; no per-group
pandas (`merge_asof`) needed, no range explosion. Semantics: right
row with the greatest ts ≤ left ts (ties: right row sorts first, so
an equal-timestamp right row IS visible to the left row — matching
DuckDB's native `ASOF JOIN ... ON l.ts >= r.ts`, which the oracle
uses)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right_ts <= left_ts and matching `on`. Right side should be unique
    per (on, right_ts) — pre-aggregate if not (undefined tie order
    otherwise, in any engine)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(c + suffix) for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    unioned = lt.select(*rt.columns).unionByName(rt)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # All right columns travel in ONE struct filled by ONE
    # last(ignorenulls) — every output column comes from the same
    # matched right row. (Filling columns independently would, when a
    # matched right row holds NULL in some column, take that column
    # from an OLDER right row — a composite row that never existed.)
    out_cols = [c + suffix for c in right_cols]
    rstruct = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_ts").alias("_rts"), *[F.col(c) for c in out_cols]),
    )
    filled = unioned.withColumn("_r", F.last(rstruct, ignorenulls=True).over(w))
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(c) for c in out_cols],
        F.col("_r._rts").alias(right_ts + suffix),
    )
