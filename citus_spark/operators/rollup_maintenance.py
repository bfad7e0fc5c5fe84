"""Incremental rollup maintenance — the reference's real-time
analytics pattern (reference src/backend/distributed/README.md's
rollup section: track the last-aggregated sequence id, then
`INSERT .. SELECT .. WHERE event_id > last ON CONFLICT DO UPDATE`
merges only the delta into the rollup table).

Spark-first translation:

- the rollup table is parquet keyed by the group columns, carrying
  *mergeable partial states* (counts and fixed-point sums — the same
  decomposition the engine uses for distributed aggregation);
- a watermark table records the highest ingested event_id per refresh
  (the analog of the reference's `latest_rollup` sequence tracking);
- `refresh()` aggregates ONLY rows above the watermark (at scale:
  an id- or time-partition-pruned scan — the delta, not the corpus)
  and merges by group key: existing groups sum their partials, new
  groups append. Cost per refresh is O(delta + |touched groups|),
  independent of table history.

Merging summed partials is exact because the states are bigint
counts and DSUM-style dual-bigint fixed-point sums — associative,
order-free, no float drift across arbitrarily many refreshes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCALE = 1_000_000  # 6-decimal fixed point, matching queries.DSUM


def _partial_states(delta: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    v = F.col(value_col)
    return delta.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(v).cast("long")).alias("sum_int"),
        F.sum(
            F.floor((v - F.floor(v)) * _SCALE + F.lit(0.5)).cast("long")
        ).alias("sum_frac"),
        F.max("event_id").alias("_max_id"),
    )


class IncrementalRollup:
    """Maintains `rollup_path` = per-(keys) counts and exact sums of
    `value_col` over an append-only events source, refreshed by delta.
    """

    def __init__(
        self,
        spark: SparkSession,
        rollup_path: str,
        keys: list[str],
        value_col: str = "value",
    ) -> None:
        self.spark = spark
        self.rollup_path = rollup_path
        self.keys = keys
        self.value_col = value_col
        self.watermark_path = rollup_path + ".watermark"

    # -- watermark bookkeeping (↔ latest_rollup sequence tracking) --
    def last_id(self) -> int:
        if not os.path.exists(self.watermark_path):
            return -1
        row = self.spark.read.parquet(self.watermark_path).collect()
        return row[0].last_id if row else -1

    def _set_last_id(self, v: int) -> None:
        self.spark.createDataFrame([(int(v),)], "last_id bigint").coalesce(
            1
        ).write.mode("overwrite").parquet(self.watermark_path)

    # -- the refresh itself --
    def refresh(self, events: DataFrame) -> int:
        """Aggregate rows with event_id above the watermark and merge
        into the rollup. Returns the number of delta rows processed."""
        wm = self.last_id()
        delta = events.filter(F.col("event_id") > wm)
        n_delta = delta.count()
        if n_delta == 0:
            return 0
        part = _partial_states(delta, self.keys, self.value_col)

        if os.path.exists(self.rollup_path):
            old = self.spark.read.parquet(self.rollup_path)
            merged = (
                old.select(*self.keys, "n", "sum_int", "sum_frac")
                .unionByName(part.select(*self.keys, "n", "sum_int", "sum_frac"))
                .groupBy(*self.keys)
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("sum_int").alias("sum_int"),
                    F.sum("sum_frac").alias("sum_frac"),
                )
            )
        else:
            merged = part.select(*self.keys, "n", "sum_int", "sum_frac")

        new_wm = part.agg(F.max("_max_id")).collect()[0][0]
        tmp = self.rollup_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(
            self.rollup_path
        )
        self._set_last_id(max(int(new_wm), wm))
        return n_delta

    def read(self) -> DataFrame:
        """Rollup with the user-facing exact sum rebuilt from the
        fixed-point partial states."""
        df = self.spark.read.parquet(self.rollup_path)
        total = (
            F.col("sum_int").cast("double")
            + F.col("sum_frac").cast("double") / _SCALE
        )
        return df.select(
            *self.keys, F.col("n"), total.alias("total_value")
        )
