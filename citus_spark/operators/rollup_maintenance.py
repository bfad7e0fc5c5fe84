"""Incremental rollup maintenance — the reference's real-time
analytics pattern (reference src/backend/distributed/README.md's
rollup section: track the last-aggregated sequence id, then
`INSERT .. SELECT .. WHERE event_id > last ON CONFLICT DO UPDATE`
merges only the delta into the rollup table).

Spark-first translation:

- the rollup table is parquet keyed by the group columns, carrying
  *mergeable partial states* (counts and fixed-point sums — the same
  decomposition the engine uses for distributed aggregation);
- the highest ingested event_id rides INSIDE the rollup table as a
  constant `_last_id` column (the analog of the reference's
  `latest_rollup` sequence tracking). Embedding it makes the rollup
  and its watermark ONE write set: a refresh either lands both or
  neither, so a crash between "rollup written" and "watermark
  written" can never double-count the delta on the next refresh;
- `refresh()` aggregates ONLY rows above the watermark (at scale:
  an id- or time-partition-pruned scan — the delta, not the corpus)
  and merges by group key: existing groups sum their partials, new
  groups append. Cost per refresh is O(delta + |touched groups|),
  independent of table history.

Crash-safety contract: the delta is staged to `<rollup>.tmp` first
and the final step is a single overwrite of the rollup directory from
the staged copy. Plain parquet overwrite is delete-then-write, so a
crash *inside* that last step can leave the rollup directory partial —
but the fully-written `.tmp` staging copy survives for manual
recovery, and the watermark (inside the data) can never run ahead of
the data it describes. The `.tmp` directory is removed after success.
(A table format with atomic commit — Delta/Iceberg — would close the
remaining window; no such jars in this environment.)

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

    # -- watermark bookkeeping (↔ latest_rollup sequence tracking) --
    def last_id(self) -> int:
        """Watermark = the `_last_id` constant stored inside the
        rollup itself, so it can never desynchronize from the data."""
        if not os.path.exists(self.rollup_path):
            return -1
        row = (
            self.spark.read.parquet(self.rollup_path)
            .agg(F.max("_last_id"))
            .collect()
        )
        return int(row[0][0]) if row and row[0][0] is not None else -1

    # -- the refresh itself --
    def refresh(self, events: DataFrame) -> int:
        """Aggregate rows with event_id above the watermark and merge
        into the rollup. Returns the number of delta rows processed."""
        import shutil

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

        new_wm = max(int(part.agg(F.max("_max_id")).collect()[0][0]), wm)
        # stage rollup + watermark TOGETHER (watermark is a column), so
        # the final publish is one overwrite — no window where the
        # watermark describes data that was never written
        tmp = self.rollup_path + ".tmp"
        merged.withColumn("_last_id", F.lit(new_wm)).write.mode(
            "overwrite"
        ).parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(
            self.rollup_path
        )
        shutil.rmtree(tmp, ignore_errors=True)
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

    def watermark(self) -> int:
        """Public alias for the embedded watermark."""
        return self.last_id()
