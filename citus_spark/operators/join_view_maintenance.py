"""Incremental maintenance of an aggregated JOIN view.

↔ reference rollup idiom (src/backend/distributed/README.md's
real-time analytics section): the tracked `INSERT..SELECT .. ON
CONFLICT DO UPDATE` rollups routinely aggregate a JOIN (orders ⋈
lineitem → per-customer revenue), and re-running the full join every
refresh rescans the corpus. Classic delta-view maintenance for
append-only sides:

    Δ(A ⋈ B) = ΔA ⋈ B_full  ∪  A_old ⋈ ΔB

(every new pair contains a new A row — first term, whatever the age
of its B partner since B_full includes ΔB — or an old A row with a
new B row — second term; old×old pairs were counted by an earlier
refresh, so each pair is aggregated EXACTLY once across any refresh
schedule, including partners that arrive in different refreshes).

Scale shape: both terms are delta-driven joins — at scale, with both
sides hash-distributed on the join key (the engine's co-location
contract), each term shuffles only the delta and probes co-located
partitions; cost per refresh is O(Δ ⋈-selectivity), independent of
table history. The rollup state is mergeable fixed-point partials
(the same exact DSUM decomposition as operators/rollup_maintenance),
and BOTH side watermarks ride inside the rollup as constant columns —
one write set, no crash window that double-counts a delta.

Append-only is the contract (the reference's rollup idiom is also
insert-only); updates/deletes belong to the CDC path
(streaming/cdc_apply.py) and a full recompute.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCALE = 1_000_000  # 6-decimal fixed point (= queries.DSUM)


class IncrementalJoinRollup:
    """Maintains `rollup_path` = per-(group_cols) count + exact sum of
    `value_col` over A ⋈ B on `join_keys`, refreshed by per-side
    append deltas identified by monotone id columns."""

    def __init__(
        self,
        spark: SparkSession,
        rollup_path: str,
        join_keys: list[str] | tuple[str, str],
        group_cols: list[str],
        value_col: str,
        a_id: str,
        b_id: str,
    ) -> None:
        self.spark = spark
        self.rollup_path = rollup_path
        # (a_key, b_key) — equi-join A.a_key = B.b_key
        self.a_key, self.b_key = (
            (join_keys[0], join_keys[1])
            if isinstance(join_keys, (list, tuple)) and len(join_keys) == 2
            else (join_keys, join_keys)
        )
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.a_id = a_id
        self.b_id = b_id

    def watermarks(self) -> tuple[int, int]:
        if not os.path.exists(self.rollup_path):
            return (-1, -1)
        row = (
            self.spark.read.parquet(self.rollup_path)
            .agg(F.max("_wm_a"), F.max("_wm_b"))
            .collect()[0]
        )
        return (
            int(row[0]) if row[0] is not None else -1,
            int(row[1]) if row[1] is not None else -1,
        )

    def _partials(self, joined: DataFrame) -> DataFrame:
        v = F.col(self.value_col)
        return joined.groupBy(*self.group_cols).agg(
            F.count("*").alias("n"),
            F.sum(F.floor(v).cast("long")).alias("sum_int"),
            F.sum(
                F.floor((v - F.floor(v)) * _SCALE + F.lit(0.5)).cast("long")
            ).alias("sum_frac"),
        )

    def refresh(self, a: DataFrame, b: DataFrame) -> int:
        """Aggregate only the delta pairs into the rollup. Returns the
        number of delta pairs processed."""
        import shutil

        wa, wb = self.watermarks()
        da = a.filter(F.col(self.a_id) > wa)
        a_old = a.filter(F.col(self.a_id) <= wa)
        db = b.filter(F.col(self.b_id) > wb)

        def join(left: DataFrame, right: DataFrame) -> DataFrame:
            if self.a_key == self.b_key:
                return left.join(right, on=self.a_key)
            return left.join(right, F.col(self.a_key) == F.col(self.b_key))

        delta_pairs = join(da, b).unionByName(join(a_old, db))
        n_delta = delta_pairs.count()
        new_wa = a.agg(F.max(self.a_id)).collect()[0][0]
        new_wb = b.agg(F.max(self.b_id)).collect()[0][0]
        new_wa = wa if new_wa is None else max(wa, int(new_wa))
        new_wb = wb if new_wb is None else max(wb, int(new_wb))
        if n_delta == 0 and (new_wa, new_wb) == (wa, wb):
            return 0

        part = self._partials(delta_pairs)
        if os.path.exists(self.rollup_path):
            old = self.spark.read.parquet(self.rollup_path)
            merged = (
                old.select(*self.group_cols, "n", "sum_int", "sum_frac")
                .unionByName(part)
                .groupBy(*self.group_cols)
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("sum_int").alias("sum_int"),
                    F.sum("sum_frac").alias("sum_frac"),
                )
            )
        else:
            merged = part
        tmp = self.rollup_path + ".tmp"
        merged.withColumn("_wm_a", F.lit(new_wa)).withColumn(
            "_wm_b", F.lit(new_wb)
        ).write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(
            self.rollup_path
        )
        shutil.rmtree(tmp, ignore_errors=True)
        return n_delta

    def read(self) -> DataFrame:
        df = self.spark.read.parquet(self.rollup_path)
        total = (
            F.col("sum_int").cast("double")
            + F.col("sum_frac").cast("double") / _SCALE
        )
        return df.select(
            *self.group_cols, F.col("n"), total.alias("total_value")
        )
