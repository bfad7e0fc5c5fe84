"""Streaming HLL sketch rollup — approximate distinct counts
maintained incrementally over an append stream.

The reference's real-time pattern for distinct counts is exactly
this: rollup tables store `hll` COLUMNS (not finalized numbers), the
ingest path does `hll_add_agg` per increment and `ON CONFLICT DO
UPDATE SET sketch = hll_union(...)`, and dashboards finalize with
`hll_cardinality` at read time (reference README's rollup section +
the distributed hll extension, SURVEY §2.4). A count-sum rollup
CANNOT answer "distinct users per hour" incrementally — a user seen
in two micro-batches must not count twice — which is why the stored
state must be a mergeable sketch.

Spark mapping: per micro-batch, build per-(window, key) HLL states
(operators/hll.py — the same register arrays the batch path
persists), union them with the stored states on the rollup key, and
atomically swap the state table. Estimates are finalized on read, so
the stored form stays re-aggregatable to coarser windows or across
tables. State size is O(groups × m) regardless of stream length.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citus_spark.operators.hll import hll_estimate, hll_sketch, hll_union
from citus_spark.streaming.rollup import read_event_stream

ROLLUP_KEYS = ["window_start", "event_type"]


def _batch_states(batch: DataFrame, window: str) -> DataFrame:
    keyed = batch.select(
        F.window("ts", window).start.alias("window_start"),
        "event_type",
        "user_id",
    )
    return hll_sketch(keyed, ROLLUP_KEYS, "user_id")


def run_hll_rollup_to_table(
    spark: SparkSession,
    src_dir: str,
    state_path: str,
    window: str = "1 hour",
    queryName: str = "events_hll_rollup",
) -> None:
    """Drive the stream over the current directory contents,
    merging per-batch sketch states into the stored state table."""
    events = read_event_stream(spark, src_dir)

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        sp = batch.sparkSession
        states = _batch_states(batch, window)
        if os.path.exists(state_path):
            states = hll_union(
                sp.read.parquet(state_path).unionByName(states), ROLLUP_KEYS
            )
        tmp = state_path + ".tmp"
        states.write.mode("overwrite").parquet(tmp)
        sp.read.parquet(tmp).write.mode("overwrite").parquet(state_path)

    q = (
        events.writeStream.outputMode("append")
        .foreachBatch(upsert)
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_ndv_rollup(spark: SparkSession, state_path: str) -> DataFrame:
    """Finalize the stored states → (window_start, event_type, ndv)."""
    return hll_estimate(spark.read.parquet(state_path), ROLLUP_KEYS)
