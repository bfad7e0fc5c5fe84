"""Streaming t-digest rollup — percentiles maintained incrementally
over an append stream.

The distinct-count twin of sketch_rollup.py, for quantiles: a
latency/size dashboard needs p50/p99 per (hour, key) over all data
seen so far, and a sum/count rollup cannot answer that — percentiles
don't decompose. The reference's tdigest-extension pattern stores
DIGEST columns in the rollup table and merges increments into them
(`tdigest(...)` per batch + aggregate-merge on conflict); estimates
finalize at read time.

Spark mapping: per micro-batch, build per-(window, key) digest states
(operators/tdigest.py — the same mergeable k1-scale digests the batch
path persists), union them with the stored states on the rollup key,
and atomically swap the state table. Stored form stays
re-aggregatable (to coarser windows, across keys); state size is
O(groups × δ-centroids) regardless of stream length.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citus_spark.operators.tdigest import (
    tdigest_estimate,
    tdigest_sketch,
    tdigest_union,
)
from citus_spark.streaming.rollup import read_event_stream

ROLLUP_KEYS = ["window_start", "event_type"]


def _batch_states(batch: DataFrame, window: str) -> DataFrame:
    keyed = batch.select(
        F.window("ts", window).start.alias("window_start"),
        "event_type",
        "value",
    )
    return tdigest_sketch(keyed, ROLLUP_KEYS, "value")


def run_tdigest_rollup_to_table(
    spark: SparkSession,
    src_dir: str,
    state_path: str,
    window: str = "1 hour",
    queryName: str = "events_tdigest_rollup",
) -> None:
    """Drive the stream over the current directory contents, merging
    per-batch digest states into the stored state table."""
    events = read_event_stream(spark, src_dir)

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        sp = batch.sparkSession
        states = _batch_states(batch, window)
        if os.path.exists(state_path):
            states = tdigest_union(
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


def read_quantile_rollup(
    spark: SparkSession,
    state_path: str,
    quantiles=(0.5, 0.9, 0.99),
) -> DataFrame:
    """Finalize the stored states → per-(window, key) quantiles."""
    return tdigest_estimate(
        spark.read.parquet(state_path), ROLLUP_KEYS, quantiles
    )
