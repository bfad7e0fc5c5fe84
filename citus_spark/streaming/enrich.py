"""Stream-static enrichment join — the streaming form of the
reference-table join (↔ REFERENCE_JOIN, reference
src/include/distributed/multi_join_order.h:33: a replicated table is
joinable against any stream of rows on any column with no data
movement on the big side).

In Structured Streaming this is a stream-static join: the static
dimension is broadcast to every executor and each micro-batch joins
map-side, so the stream side never shuffles for the join — exactly
the property Citus gets from replicating reference tables. At 100 TB
of stream this is the only join shape that keeps up: the dimension is
re-resolved per micro-batch (picking up dimension updates), the
stream side stays append-only.

The aggregation after the join is keyed on a LOW-cardinality derived
key (segment), so the stateful streaming agg holds bounded state
regardless of stream size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citus_spark.streaming.rollup import read_event_stream


def enrich_events(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Join the event stream to the customer dimension on user_id and
    roll revenue up per market segment in 1-day windows."""
    dim = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
        )
    )
    return (
        events.withWatermark("ts", "2 hours")
        .join(dim, "user_id")  # stream-static: map-side per micro-batch
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("c_mktsegment"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "total_value",
        )
    )


def run_enrich_to_table(
    spark: SparkSession,
    src_dir: str,
    customer_path: str,
    out_path: str,
    queryName: str = "events_enrich",
) -> None:
    """Drive the enrichment stream over the current source contents
    (availableNow micro-batches) into a parquet rollup.

    Update-mode batches carry the new total per touched
    (window, segment) key, so the sink merge is replace-by-key — the
    same `ON CONFLICT DO UPDATE` idiom as streaming/rollup.py."""
    import os

    customer = spark.read.parquet(customer_path)
    agg = enrich_events(read_event_stream(spark, src_dir), customer)

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        sp = batch.sparkSession
        if os.path.exists(out_path):
            old = sp.read.parquet(out_path)
            keys = ["window_start", "c_mktsegment"]
            merged = old.join(batch.select(*keys), keys, "left_anti").unionByName(
                batch
            )
        else:
            merged = batch
        tmp = out_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        sp.read.parquet(tmp).write.mode("overwrite").parquet(out_path)

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
