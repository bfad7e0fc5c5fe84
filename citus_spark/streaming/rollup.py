"""Micro-batch rollup — the reference's "real-time analytics" idiom.

The reference has no streaming operators (SURVEY.md §2.9); its
real-time story is high-throughput append ingest + periodic
`INSERT .. SELECT .. ON CONFLICT (k) DO UPDATE` rollups
(reference src/backend/distributed/README.md:1755-1767). The Spark
counterpart is Structured Streaming: readStream over the append
source, watermarked windowed aggregation, and a foreachBatch upsert
into the rollup table.

Local parquet directories stand in for the production source (Kafka /
cloud storage listing) — the dataflow is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_event_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming scan of the events table (parquet source). The
    streaming reader needs a declared schema — take it from a batch
    read of the same directory (one footer read; at production scale
    the schema comes from the catalog instead), then normalize ts to a
    plain timestamp (see queries.normalize_events_ts)."""
    from citus_spark.queries import _ship_package, normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _ship_package(spark)  # stateful kernels pickle by module reference
    schema = spark.read.parquet(src_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return normalize_events_ts(raw)


def windowed_rollup(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window per-type rollup with a late-data watermark —
    the streaming form of the reference's rollup SELECT."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_rollup_to_table(
    spark: SparkSession,
    src_dir: str,
    rollup_path: str,
    window: str = "1 hour",
    queryName: str = "events_rollup",
) -> None:
    """Drive the stream to completion over the current directory
    contents (micro-batch), upserting each batch into the rollup
    parquet via foreachBatch — the MERGE-equivalent of
    `ON CONFLICT DO UPDATE` without a Delta dependency: partial
    per-batch aggregates are unioned with the existing rollup and
    re-aggregated on the rollup key."""
    agg = windowed_rollup(read_event_stream(spark, src_dir), window)

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        # update-mode batches carry the NEW TOTAL per updated window
        # key (streaming state accumulates), so the merge is
        # replace-by-key — exactly `ON CONFLICT (k) DO UPDATE SET
        # n = EXCLUDED.n`: keep old rows whose key is absent from the
        # batch, take batch rows verbatim.
        sp = batch.sparkSession
        if os.path.exists(rollup_path):
            old = sp.read.parquet(rollup_path)
            keys = ["window_start", "event_type"]
            merged = old.join(batch.select(*keys), keys, "left_anti").unionByName(
                batch
            )
        else:
            merged = batch
        # write to a temp location then swap — parquet has no MERGE
        tmp = rollup_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        out = sp.read.parquet(tmp)
        out.write.mode("overwrite").parquet(rollup_path)

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
