"""Streaming ingest into a time-partitioned layout.

↔ the reference's timeseries deployment pattern: high-throughput
append ingest (COPY / INSERT) into time-partitioned distributed
tables whose old partitions age out via drop_old_time_partitions
(SURVEY.md §1.4; sources/partitions.py is the batch half). The
streaming half here: readStream over the append source →
foreachBatch routing every micro-batch's rows to their period
directories (append, never overwrite — exactly the batch
`append_time_partitioned` contract), so retention drops and
partition-pruned reads keep working while data flows in.

At scale the period directory key doubles as the pruning axis: a
time-scoped query over the live table reads only its periods, while
the stream keeps appending to the head period — the same
write/read separation the reference gets from child tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from citus_spark.sources.partitions import append_time_partitioned


def run_stream_to_time_partitions(
    events: DataFrame,
    dest: str,
    ts_col: str = "ts",
    granularity: str = "day",
    checkpoint: str | None = None,
):
    """Start the ingest: every micro-batch appends period-routed.
    Returns the StreamingQuery (caller awaits/stops)."""

    def apply_batch(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        append_time_partitioned(batch, dest, ts_col, granularity)

    writer = events.writeStream.foreachBatch(apply_batch).outputMode(
        "append"
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_live(spark: SparkSession, dest: str) -> DataFrame:
    """Batch view over the growing layout (period column included for
    pruning)."""
    return spark.read.parquet(dest)
