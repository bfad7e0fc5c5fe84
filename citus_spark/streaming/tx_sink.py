"""Exactly-once streaming ingest into the transactional table format.

Structured Streaming's foreachBatch is at-least-once: after a crash
between "batch written" and "checkpoint advanced", the batch is
REPLAYED — a plain parquet-append sink duplicates it. The fix is the
same one Delta's streaming sink uses (and, in reference terms, what
makes ingest safe under connection retry — 2PC prepared-transaction
recovery, transaction/transaction_recovery.c): record a (app_id,
epoch_id) transaction marker IN THE SAME atomic commit as the data,
and skip any epoch at or below the last recorded marker. The marker
and the data can't diverge because they are one log entry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from citus_spark.sources.txlog import TxTable
from citus_spark.streaming.rollup import read_event_stream


def run_stream_to_txtable(
    spark: SparkSession,
    src_dir: str,
    table_path: str,
    app_id: str = "events_ingest",
    queryName: str = "tx_ingest",
) -> None:
    """Drive the event stream over the current directory contents,
    appending each micro-batch to the TxTable exactly once (idempotent
    under epoch replay)."""
    events = read_event_stream(spark, src_dir)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        sp = batch.sparkSession
        if not os.path.isdir(os.path.join(table_path, "_txlog")):
            TxTable.create(sp, table_path, batch.limit(0))
        TxTable(sp, table_path).append(batch, txn=(app_id, int(epoch_id)))

    q = (
        events.writeStream.outputMode("append")
        .foreachBatch(sink)
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
