"""Streaming ingest into a time-partitioned layout (streaming/
tp_ingest.py): micro-batches route to period directories, the result
equals a one-shot batch write, retention drops compose with the
still-running stream's future appends."""

import os
import shutil

from pyspark.sql import functions as F

from citus_spark.queries import normalize_events_ts
from tests.conftest import SF_SMALL


def test_stream_tp_ingest_matches_batch(spark, tmp_path):
    from citus_spark.streaming.rollup import read_event_stream
    from citus_spark.streaming.tp_ingest import run_stream_to_time_partitions
    from citus_spark.sources.partitions import list_partitions

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{SF_SMALL}/events.parquet", f"{src}/events.parquet")
    dest = str(tmp_path / "tp_live")

    q = run_stream_to_time_partitions(
        read_event_stream(spark, src),
        dest,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").transform(
        normalize_events_ts
    )
    live = spark.read.parquet(dest)
    assert live.drop("_period").count() == ev.count()
    # every row landed in ITS period directory
    mism = live.filter(
        F.date_format("ts", "yyyy-MM-dd") != F.col("_period").cast("string")
    ).count()
    assert mism == 0
    periods = list_partitions(dest)
    assert len(periods) >= 2

    # retention drop on the live layout, then value parity on the rest
    from citus_spark.sources.partitions import drop_old_partitions

    cutoff = periods[len(periods) // 2]
    drop_old_partitions(dest, cutoff)
    spark.catalog.refreshByPath(dest)
    keep = ev.filter(F.date_format("ts", "yyyy-MM-dd") >= cutoff)
    assert spark.read.parquet(dest).count() == keep.count()
