"""Time-partition lifecycle: period-routed writes, touched-only
dynamic overwrite, O(1) retention drops, and pruned time-scoped
reads (↔ reference create_time_partitions / drop_old_partitions)."""

from pyspark.sql import functions as F

from citus_spark.queries import normalize_events_ts
from tests.conftest import SF_SMALL


def _events(spark):
    return spark.read.parquet(f"{SF_SMALL}/events.parquet").transform(
        normalize_events_ts
    )


def test_write_drop_and_prune(spark, tmp_path):
    from citus_spark.sources.partitions import (
        drop_old_partitions,
        list_partitions,
        read_time_partitioned,
        write_time_partitioned,
    )

    path = str(tmp_path / "events_by_day")
    ev = _events(spark)
    write_time_partitioned(ev, path, "ts", granularity="day")

    parts = list_partitions(path)
    n_days = ev.select(F.to_date("ts")).distinct().count()
    assert len(parts) == n_days
    total = ev.count()
    assert read_time_partitioned(spark, path).count() == total

    # retention: drop everything before the 3rd day; O(1) dir removes
    cutoff = parts[2]
    dropped = drop_old_partitions(path, older_than=cutoff)
    assert dropped == parts[:2]
    kept = read_time_partitioned(spark, path)
    want_kept = ev.filter(F.date_format("ts", "yyyy-MM-dd") >= cutoff).count()
    assert kept.count() == want_kept

    # time-scoped query prunes to one period directory
    q = kept.filter(F.col("_period") == parts[3])
    scan = next(
        line
        for line in q._jdf.queryExecution().executedPlan().toString().split("\n")
        if "FileScan" in line
    )
    assert "PartitionFilters" in scan and "_period" in scan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_dynamic_overwrite_touches_only_written_periods(spark, tmp_path):
    from citus_spark.sources.partitions import (
        list_partitions,
        read_time_partitioned,
        write_time_partitioned,
    )

    path = str(tmp_path / "events_dyn")
    ev = _events(spark)
    write_time_partitioned(ev, path, "ts", granularity="day")
    parts = list_partitions(path)
    day0 = parts[0]

    # backfill day0 with a modified slice; other periods must be
    # untouched byte-for-byte row counts
    before_other = (
        read_time_partitioned(spark, path)
        .filter(F.col("_period") != day0)
        .count()
    )
    patch = ev.filter(F.date_format("ts", "yyyy-MM-dd") == day0).limit(10)
    write_time_partitioned(patch, path, "ts", granularity="day")

    after = read_time_partitioned(spark, path)
    assert after.filter(F.col("_period") == day0).count() == 10
    assert after.filter(F.col("_period") != day0).count() == before_other
