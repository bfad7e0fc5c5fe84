"""Session-level time-partition lifecycle (↔ reference
create_time_partitions() / drop_old_time_partitions()): converting a
registered table to the partitioned layout, O(1) retention drops, and
the reference's SQL/CALL spellings through the front door."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_create_then_drop_partitions(spark, tmp_path):
    sess = _sess(spark)
    n_total = spark.table("events").count()

    periods = sess.create_time_partitions(
        "events", ts_col="ts", granularity="day",
        path=str(tmp_path / "events_tp"),
    )
    assert len(periods) >= 2
    assert sess.catalog.get("events").time_partitioning["granularity"] == "day"
    # view now reads the layout; rows preserved
    assert spark.table("events").drop("_period").count() == n_total

    cutoff = periods[len(periods) // 2]
    n_keep = spark.table("events").filter(F.col("_period") >= cutoff).count()
    dropped = sess.drop_old_time_partitions("events", older_than=cutoff)
    assert dropped == [p for p in periods if p < cutoff]
    assert spark.table("events").count() == n_keep
    # the dropped periods are gone from disk, not rewritten
    remaining = {
        d.split("=", 1)[1]
        for d in os.listdir(tmp_path / "events_tp")
        if d.startswith("_period=")
    }
    assert remaining == {p for p in periods if p >= cutoff}


def test_sql_and_call_spellings(spark, tmp_path):
    sess = _sess(spark)
    sess.create_time_partitions(
        "events", ts_col="ts", granularity="day",
        path=str(tmp_path / "tp_sql"),
    )
    # redo via the SQL spelling onto the same catalog entry
    sess.sql(
        "SELECT create_time_partitions('events', 'ts', "
        "partition_interval => 'day')"
    )
    periods_before = sorted(
        r._period
        for r in spark.table("events").select("_period").distinct().collect()
    )
    cutoff = periods_before[1]
    # the reference invokes the drop as a PROCEDURE
    sess.sql(f"CALL drop_old_time_partitions('events', '{cutoff}')")
    periods_after = sorted(
        r._period
        for r in spark.table("events").select("_period").distinct().collect()
    )
    assert periods_after == [p for p in periods_before if p >= cutoff]


def test_hour_granularity_drop_accepts_timestamp_cutoff(spark, tmp_path):
    """Hour partition keys are yyyy-MM-dd-HH; a timestamp-style cutoff
    keeps its space separator, which sorts below '-', so without
    normalization no same-day hour would ever drop."""
    sess = _sess(spark)
    periods = sess.create_time_partitions(
        "events", ts_col="ts", granularity="hour",
        path=str(tmp_path / "events_h"),
    )
    # pick a mid-day cutoff on the first day present
    first_day = periods[0][:10]
    same_day = [p for p in periods if p.startswith(first_day)]
    assert len(same_day) >= 3
    cutoff_key = same_day[2]  # yyyy-MM-dd-HH
    ts_style = f"{cutoff_key[:10]} {cutoff_key[11:]}:00:00"
    dropped = sess.drop_old_time_partitions("events", older_than=ts_style)
    assert dropped == [p for p in periods if p < cutoff_key]
    assert same_day[0] in dropped and same_day[1] in dropped
