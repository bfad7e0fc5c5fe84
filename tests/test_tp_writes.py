"""Writing statements on time-partitioned tables (the round-4 advice
defect: DML/COPY/TRUNCATE/VACUUM resolved entry.path — the stale
pre-partitioning snapshot — so dropped partitions silently came back
and COPY appended rows the view never saw). Every writing statement
must read and rewrite the LIVE partitioned layout."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def _tp_events(spark, tmp_path):
    sess = _sess(spark)
    periods = sess.create_time_partitions(
        "events", ts_col="ts", granularity="day",
        path=str(tmp_path / "events_tp"),
    )
    return sess, periods


def test_dml_does_not_resurrect_dropped_partitions(spark, tmp_path):
    sess, periods = _tp_events(spark, tmp_path)
    cutoff = periods[len(periods) // 2]
    sess.drop_old_time_partitions("events", older_than=cutoff)
    n_live = spark.table("events").count()
    assert n_live > 0
    # UPDATE through the front door must rewrite the PARTITIONED
    # layout: same row count, dropped periods still gone
    res = sess.sql("UPDATE events SET value = value + 1 WHERE value < 0")
    assert res.collect()[0][0] >= 0
    assert spark.table("events").count() == n_live
    live_periods = sorted(
        str(r._period)
        for r in spark.table("events").select("_period").distinct().collect()
    )
    assert all(p >= cutoff for p in live_periods)


def test_update_moving_rows_across_periods(spark, tmp_path):
    sess, periods = _tp_events(spark, tmp_path)
    first = periods[0]
    n_first = spark.table("events").filter(
        F.col("_period") == first
    ).count()
    assert n_first > 0
    # shift the first period's rows forward 40 days: their directory
    # must empty out and the rows land in re-derived periods
    sess.sql(
        "UPDATE events SET ts = ts + INTERVAL 40 DAYS "
        f"WHERE _period = '{first}'"
    )
    assert spark.table("events").filter(
        F.col("_period") == first
    ).count() == 0
    assert first not in {
        d.split("=", 1)[1]
        for d in os.listdir(tmp_path / "events_tp")
        if d.startswith("_period=")
    }


def test_delete_and_truncate_time_partitioned(spark, tmp_path):
    sess, periods = _tp_events(spark, tmp_path)
    n0 = spark.table("events").count()
    res = sess.sql("DELETE FROM events WHERE event_type = 'view'")
    n_del = res.collect()[0][0]
    assert n_del > 0
    assert spark.table("events").count() == n0 - n_del
    sess.sql("TRUNCATE events")
    assert spark.table("events").count() == 0


def test_copy_from_lands_in_partitions(spark, tmp_path):
    sess, periods = _tp_events(spark, tmp_path)
    n0 = spark.table("events").count()
    # stage three rows as jsonl, one in a brand-new period
    stage = tmp_path / "copy_in.jsonl"
    stage.write_text(
        '{"event_id": 900001, "ts": "2031-05-01T10:00:00", '
        '"user_id": 7, "event_type": "copyin", "value": 1.5, "props": "{}"}\n'
        '{"event_id": 900002, "ts": "2031-05-01T11:00:00", '
        '"user_id": 8, "event_type": "copyin", "value": 2.5, "props": "{}"}\n'
        '{"event_id": 900003, "ts": "2031-05-02T09:00:00", '
        '"user_id": 9, "event_type": "copyin", "value": 3.5, "props": "{}"}\n'
    )
    out = sess.sql(
        f"COPY events FROM '{stage}' WITH (FORMAT jsonl)"
    )
    assert out.collect()[0].copied == 3
    # the view sees the appended rows, routed to period directories
    assert spark.table("events").count() == n0 + 3
    got = spark.table("events").filter(
        F.col("event_type") == "copyin"
    ).select("_period").distinct().collect()
    assert sorted(str(r._period) for r in got) == ["2031-05-01", "2031-05-02"]


def test_vacuum_compacts_each_period(spark, tmp_path):
    sess, periods = _tp_events(spark, tmp_path)
    n0 = spark.table("events").count()
    res = sess.sql("VACUUM events")
    assert res.collect()[0].files >= 1
    assert spark.table("events").count() == n0
    # layout survives: still partitioned, same periods
    live = sorted(
        str(r._period)
        for r in spark.table("events").select("_period").distinct().collect()
    )
    assert live == periods


def test_create_time_partitions_reference_positional_order(spark, tmp_path):
    """The reference signature is (table, partition_interval, end_at,
    start_from) — '1 day' in position 2 must bind as the interval,
    never as the timestamp column; ts_col arrives as a keyword."""
    import pytest

    sess = _sess(spark)
    sess.sql(
        "SELECT create_time_partitions('events', '1 day', "
        "ts_col => 'ts')"
    )
    tp = sess.catalog.get("events").time_partitioning
    assert tp and tp["granularity"] == "day" and tp["ts_col"] == "ts"
    # interval positional without ts_col: descriptive error, not a
    # KeyError or a misbound column name
    with pytest.raises(ValueError, match="ts_col"):
        sess.sql("SELECT create_time_partitions('events', '1 month')")


def test_copy_from_rejects_malformed(spark, tmp_path):
    """PG's COPY rejects malformed input; PERMISSIVE would load
    all-NULL rows silently."""
    import pytest

    sess = _sess(spark)
    target = tmp_path / "cust_copy"
    spark.table("customer").write.parquet(str(target))
    spark.read.parquet(str(target)).createOrReplaceTempView("cust_copy")
    sess.catalog.register(
        "cust_copy", "hash", "c_custkey", path=str(target)
    )
    bad = tmp_path / "bad.csv"
    bad.write_text("not_a_number,xx,yy,zz,1,aa,bb,cc\n")
    with pytest.raises(Exception):
        sess.sql(f"COPY cust_copy FROM '{bad}' WITH (FORMAT csv)")
