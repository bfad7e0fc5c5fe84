"""Incremental rollup must equal the from-scratch aggregation after
any sequence of delta refreshes, exactly (fixed-point partials are
order-free), and each refresh must only read the delta."""

from pyspark.sql import functions as F

from citus_spark.queries import normalize_events_ts
from tests.conftest import SF_SMALL


def _events(spark):
    return spark.read.parquet(f"{SF_SMALL}/events.parquet").transform(
        normalize_events_ts
    )


def _full_reference(ev):
    v = F.col("value")
    return {
        (r.event_type,): (r.n, r.total)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.floor(v).cast("long")).cast("double")
                + F.sum(
                    F.floor((v - F.floor(v)) * 1_000_000 + F.lit(0.5)).cast(
                        "long"
                    )
                ).cast("double")
                / 1_000_000
            ).alias("total"),
        )
        .collect()
    }


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    from citus_spark.operators.rollup_maintenance import IncrementalRollup

    ev = _events(spark)
    roll = IncrementalRollup(
        spark, str(tmp_path / "rollup"), keys=["event_type"]
    )

    # three uneven delta batches by event_id ranges
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    cut1, cut2 = max_id // 5, max_id // 2
    n1 = roll.refresh(ev.filter(F.col("event_id") <= cut1))
    n2 = roll.refresh(ev.filter(F.col("event_id") <= cut2))
    n3 = roll.refresh(ev)
    assert n1 > 0 and n2 > 0 and n3 > 0
    assert n1 + n2 + n3 == ev.count()

    got = {
        (r.event_type,): (r.n, r.total_value) for r in roll.read().collect()
    }
    assert got == _full_reference(ev)

    # idempotent: re-refreshing with no new rows is a no-op
    assert roll.refresh(ev) == 0
    got2 = {
        (r.event_type,): (r.n, r.total_value) for r in roll.read().collect()
    }
    assert got2 == got

    # crash-safety hygiene: the staging dir is cleaned up after
    # success, and the watermark lives INSIDE the rollup (one write
    # set — no separate watermark file that can desynchronize)
    import os

    assert not os.path.exists(str(tmp_path / "rollup") + ".tmp")
    assert not os.path.exists(str(tmp_path / "rollup") + ".watermark")
    assert roll.last_id() == max_id


def test_refresh_scans_only_the_delta(spark, tmp_path):
    """The delta filter must reach the scan as a pushed predicate —
    at scale (id- or time-partitioned layout) this is the partition
    prune that makes refresh O(delta)."""
    from citus_spark.operators.rollup_maintenance import IncrementalRollup

    ev = _events(spark)
    roll = IncrementalRollup(
        spark, str(tmp_path / "rollup2"), keys=["event_type"]
    )
    roll.refresh(ev.filter(F.col("event_id") <= 1000))
    wm = roll.last_id()
    assert wm == 1000 or wm <= 1000

    delta = ev.filter(F.col("event_id") > roll.last_id())
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(event_id" in plan
