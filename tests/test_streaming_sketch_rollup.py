"""Streaming HLL sketch rollup: incrementally-maintained distinct
counts must equal the one-shot batch sketch over the same data —
including users spanning micro-batches (the case a count-sum rollup
gets wrong), and the stored states must stay re-aggregatable."""

import os
import shutil

from pyspark.sql import functions as F

from citus_spark.queries import normalize_events_ts
from tests.conftest import SF_SMALL


def _split_source(spark, tmp_path, n_parts=3):
    """Write events as several files so availableNow+maxFilesPerTrigger
    produces multiple micro-batches with overlapping users/windows."""
    src = str(tmp_path / "src")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev.repartition(n_parts).write.parquet(src)
    for f in os.listdir(src):
        if not f.endswith(".parquet"):
            os.unlink(os.path.join(src, f))
    return src


def test_streaming_hll_rollup_matches_batch(spark, tmp_path):
    from citus_spark.operators.hll import approx_ndv
    from citus_spark.streaming.sketch_rollup import (
        read_ndv_rollup,
        run_hll_rollup_to_table,
    )

    src = _split_source(spark, tmp_path)
    state = str(tmp_path / "state")
    run_hll_rollup_to_table(spark, src, state)

    got = {
        (r.window_start, r.event_type): r.approx_ndv
        for r in read_ndv_rollup(spark, state).collect()
    }

    ev = spark.read.parquet(src).transform(normalize_events_ts)
    keyed = ev.select(
        F.window("ts", "1 hour").start.alias("window_start"),
        "event_type",
        "user_id",
    )
    want = {
        (r.window_start, r.event_type): r.approx_ndv
        for r in approx_ndv(keyed, ["window_start", "event_type"], "user_id")
        .collect()
    }
    # identical sketch algorithm + union is exact over register arrays:
    # the incrementally-maintained estimate must EQUAL the batch one
    assert got == want
    assert len(got) > 1


def test_streaming_hll_states_reaggregate_to_coarser_window(spark, tmp_path):
    """The stored form is states, not numbers: rolling the hourly
    states up to per-event_type totals must equal a direct sketch of
    the whole table — the reference's 'reaggregate the rollup' use."""
    from citus_spark.operators.hll import approx_ndv, hll_estimate, hll_union
    from citus_spark.streaming.sketch_rollup import run_hll_rollup_to_table

    src = _split_source(spark, tmp_path)
    state = str(tmp_path / "state")
    run_hll_rollup_to_table(spark, src, state)

    states = spark.read.parquet(state).drop("window_start")
    got = {
        r.event_type: r.approx_ndv
        for r in hll_estimate(
            hll_union(states, ["event_type"]), ["event_type"]
        ).collect()
    }
    ev = spark.read.parquet(src).transform(normalize_events_ts)
    want = {
        r.event_type: r.approx_ndv
        for r in approx_ndv(ev, ["event_type"], "user_id").collect()
    }
    assert got == want
