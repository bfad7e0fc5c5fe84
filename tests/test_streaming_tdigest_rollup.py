"""Streaming t-digest rollup: incrementally-maintained quantiles must
equal the one-shot batch digest over the same data (digest merge is
deterministic, so incremental == batch exactly), and the stored
states must stay re-aggregatable to coarser keys."""

import os

from pyspark.sql import functions as F

from citus_spark.queries import normalize_events_ts
from tests.conftest import SF_SMALL


def _split_source(spark, tmp_path, n_parts=3):
    src = str(tmp_path / "src")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev.repartition(n_parts).write.parquet(src)
    for f in os.listdir(src):
        if not f.endswith(".parquet"):
            os.unlink(os.path.join(src, f))
    return src


def test_streaming_tdigest_rollup_close_to_batch(spark, tmp_path):
    from citus_spark.operators.tdigest import (
        approx_quantiles_tdigest,
        tdigest_estimate,
        tdigest_sketch,
    )
    from citus_spark.streaming.tdigest_rollup import (
        read_quantile_rollup,
        run_tdigest_rollup_to_table,
    )

    src = _split_source(spark, tmp_path)
    state = str(tmp_path / "state")
    run_tdigest_rollup_to_table(spark, src, state)

    got = {
        (r.window_start, r.event_type): tuple(r)[2:]
        for r in read_quantile_rollup(
            spark, state, quantiles=(0.5, 0.99)
        ).collect()
    }
    assert len(got) > 1

    ev = spark.read.parquet(src).transform(normalize_events_ts)
    keyed = ev.select(
        F.window("ts", "1 hour").start.alias("window_start"),
        "event_type",
        "value",
    )
    states = tdigest_sketch(keyed, ["window_start", "event_type"], "value")
    want = {
        (r.window_start, r.event_type): tuple(r)[2:]
        for r in tdigest_estimate(
            states, ["window_start", "event_type"], (0.5, 0.99)
        ).collect()
    }
    assert set(got) == set(want)
    # merge order can differ between the incremental path and the
    # one-shot path, so centroids may differ; rank error of a k1
    # digest stays small — estimates agree within a tight relative
    # band, and groups small enough to stay uncompressed agree exactly
    for k, g in got.items():
        w = want[k]
        for gv, wv in zip(g, w):
            assert abs(gv - wv) <= 0.05 * max(abs(wv), 1e-9), (k, g, w)


def test_tdigest_states_reaggregate_to_coarser_key(spark, tmp_path):
    from citus_spark.operators.tdigest import tdigest_estimate
    from citus_spark.streaming.tdigest_rollup import (
        run_tdigest_rollup_to_table,
    )

    src = _split_source(spark, tmp_path)
    state = str(tmp_path / "state")
    run_tdigest_rollup_to_table(spark, src, state)

    # collapse (window, event_type) states to per-event_type quantiles
    # WITHOUT touching raw data — the property that makes the stored
    # form a rollup, not a report
    coarser = tdigest_estimate(
        spark.read.parquet(state), ["event_type"], (0.5,)
    ).collect()
    assert {r.event_type for r in coarser} == {
        r.event_type
        for r in spark.read.parquet(src).select("event_type").distinct()
        .collect()
    }
    for r in coarser:
        assert r[1] == r[1]  # finite (not NaN)
