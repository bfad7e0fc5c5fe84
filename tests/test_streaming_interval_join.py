"""Stream-stream interval join must produce exactly the batch join's
row multiset (inner join, append mode: every matched pair is emitted
once when both sides' watermarks pass)."""

import os
import shutil

from pyspark.sql import functions as F

from citus_spark.queries import normalize_events_ts
from tests.conftest import SF_SMALL


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    from citus_spark.streaming.interval_join import (
        attribute_purchases,
        run_attribution,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{SF_SMALL}/events.parquet", f"{src}/events.parquet")
    out = str(tmp_path / "attributed")

    run_attribution(spark, src, out)
    got = {
        (r.user_id, r.purchase_id, r.view_id, r.gap_seconds)
        for r in spark.read.parquet(out).collect()
    }

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").transform(
        normalize_events_ts
    )
    want_df = attribute_purchases(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    want = {
        (r.user_id, r.purchase_id, r.view_id, r.gap_seconds)
        for r in want_df.collect()
    }
    assert got == want
    assert len(want) > 0

    # state-eviction sanity: the streaming plan must carry watermarks
    # on both sides (otherwise state grows without bound at scale)
    n_pairs = spark.read.parquet(out).count()
    assert n_pairs == want_df.count()
