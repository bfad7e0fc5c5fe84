"""Stateful streaming sessionization must agree with the batch
sessionization query on all CLOSED sessions (the final open session
per user stays in state — no timeout fires under availableNow)."""

import os
import shutil

from pyspark.sql import functions as F

from citus_spark.queries import normalize_events_ts
from tests.conftest import SF_SMALL


def test_streaming_sessions_match_batch(spark, tmp_path):
    from citus_spark.streaming.sessionize import run_sessionize

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{SF_SMALL}/events.parquet", f"{src}/events.parquet")
    out = str(tmp_path / "sessions")

    run_sessionize(spark, src, out)

    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }

    # batch reference: sessionize with the same 30-min gap, then drop
    # each user's LAST session (still open in streaming state)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").transform(normalize_events_ts)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = ev.select("user_id", "ts").withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTE")),
            1,
        ).otherwise(0),
    )
    sessions = (
        flagged.withColumn(
            "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    last_sid = sessions.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    closed = sessions.join(last_sid, "user_id").filter(
        F.col("sid") < F.col("max_sid")
    )
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in closed.collect()
    }
    assert got == want
    assert len(want) > 0


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """Streaming exact-dedup over the documents fixture (plus an
    injected duplicate file) must keep exactly one row per distinct
    content fingerprint — the batch dedup_exact semantic."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from citus_spark.streaming.dedup import run_dedup_to_table
    from tests.conftest import SF_SMALL

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    shutil.copy(f"{SF_SMALL}/documents.parquet", f"{src}/docs.parquet")
    # a second copy of the same corpus = every doc duplicated
    shutil.copy(f"{SF_SMALL}/documents.parquet", f"{src}/docs_dup.parquet")
    out = str(tmp_path / "deduped")

    run_dedup_to_table(spark, src, out)

    got = spark.read.parquet(out)
    n_distinct_fp = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(F.md5("text").alias("fp"))
        .distinct()
        .count()
    )
    assert got.count() == n_distinct_fp
    assert got.select("fp").distinct().count() == n_distinct_fp
