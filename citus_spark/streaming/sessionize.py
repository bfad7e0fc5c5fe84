"""Stateful streaming sessionization — applyInPandasWithState.

The reference has no streaming operators (SURVEY.md §2.9); this is
extension surface: the custom-stateful-operator pattern for the cases
built-in watermark windows can't express (session semantics keyed by
user with arbitrary gap logic).

State per user: (open session start, last event ts, event count).
A batch closes a session when the gap to the next event exceeds
`gap`; timeout handling would close idle sessions in a live stream
(processing-time timeouts don't fire under availableNow batch
processing, so the final open session per user stays in state — the
test drains it by comparing only closed sessions)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MINUTES = 30

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start long, last long, n long"


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = GAP_MINUTES * 60 * 1_000_000
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    closed: list[tuple] = []
    for pdf in pdfs:
        ts_us = (
            pd.to_datetime(pdf["ts"]).astype("int64") // 1000
        ).sort_values()
        for t in ts_us:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
    state.update((start, last, n))
    if closed:
        out = pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events (streaming, with ts timestamp + user_id) → closed
    sessions. One shuffle on user_id; state lives in the state store
    (RocksDB on a real cluster)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_sessionize(
    spark: SparkSession, src_dir: str, out_path: str, queryName: str = "sessionize"
) -> None:
    from citus_spark.streaming.rollup import read_event_stream

    sessions = sessionize_stream(read_event_stream(spark, src_dir))
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", out_path + ".ckpt")
        .trigger(availableNow=True)
        .queryName(queryName)
        .start()
    )
    q.awaitTermination()
