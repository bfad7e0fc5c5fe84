"""As-of join semantics on known data."""

from datetime import datetime

from citus_spark.operators.asof import asof_join


def test_asof_known_values(spark):
    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), "p1"),
            (1, datetime(2024, 1, 1, 12, 0), "p2"),
            (2, datetime(2024, 1, 1, 9, 0), "p3"),  # before any right row
        ],
        "user_id bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 30), 100),
            (1, datetime(2024, 1, 1, 10, 0), 101),  # equal ts → visible
            (1, datetime(2024, 1, 1, 11, 0), 102),
            (2, datetime(2024, 1, 1, 9, 30), 200),
        ],
        "user_id bigint, ts timestamp, snap int",
    )
    out = {
        r.tag: (r.snap_right, r.ts_right)
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert out["p1"] == (101, datetime(2024, 1, 1, 10, 0))  # ties: right wins
    assert out["p2"] == (102, datetime(2024, 1, 1, 11, 0))  # latest ≤ 12:00
    assert out["p3"] == (None, None)  # nothing at or before 9:00


def test_asof_null_in_matched_right_row(spark):
    """A NULL column in the matched right row must surface as NULL —
    not be back-filled from an older right row (all right columns must
    come from the SAME matched row, like DuckDB's native ASOF JOIN)."""
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0), "p1")],
        "user_id bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), 100, "old"),
            (1, datetime(2024, 1, 1, 11, 0), 101, None),  # matched row
        ],
        "user_id bigint, ts timestamp, snap int, label string",
    )
    rows = asof_join(left, right, on="user_id").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.snap_right == 101
    assert r.label_right is None  # NOT 'old'
    assert r.ts_right == datetime(2024, 1, 1, 11, 0)
