"""Storage-layer parity with the reference's columnar engine
(SURVEY.md §1.3): stripes/chunks/min-max-skipping/zstd map to parquet
row groups/pages/statistics/codec — configuration, not code. These
tests observe that the configuration actually delivers.

Reference anchors (BASELINE.md): zstd total compression 5.4× vs heap;
row-group skipping is the chunk-skip analog (predicate pushdown is
asserted in test_plan_quality.py)."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _dir_size(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def test_zstd_compresses_better_than_uncompressed(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    raw = str(tmp_path / "raw")
    zstd = str(tmp_path / "zstd")
    li.write.option("compression", "none").parquet(raw)
    li.write.option("compression", "zstd").parquet(zstd)
    ratio = _dir_size(raw) / _dir_size(zstd)
    # reference reports 5.4× vs heap on wide repetitive data; this
    # narrow fixture is near-random doubles (measured ≈1.45×) — assert
    # the codec engages and round-trips, not a specific ratio
    assert ratio > 1.3, ratio
    # round-trip correctness
    back = spark.read.parquet(zstd)
    assert back.count() == li.count()
    a = li.agg(F.sum("l_extendedprice")).collect()[0][0]
    b = back.agg(F.sum("l_extendedprice")).collect()[0][0]
    assert a == b


def test_row_group_stats_enable_skipping(spark, tmp_path):
    """Sorted writes give tight min/max per row group — the
    ColumnChunkSkipNode analog. Observed via the parquet footer."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "sorted")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    (
        li.repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.option("parquet.block.size", 256 * 1024)
        .parquet(out)
    )
    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) >= 2
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        col_idx = names.index("l_shipdate")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            ranges.append((st.min, st.max))
    # row-group ranges must be narrow (sorted data ⇒ disjoint-ish):
    # a point query overlaps only a small fraction of row groups
    from datetime import datetime

    probe = datetime(1997, 6, 15)
    overlapping = sum(1 for lo, hi in ranges if lo <= probe <= hi)
    assert overlapping <= max(1, len(ranges) // 3), (overlapping, len(ranges))


def test_range_partitioned_sort_elides_exchange(spark):
    """repartitionByRange satisfies a downstream ORDER BY's
    distribution requirement — no second exchange (↔ range
    distribution / SINGLE_RANGE_PARTITION_JOIN locality)."""
    from citus_spark.sources.ingest import n_exchanges

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    ranged = li.repartitionByRange(8, F.col("l_shipdate"))
    plan_sorted = ranged.sortWithinPartitions("l_shipdate").select(
        "l_orderkey", "l_shipdate"
    )
    # exactly the one range exchange we asked for, none added
    assert n_exchanges(plan_sorted) == 1


def test_json_source_roundtrip(spark, tmp_path):
    """JSON source with explicit schema (no inference at scale)."""
    out = str(tmp_path / "events_json")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").limit(1000)
    ev.write.json(out)
    schema = "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"
    back = spark.read.schema(schema).json(out)
    assert back.count() == 1000
    a = ev.agg(F.sum("event_id")).collect()[0][0]
    b = back.agg(F.sum("event_id")).collect()[0][0]
    assert a == b


def test_jsonl_shard_export_roundtrip(spark, tmp_path):
    from citus_spark.sources.ingest import copy_to_jsonl_shards

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    out = str(tmp_path / "shards")
    copy_to_jsonl_shards(docs, out, n_shards=4, shard_col="doc_id")

    import glob

    parts = glob.glob(f"{out}/part-*")
    assert len(parts) == 4
    back = spark.read.json(out)
    assert back.count() == docs.count()
    a = {r.doc_id: (r.text, r.source) for r in docs.collect()}
    b = {int(r.doc_id): (r.text, r.source) for r in back.collect()}
    assert a == b


def test_compact_table_reduces_files_identical_content(spark, tmp_path):
    from citus_spark.sources.ingest import compact_table

    path = str(tmp_path / "fragmented")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.repartition(64).write.parquet(path)

    import glob

    assert len(glob.glob(f"{path}/*.parquet")) == 64
    before = {r.doc_id: r.text for r in spark.read.parquet(path).collect()}

    n = compact_table(spark, path, target_file_bytes=1 << 30)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == n == 1
    after = {r.doc_id: r.text for r in spark.read.parquet(path).collect()}
    assert after == before
