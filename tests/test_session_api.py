"""DistributedSession management API + opt-in SQL rewrites."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_create_distributed_table_partitions(sess):
    df = sess.spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    out = sess.create_distributed_table("orders_d", df, "o_orderkey", buckets=8)
    assert out.rdd.getNumPartitions() == 8
    assert sess.catalog.get("orders_d").dist_col == "o_orderkey"


def test_alter_distributed_table(sess):
    df = sess.spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    sess.create_distributed_table("orders_a", df, "o_orderkey", buckets=8)
    out = sess.alter_distributed_table("orders_a", dist_col="o_custkey", buckets=4)
    assert out.rdd.getNumPartitions() == 4
    assert sess.catalog.get("orders_a").dist_col == "o_custkey"
    # rows unchanged by re-distribution
    assert out.count() == df.count()


def test_undistribute_table(sess):
    df = sess.spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    sess.create_distributed_table("nation_d", df, "n_nationkey", buckets=4)
    sess.undistribute_table("nation_d")
    assert sess.catalog.get("nation_d").method == "none"


def test_count_distinct_rewrite(sess):
    sess.count_distinct_error_rate = 0.02
    try:
        approx = sess.sql(
            "SELECT count(DISTINCT l_partkey) AS n FROM lineitem"
        ).collect()[0].n
    finally:
        sess.count_distinct_error_rate = None
    exact = sess.sql("SELECT count(DISTINCT l_partkey) AS n FROM lineitem").collect()[
        0
    ].n
    assert approx != exact or exact < 100  # rewrite happened (approx for big N)
    assert abs(approx - exact) / exact < 0.06


def test_pg_cast_rewrite(sess):
    sess.pg_compat = True
    try:
        rows = sess.sql(
            "SELECT o_orderkey::string AS k, '42'::bigint AS v FROM orders LIMIT 1"
        ).collect()
    finally:
        sess.pg_compat = False
    assert rows[0].v == 42 and isinstance(rows[0].k, str)


def test_rewrite_functions_pure():
    from citus_spark.plans.rewrites import pg_casts, rewrite_count_distinct

    assert (
        rewrite_count_distinct("SELECT COUNT(DISTINCT a.b) FROM t", 0.05)
        == "SELECT approx_count_distinct(a.b, 0.05) FROM t"
    )
    # plain COUNT untouched
    assert rewrite_count_distinct("SELECT count(x) FROM t") == "SELECT count(x) FROM t"
    assert pg_casts("SELECT x::int, '5'::decimal(10,2)") == (
        "SELECT CAST(x AS int), CAST('5' AS decimal(10,2))"
    )
    # '::' inside string literals / comments is data, not a cast
    assert pg_casts("WHERE c = 'x::int'") == "WHERE c = 'x::int'"
    assert pg_casts("-- y::int\nSELECT b::text") == "-- y::int\nSELECT CAST(b AS text)"
    assert pg_casts("SELECT 'it''s::odd', d::date") == (
        "SELECT 'it''s::odd', CAST(d AS date)"
    )
    assert rewrite_count_distinct(
        "SELECT COUNT(DISTINCT x) FROM t WHERE s = 'COUNT(DISTINCT y)'", 0.05
    ) == "SELECT approx_count_distinct(x, 0.05) FROM t WHERE s = 'COUNT(DISTINCT y)'"


def test_citus_tables_metadata_view(spark):
    """↔ reference citus_tables view: distribution metadata queryable
    as a DataFrame, colocated tables share a colocation_id."""
    from citus_spark.session import DistributedSession
    from tests.conftest import SF_SMALL

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    meta = {r.table_name: r for r in s.citus_tables().collect()}

    assert meta["lineitem"].citus_table_type == "hash"
    assert meta["lineitem"].distribution_column == "l_orderkey"
    assert meta["orders"].citus_table_type == "hash"
    # colocated pair: same colocation group and shard count
    assert meta["lineitem"].colocation_id == meta["orders"].colocation_id
    assert meta["lineitem"].shard_count == meta["orders"].shard_count
    assert meta["nation"].citus_table_type == "reference"
    assert meta["nation"].shard_count == 1


def test_guc_set_show_roundtrip(spark):
    from citus_spark.session import DistributedSession

    sess = DistributedSession(spark)
    sess.load_tables(SF_SMALL)
    assert sess.sql("SHOW citus.shard_count").collect()[0][0] == "32"
    sess.sql("SET citus.shard_count = 8")
    assert sess.shard_count == 8
    # the GUC becomes the default for subsequent DDL, like the reference
    df = sess.spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    out = sess.create_distributed_table("nation_guc", df, "n_nationkey")
    assert out.rdd.getNumPartitions() == 8
    assert sess.catalog.get("nation_guc").buckets == 8

    sess.sql("SET citus.count_distinct_error_rate TO 0.02")
    assert sess.count_distinct_error_rate == 0.02
    sess.sql("SET citus.count_distinct_error_rate = 0")  # 0 disables, per PG
    assert sess.count_distinct_error_rate is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown GUC"):
        sess.sql("SET citus.nonexistent = 1")
    # non-citus SET still reaches Spark's own conf handling
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    sess.sql("SET spark.sql.shuffle.partitions = 24")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "24"
    spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_create_range_distributed_table(spark, tmp_path):
    """DISTRIBUTE_BY_RANGE 'r' (pg_dist_partition.h:54-57): the
    materialized layout must give each file a DISJOINT contiguous
    range of the distribution column — the property that makes
    parquet min/max stats the PruneShards analog — and results must
    be layout-independent."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from citus_spark.catalog import DIST_RANGE
    from citus_spark.session import DistributedSession
    from tests.conftest import SF_SMALL

    s = DistributedSession(spark)
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    path = str(tmp_path / "orders_range")
    s.create_range_distributed_table(
        "orders_r", orders, "o_orderkey", buckets=8, path=path
    )
    entry = s.catalog.get("orders_r")
    assert entry.method == DIST_RANGE and entry.dist_col == "o_orderkey"

    # per-file min/max ranges are disjoint and ordered
    import glob

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(c).name for c in range(len(md.schema))]
        idx = names.index("o_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint contiguous ranges

    # results identical to the source under a range predicate
    got = spark.table("orders_r").filter(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)
    ).count()
    want = orders.filter(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)
    ).count()
    assert got == want > 0

    # textual spelling routes to the range path
    spark.read.parquet(f"{SF_SMALL}/orders.parquet") \
        .createOrReplaceTempView("orders_r2")
    s.sql(
        "SELECT create_distributed_table('orders_r2', 'o_orderkey', "
        "distribution_type => 'range', shard_count => 4)"
    )
    assert s.catalog.get("orders_r2").method == DIST_RANGE
    assert s.catalog.get("orders_r2").buckets == 4
