"""The CH stock-level join is the reference's DUAL_PARTITION_JOIN
(multi_join_order.h:38): order_line ⋈ stock on (item, warehouse),
neither side's natural key — both sides repartition at query time.

Citus's documented remedy is re-distribution: distribute both tables
on the join key so the join becomes co-located
(LOCAL_PARTITION_JOIN, multi_join_order.h:34) and never shuffles
again. This test performs exactly that workflow with the engine's
own ingest layer and asserts the plan transformation:

  raw derived tables   → join has ≥2 shuffle exchanges
  write_distributed on the item key (same bucket count)
                       → join has 0 shuffle exchanges
                         (bucketed HashPartitioning(i) satisfies the
                         (i, w) clustering requirement — partitioning
                         on a subset of the join keys co-locates;
                         requires requireAllClusterKeysForCoPartition
                         = false, set by get_spark as the engine's
                         co-located-join rule)
"""

from pyspark.sql import functions as F

from citus_spark.sources.ingest import n_exchanges, write_distributed
from tests.conftest import SF_SMALL


def _derived(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    order_line = li.select(
        F.col("l_partkey").alias("ol_i_id"),
        (F.col("l_suppkey") % 10).alias("ol_supply_w_id"),
        F.col("l_shipdate").alias("ol_delivery_d"),
    )
    wh = spark.range(10).select(F.col("id").cast("int").alias("w"))
    stock = part.crossJoin(wh).select(
        F.col("p_partkey").alias("s_i_id"),
        F.col("w").alias("s_w_id"),
        ((F.col("p_partkey") * 17 + F.col("w") * 7) % 91 + 10).alias("s_quantity"),
    )
    return order_line, stock


def _stock_level_join(spark, ol, st):
    return ol.join(
        st,
        (F.col("ol_i_id") == F.col("s_i_id"))
        & (F.col("ol_supply_w_id") == F.col("s_w_id")),
    )


def test_dual_partition_join_shuffles_then_colocates(spark):
    ol, st = _derived(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # query-time form: both sides shuffle (DUAL_PARTITION_JOIN)
        raw = _stock_level_join(spark, ol, st)
        assert n_exchanges(raw) >= 2

        # re-distribute on the item key via the engine's ingest layer
        write_distributed(ol, "t_ch_order_line", "ol_i_id", buckets=8)
        write_distributed(st, "t_ch_stock", "s_i_id", buckets=8)
        co = _stock_level_join(
            spark, spark.table("t_ch_order_line"), spark.table("t_ch_stock")
        )
        plan = co._jdf.queryExecution().executedPlan().toString()
        assert n_exchanges(co) == 0, plan

        # and the results are identical either way
        agg = lambda df: df.groupBy("s_w_id").count().orderBy("s_w_id").collect()
        assert agg(raw) == agg(co)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
