from pyspark.sql import functions as F

from citus_spark.operators.approx_limit import approx_grouped_topk, per_partition_limit
from tests.conftest import SF_SMALL


def test_per_partition_limit_bounds_rows(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").repartition(8)
    out = per_partition_limit(li, 100)
    assert out.count() <= 8 * 100


def test_grouped_topk_exact_with_enough_fetch(spark):
    """With a generous row_fetch the approximate operator equals the
    exact grouped top-k."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").repartition(8)
    approx = approx_grouped_topk(
        li, ["l_returnflag"], "l_extendedprice", k=5, row_fetch=100_000
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_returnflag").orderBy(F.desc("l_extendedprice"))
    exact = (
        li.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    )
    a = {(r.l_returnflag, r.rank): r.l_extendedprice for r in approx.collect()}
    b = {(r.l_returnflag, r.rank): r.l_extendedprice for r in exact.collect()}
    # compare values (ties may order differently between the two paths)
    assert {k: round(v, 2) for k, v in a.items()} == {
        k: round(v, 2) for k, v in b.items()
    }
