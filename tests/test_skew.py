"""Salted join must produce exactly the plain join's result while
spreading a hot key across salt partitions."""

from pyspark.sql import functions as F

from citus_spark.functions.skew import salted_join
from tests.conftest import SF_SMALL


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    # fabricate skew: map 90% of rows onto one hot key
    skewed = li.withColumn(
        "k", F.when(F.col("l_linenumber") > 1, F.lit(0)).otherwise(F.col("l_orderkey"))
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    plain = skewed.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    ).collect()[0]
    salted = salted_join(skewed, dim, "k", n_salts=8).agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    ).collect()[0]
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_salt_spreads_hot_key(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    skewed = li.withColumn("k", F.lit(0))  # everything on one key
    with_salt = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(8)).cast("int")
    )
    n_buckets = with_salt.select("_salt").distinct().count()
    assert n_buckets == 8
