"""Runtime bloom-filter join pruning — Catalyst's InjectRuntimeFilter
builds a bloom filter from the selective (build) side of a shuffle
join and applies `might_contain` on the probe side BEFORE the
shuffle. This is the engine's answer to the reference's shard-pruning
+ semi-join reduction for repartition joins: at 100 TB the probe side
drops non-matching rows at the scan, shrinking the shuffle by the
join selectivity."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # creation side must be *under* this size to qualify
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_session(spark):
    old = {}
    for k, v in _CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_shuffle_join_probe_side_gets_bloom_filter(bloom_session, tmp_path):
    spark = bloom_session
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_SMALL}/part.parquet").filter(
        F.col("p_size") < 10
    )
    j = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    opt = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in opt, "probe side missing bloom filter"
    assert "bloom_filter_agg" in opt, "creation side missing bloom agg"

    # the filter prunes, never changes results
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    want = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))
