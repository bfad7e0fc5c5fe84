"""Weighted deterministic sampling (sequential Poisson): inclusion
must skew toward heavy items, and the ranking must be independent of
partitioning (pure hash arithmetic, no rand())."""

from pyspark.sql import functions as F

from citus_spark.queries import QUERIES
from tests.conftest import SF_SMALL


def test_sample_skews_toward_weight(spark):
    sample = QUERIES["weighted_sample_by_length"](spark, SF_SMALL)
    rows = sample.collect()
    assert len(rows) == 100
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    corpus_mean = (
        spark.table("documents")
        .agg(F.avg(F.length("text")))
        .collect()[0][0]
    )
    # length-weighted inclusion ⇒ the sample over-represents long docs
    assert sample_mean > corpus_mean * 1.1, (sample_mean, corpus_mean)


def test_sample_is_partitioning_invariant(spark):
    a = [r.doc_id for r in QUERIES["weighted_sample_by_length"](spark, SF_SMALL).collect()]
    docs = spark.table("documents").repartition(13, "source")
    docs.createOrReplaceTempView("documents")
    try:
        b = [
            r.doc_id
            for r in QUERIES["weighted_sample_by_length"](spark, SF_SMALL).collect()
        ]
    finally:
        # restore the plain view for later tests in this session
        spark._citus_views_dir = None
    assert a == b
