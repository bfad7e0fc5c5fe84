"""Keyword tagging (operators/keyword_tag.py) and zlib compression
quality (operators/compress_ratio.py) — r8 oracle candidates."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_tag_keywords_word_boundary(spark):
    from citus_spark.operators.keyword_tag import tag_keywords

    df = spark.createDataFrame(
        [
            (1, "Spark joins the HASH table fast"),
            (2, "hashing is not hash"),  # 'hashing' must NOT match
            (3, "no dictionary words here"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r.tags
        for r in tag_keywords(df, "text", ["hash", "join", "sort"]).collect()
    }
    assert out[1] == ["hash"]  # 'joins' != 'join' (word-boundary)
    assert out[2] == ["hash"]
    assert out[3] == []


def test_tag_keywords_plan_is_narrow(spark, docs):
    from citus_spark.operators.keyword_tag import tag_keywords

    out = tag_keywords(docs, "text", ["hash", "join"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one narrow map, no shuffle


def test_keyword_doc_frequencies(spark, docs):
    from citus_spark.operators.keyword_tag import (
        keyword_doc_frequencies,
        tag_keywords,
    )

    kws = ["hash", "join", "zzz_never"]
    freqs = {
        r.keyword: r.n_docs
        for r in keyword_doc_frequencies(docs, "text", kws).collect()
    }
    # cross-check one keyword against a direct count
    direct = (
        tag_keywords(docs, "text", kws)
        .filter(F.array_contains("tags", "hash"))
        .count()
    )
    assert freqs.get("hash") == direct > 0
    assert "zzz_never" not in freqs  # dead terms simply absent


def test_compression_stats_deterministic(spark, docs):
    from citus_spark.operators.compress_ratio import compression_stats

    a = {
        r.id: (r.raw_bytes, r.compressed_bytes)
        for r in compression_stats(docs.repartition(1), "text").collect()
    }
    b = {
        r.id: (r.raw_bytes, r.compressed_bytes)
        for r in compression_stats(docs.repartition(17), "text").collect()
    }
    assert a == b and len(a) == docs.count()


def test_compression_separates_repetition(spark):
    from citus_spark.operators.compress_ratio import compression_stats

    df = spark.createDataFrame(
        [
            (1, "spam " * 200),  # pure repetition
            (2, " ".join(f"w{i}x{i * 7 % 13}" for i in range(200))),
        ],
        "doc_id int, text string",
    )
    out = {
        r.id: r.compressed_bytes / r.raw_bytes
        for r in compression_stats(df, "text").collect()
    }
    assert out[1] < 0.1 < out[2]  # boilerplate compresses far better


def test_compression_quality_filter(spark):
    from citus_spark.operators.compress_ratio import (
        compression_quality_filter,
    )

    df = spark.createDataFrame(
        [
            (1, "spam " * 300),
            (2, "the quick brown fox jumps over the lazy dog and then "
                "discusses query planners with a marmot at length"),
        ],
        "doc_id int, text string",
    )
    kept = compression_quality_filter(df, "text").collect()
    assert [r.doc_id for r in kept] == [2]
