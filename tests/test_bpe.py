"""BPE tokenizer (operators/bpe.py — Sennrich et al. 2016 word-
histogram formulation): known-corpus merge sequence, encode/decode
roundtrip, determinism across partitionings, and the distributed
encode against a driver-side reference."""

from tests.conftest import SF_SMALL


def test_known_corpus_merge_sequence(spark):
    """The textbook example: 'low'-family corpus. With counts
    low×5, lower×2, newest×6, widest×3 the first merges must build
    'est</w>' pieces (count 9 dominates)."""
    from citus_spark.operators.bpe import bpe_train

    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6
        + [("widest",)] * 3
    )
    docs = spark.createDataFrame(rows, "text string")
    merges = bpe_train(docs, n_merges=4)
    # 'e s' (9), then 'es t' (9), then 'est </w>' (9), then 'l o' (7)
    assert merges[:4] == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")
    ], merges


def test_encode_decode_roundtrip_fixture(spark):
    from pyspark.sql import functions as F

    from citus_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        decode_tokens,
    )
    from citus_spark.queries import load_views

    load_views(spark, SF_SMALL)
    docs = spark.table("documents").select("doc_id", "text")
    merges = bpe_train(docs, n_merges=60)
    assert len(merges) > 10
    enc = bpe_encode(docs, merges)
    joined = docs.join(enc, "doc_id").collect()
    assert len(joined) == docs.count()
    for r in joined:
        # whitespace normalizes (split/join); compare token streams
        assert decode_tokens(r.bpe_tokens) == " ".join(r.text.split())
    # compression: subword tokens are fewer than characters
    stats = (
        enc.select(F.size("bpe_tokens").alias("n")).agg(
            F.sum("n").alias("total")
        ).collect()[0]
    )
    chars = docs.select(
        F.sum(F.length("text")).alias("c")
    ).collect()[0].c
    assert 0 < stats.total < chars


def test_train_deterministic_across_partitionings(spark):
    from citus_spark.operators.bpe import bpe_train
    from citus_spark.queries import load_views

    load_views(spark, SF_SMALL)
    docs = spark.table("documents").select("doc_id", "text")
    m1 = bpe_train(docs, n_merges=40)
    m2 = bpe_train(docs.repartition(13, "doc_id"), n_merges=40)
    assert m1 == m2


def test_distributed_encode_matches_reference(spark):
    from citus_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        encode_word,
    )
    from citus_spark.queries import load_views

    load_views(spark, SF_SMALL)
    docs = spark.table("documents").select("doc_id", "text").limit(20)
    merges = bpe_train(spark.table("documents"), n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r.bpe_tokens for r in bpe_encode(docs, merges).collect()}
    for r in docs.collect():
        ref = []
        for w in r.text.split():
            ref.extend(encode_word(w, ranks))
        assert got[r.doc_id] == ref


def test_min_word_count_floor(spark):
    """The histogram frequency floor (driver-memory bound at scale)
    only drops singleton words from TRAINING; encoding still covers
    them via character fallback."""
    from citus_spark.operators.bpe import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa rare")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=10, min_word_count=2)
    enc = bpe_encode(docs, merges).collect()[0].bpe_tokens
    assert "".join(enc).count("rare") == 1  # survives as char pieces
