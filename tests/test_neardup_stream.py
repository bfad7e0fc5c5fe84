"""Streaming near-dup must equal the batch decision: a document is
flagged iff the batch MinHash-LSH pipeline pairs it (signature
agreement ≥ TAU) with a SMALLER-id document — regardless of how the
stream chops the corpus into micro-batches."""

import glob
import os

from pyspark.sql import functions as F

from citus_spark.operators.minhash import lsh_candidate_pairs
from citus_spark.streaming.neardup_stream import (
    N_BANDS,
    N_PERMS,
    SHINGLE_K,
    TAU,
    _sig_agreement,
    _sig_frame,
    apply_neardup_batch,
    run_neardup_to_table,
)
from tests.conftest import SF_SMALL


def _corpus(spark):
    """Fixture docs + planted near-dup copies (small word swaps) so
    the flagged set is non-trivial."""
    base = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .filter(F.col("doc_id") < 60)
    )
    dups = base.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return base.unionByName(dups)


def _batch_flags(spark, docs):
    """Batch oracle: flagged = larger id of any verified pair."""
    pairs = lsh_candidate_pairs(
        docs, n_perms=N_PERMS, n_bands=N_BANDS, shingle_k=SHINGLE_K
    )
    sigs = _sig_frame(docs)
    verified = (
        pairs.join(
            sigs.select(F.col("_id").alias("doc_a"), F.col("_sig").alias("sa")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("_id").alias("doc_b"), F.col("_sig").alias("sb")),
            "doc_b",
        )
        .filter(_sig_agreement("sa", "sb") >= TAU)
    )
    return {r.doc_b for r in verified.select("doc_b").distinct().collect()}


def test_streamed_flags_equal_batch(spark, tmp_path):
    docs = _corpus(spark)
    want = _batch_flags(spark, docs)
    assert len(want) >= 15  # the planted dups must be detectable

    # write the corpus as several id-ordered files: arrival order ==
    # id order, so "earlier-arrived" == "smaller id"
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = docs.orderBy("doc_id").collect()
    chunk = len(rows) // 4 + 1
    for i in range(0, len(rows), chunk):
        spark.createDataFrame(rows[i : i + chunk], docs.schema).coalesce(
            1
        ).write.parquet(os.path.join(src, f"part_{i:05d}"))
    # flatten: move each part's parquet file up so the source dir is a
    # flat file list whose lexical order matches id order
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part in enumerate(sorted(glob.glob(src + "/part_*"))):
        (f,) = glob.glob(part + "/*.parquet")
        os.rename(f, os.path.join(flat, f"{i:05d}.parquet"))

    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    run_neardup_to_table(spark, flat, idx, out)

    got_rows = spark.read.parquet(out).collect()
    assert len(got_rows) == len(rows)  # every doc emitted exactly once
    got = {r.doc_id for r in got_rows if r.is_neardup}
    assert got == want


def test_single_batch_equals_batch(spark, tmp_path):
    """All docs in ONE micro-batch: within-batch pairs alone must
    reproduce the batch decision."""
    docs = _corpus(spark)
    want = _batch_flags(spark, docs)
    flagged = apply_neardup_batch(spark, docs, str(tmp_path / "idx"))
    got = {r.doc_id for r in flagged.collect() if r.is_neardup}
    assert got == want
