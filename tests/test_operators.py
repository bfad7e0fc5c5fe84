"""Operator-level tests: TopN aggregate family (exact + sketch merge),
approximate aggregates' accuracy, MinHash LSH recall on synthetic
near-duplicates."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_topn_exact_matches_bruteforce(spark):
    from citus_spark.operators.topn import topn

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    got = {
        (r.event_type, r.rank): (r.user_id, r.cnt)
        for r in topn(ev, ["event_type"], "user_id", k=3).collect()
    }
    # brute force via pandas
    pdf = ev.select("event_type", "user_id").toPandas()
    for et, grp in pdf.groupby("event_type"):
        counts = grp.groupby("user_id").size().reset_index(name="n")
        counts = counts.sort_values(["n", "user_id"], ascending=[False, True])
        for i, (_, row) in enumerate(counts.head(3).iterrows(), start=1):
            assert got[(et, i)] == (row.user_id, row.n), (et, i)


def test_topn_sketch_merge_equals_global(spark):
    """Union of per-partition sketches must finalize to the global
    exact top-k (the reference's rollup-merge contract)."""
    from citus_spark.operators.topn import topn, topn_extract, topn_map, topn_union

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    # split the data in two halves, sketch each, then merge
    # slack*k must cover the distinct-item count for the merge to be
    # provably exact (150 users here); with smaller slack the sketch is
    # approximate under heavy ties — same contract as the reference's
    # truncated topn JSONB sketches.
    h1 = topn_map(ev.filter("event_id % 2 = 0"), ["event_type"], "user_id", k=3, slack=64)
    h2 = topn_map(ev.filter("event_id % 2 = 1"), ["event_type"], "user_id", k=3, slack=64)
    merged = topn_union(h1.unionAll(h2), ["event_type"], k=3, slack=64)
    got = {
        (r.event_type, r.rank): (r.item, r.cnt)
        for r in topn_extract(merged, ["event_type"], k=3).collect()
    }
    want = {
        (r.event_type, r.rank): (str(r.user_id), r.cnt)
        for r in topn(ev, ["event_type"], "user_id", k=3).collect()
    }
    # map keys come back as strings from map_from_entries on bigint?
    # normalize to str for comparison
    got = {k: (str(v[0]), v[1]) for k, v in got.items()}
    assert got == want


def test_approx_count_distinct_accuracy(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.06  # 3×rsd


def test_percentile_approx_accuracy(spark):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    row = o.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_minhash_lsh_finds_synthetic_neardups(spark):
    """Inject near-duplicate documents (one word changed) and assert
    the banded LSH surfaces them as candidate pairs."""
    from citus_spark.queries.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    # clone docs 0..19 with doc_id+10000 and one token appended
    clones = (
        docs.filter(F.col("doc_id") < 20)
        .withColumn("doc_id", F.col("doc_id") + 10000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzz")))
    )
    aug = docs.unionAll(clones)
    aug.createOrReplaceTempView("documents_aug")

    # run the same signature+band pipeline on the augmented corpus
    from pyspark.sql import DataFrame

    import citus_spark.queries.dedup as dd

    sig_src = aug
    sh = dd._shingles_spark()
    hashes = F.transform(sh, lambda x: F.md5(x))

    def mh(s):
        start, width = dd._MH_SLICES[s]
        return F.array_min(
            F.transform(
                hashes,
                lambda h: F.conv(F.substring(h, start, width), 16, 10).cast("long"),
            )
        ).alias(f"mh{s}")

    sig = sig_src.select("doc_id", *[mh(s) for s in range(4)])
    bands = sig.selectExpr("doc_id", "0 AS band", "mh0 AS h1", "mh1 AS h2").unionAll(
        sig.selectExpr("doc_id", "1 AS band", "mh2 AS h1", "mh3 AS h2")
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h1") == F.col("b.h1"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    found = {(r.da, r.db) for r in pairs.collect()}
    hits = sum(1 for i in range(20) if (i, i + 10000) in found)
    # appending one token to a ~40-token doc keeps jaccard ≈ 0.93;
    # with 2 bands of 2 minhashes expected recall is high but not 1.0
    assert hits >= 14, f"LSH recall too low: {hits}/20"


def test_chunking_covers_documents_exactly(spark):
    """Chunk i must equal text[i*stride : i*stride+chunk] verbatim and
    the last chunk must reach the end of the document — no dropped or
    duplicated characters beyond the declared overlap."""
    from citus_spark.queries import QUERIES
    from citus_spark.queries.textops import _CHUNK, _STRIDE

    chunks = QUERIES["chunk_documents_overlap"](spark, SF_SMALL).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.table("documents").select("doc_id", "text").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_no, r.chunk))
    assert set(by_doc) == set(docs)
    for doc_id, parts in by_doc.items():
        parts.sort()
        text = docs[doc_id]
        assert [p[0] for p in parts] == list(range(len(parts)))
        for no, ch in parts:
            assert ch == text[no * _STRIDE : no * _STRIDE + _CHUNK]
        last_no, last_ch = parts[-1]
        assert last_no * _STRIDE + len(last_ch) == len(text), doc_id
