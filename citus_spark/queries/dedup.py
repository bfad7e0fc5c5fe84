"""Deduplication family — training-data-pipeline operators.

Exact dedup is a hash-groupBy (scales to any size: one shuffle on the
content hash). Near-dup detection is MinHash+LSH: shingle → K minhash
values → band → bucket-join, which at 100 TB replaces the quadratic
all-pairs comparison with a shuffle on band keys; the expected cost is
O(n · K) plus the (tiny) candidate-pair verification. SimHash gives a
64→16-bit locality-sensitive fingerprint for Hamming-distance dedup.

Everything below is built-in Spark array/lambda expressions (JVM-side,
no Python in the hot path) and is **oracle-checked**: the hash is the
portable md5-based `hash64` (citus_spark.functions) so DuckDB computes
bit-identical signatures.

The driver corpus has no true near-dups (500 distinct random texts),
so LSH candidate sets may legitimately be empty at test scale; the
pytest suite injects synthetic near-dups to assert recall.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citus_spark.functions import hash64, hash64_duck, hash64_sql
from citus_spark.queries import (
    corpus_above_cutover,
    load_views,
    register_shared_sql,
    register_split,
)

N_MINHASH = 4  # minhash functions; bands of 2 → 2 bands
SHINGLE_K = 3  # word 3-grams

# The 4 minhash functions are 4 disjoint 32-bit slices of ONE md5 per
# shingle (1-indexed hex offsets) — one hash invocation instead of
# four. Independence of slices of a cryptographic hash is as good as
# independent hash functions for minhash purposes.
_MH_SLICES = [(1, 8), (9, 8), (17, 8), (25, 8)]

# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on content fingerprint
# (↔ reference DISTINCT machinery, ProcessDistinctClauseForWorkerQuery;
# at scale: one shuffle on md5, map-side partial counts)
register_shared_sql(
    "dedup_exact",
    """
SELECT md5(text) AS fp,
       CAST(min(doc_id) AS BIGINT) AS canonical_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY canonical_id
""",
)


# ---------------------------------------------------------------------------
# Shingling + MinHash signatures
def _shingles_spark():
    """Distinct word-3-gram shingles as an array column (Spark)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(0), n - SHINGLE_K),
        lambda i: F.array_join(F.slice(toks, i + 1, SHINGLE_K), " "),
    )
    # guard: short docs fall back to the whole text as one shingle
    return F.when(n >= SHINGLE_K, F.array_distinct(sh)).otherwise(
        F.array(F.col("text"))
    )


def _shingles_exploded(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows — the flat form of `_shingles_spark`.

    Built with explode(sequence) + slice/array_join rather than array
    higher-order functions: Spark evaluates `transform`/`aggregate`
    lambdas in the *interpreted* expression path (no whole-stage
    codegen, no common-subexpression elimination — and a struct-
    returning fold inlined by CollapseProject re-evaluates once per
    extracted field), while Generate + scalar expressions stay fully
    codegen'd. Same rows modulo duplicate shingles, which every
    consumer here is insensitive to (min-hash: min over duplicates ==
    min over distinct; contamination: semi-join is set-semantics).
    """
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", "text", toks.alias("_toks"), F.size(toks).alias("_n")
    )
    # -1 sentinel = short-doc fallback (whole text as one shingle)
    pos = F.when(
        F.col("_n") >= SHINGLE_K,
        F.sequence(F.lit(0), F.col("_n") - SHINGLE_K),
    ).otherwise(F.array(F.lit(-1)))
    ex = base.select("doc_id", "text", "_toks", F.explode(pos).alias("_i"))
    shingle = F.when(
        F.col("_i") >= 0,
        F.array_join(F.slice(F.col("_toks"), F.col("_i") + 1, SHINGLE_K), " "),
    ).otherwise(F.col("text"))
    return ex.select("doc_id", shingle.alias("shingle"))


_SHINGLES_DUCK = f"""
CASE WHEN len(string_split(text, ' ')) >= {SHINGLE_K}
     THEN list_distinct(list_transform(
            range(len(string_split(text, ' ')) - {SHINGLE_K - 1}),
            i -> array_to_string(string_split(text, ' ')[i + 1 : i + {SHINGLE_K}], ' ')))
     ELSE [text] END
"""


def _signature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered (doc_id, mh0..mh3) signatures.

    Shape: explode shingles → one md5 per row → groupBy(doc_id) with
    four min() aggregates over the hex slices. Everything is codegen'd
    scalar expressions, and the aggregation is a standard two-phase
    hash-agg — map-side partial minima reduce the shuffle to 4 longs
    per doc regardless of document length (the right 100 TB shape; an
    earlier array-fold formulation evaluated interpreted lambdas and
    was ~10× slower at the same output).
    """
    load_views(spark, sf_dir)
    # CPU-bound per-row compute: spread the rows across all cores when
    # the source is a small fixture whose (fanned-out) file count is
    # below the core count. ABOVE the corpus cutover the scan already
    # has ≥cores native splits, and the repartition was a pure extra
    # exchange moving the full document text before the explode
    # (guide §2.3 "shuffle fewer bytes": measured at native sf3 it
    # shuffled the whole 17 MiB×33-file corpus for nothing).
    docs = spark.table("documents")
    if not corpus_above_cutover(sf_dir):
        docs = docs.repartition(
            spark.sparkContext.defaultParallelism, "doc_id"
        )
    hashed = _shingles_exploded(docs).select(
        "doc_id", F.md5("shingle").alias("_h")
    )
    aggs = [
        F.min(
            F.conv(F.substring("_h", start, width), 16, 10).cast("long")
        ).alias(f"mh{i}")
        for i, (start, width) in enumerate(_MH_SLICES)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signature_frame(spark, sf_dir).orderBy("doc_id")


def _minhash_oracle() -> str:
    mh_cols = ",\n       ".join(
        f"list_min(list_transform(hashes, h -> "
        f"CAST('0x' || substr(h, {start}, {width}) AS BIGINT))) AS mh{s}"
        for s, (start, width) in enumerate(_MH_SLICES)
    )
    return f"""
WITH s AS (
  SELECT doc_id, {_SHINGLES_DUCK} AS shingles FROM documents
), hs AS (
  SELECT doc_id, list_transform(shingles, x -> md5(x)) AS hashes FROM s
)
SELECT doc_id,
       {mh_cols}
FROM hs
ORDER BY doc_id
"""


register_split("minhash_signatures", minhash_signatures, _minhash_oracle())


# ---------------------------------------------------------------------------
# LSH candidate pairs: band the signature (2 bands × 2 rows) and
# self-join on band buckets. At scale this is the whole point: the
# join shuffles on (band, h1, h2) — no all-pairs comparison.
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _signature_frame(spark, sf_dir)
    # band rows via a single explode (not a 2-leg union — a union
    # would recompute the whole signature aggregation per leg)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.col("mh0").alias("h1"),
                    F.col("mh1").alias("h2"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.col("mh2").alias("h1"),
                    F.col("mh3").alias("h2"),
                ),
            )
        ).alias("_b"),
    ).select("doc_id", "_b.band", "_b.h1", "_b.h2")
    # the band table feeds both sides of the self-join; materialize it
    # once so the signature computation doesn't run twice. At scale
    # this is a cheap narrow cache.
    bands = bands.persist()
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h1") == F.col("b.h1"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
    return pairs


def _lsh_oracle() -> str:
    mh_cols = ",\n    ".join(
        f"list_min(list_transform(hashes, h -> "
        f"CAST('0x' || substr(h, {start}, {width}) AS BIGINT))) AS mh{s}"
        for s, (start, width) in enumerate(_MH_SLICES)
    )
    return f"""
WITH s AS (
  SELECT doc_id, {_SHINGLES_DUCK} AS shingles FROM documents
), hs AS (
  SELECT doc_id, list_transform(shingles, x -> md5(x)) AS hashes FROM s
), sig AS (
  SELECT doc_id,
    {mh_cols}
  FROM hs
), bands AS (
  SELECT doc_id, 0 AS band, mh0 AS h1, mh1 AS h2 FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, mh2 AS h1, mh3 AS h2 FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


register_split("minhash_lsh_pairs", minhash_lsh_pairs, _lsh_oracle())


# ---------------------------------------------------------------------------
# SimHash (16-bit): per-token hash bits vote ±1 per position; the sign
# vector is the fingerprint. Near-dups differ in few bits (Hamming).
def simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"),
    )
    hv = hash64(F.col("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(hv, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(16)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(16):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash")).orderBy("doc_id")


def _simhash_oracle() -> str:
    bit_sums = ",\n    ".join(
        f"CAST(sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS b{b}"
        for b in range(16)
    )
    combine = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), h AS (
  SELECT doc_id, {hash64_duck("tok")} AS hv FROM tok
), bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({combine} AS BIGINT) AS simhash
FROM bits
ORDER BY doc_id
"""


register_split("simhash16", simhash16, _simhash_oracle())


# ---------------------------------------------------------------------------
# SimHash near-dup candidates, end to end: a 48-bit fingerprint (same
# per-bit token voting as simhash16 — 16 bits is a fine demo but far
# too coarse to band over thousands of documents) banded into 4×12-bit
# pieces; pairs sharing any band are verified with a JVM-side
# bit_count(xor) ≤ 3 — within the pigeonhole guarantee (≤3 differing
# bits leave ≥1 of 4 bands intact), so the candidate join is
# COMPLETE at the declared radius, exactly like the minhash and phash
# banded joins. Scale shape: the join is per-(band, value) buckets —
# never all-pairs. 48 not 64 bits so every bit weight fits a signed
# long identically in both engines (1<<63 would wrap).
_SH_BITS = 48
_SH_BANDS = 4
_SH_BAND_W = _SH_BITS // _SH_BANDS
_SH_MAXHAM = _SH_BANDS - 1


def _simhash48_frame(spark: SparkSession) -> DataFrame:
    docs = spark.table("documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"),
    )
    hv = hash64(F.col("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(hv, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(_SH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(_SH_BITS):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    sig = _simhash48_frame(spark)
    mask = (1 << _SH_BAND_W) - 1
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.lit(b) for b in range(_SH_BANDS)])
        ).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        F.expr(f"shiftright(simhash, band * {_SH_BAND_W}) & {mask}").alias("bv"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"),
        "band", "bv",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"),
        "band", "bv",
    )
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.expr("bit_count(sa ^ sb)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= _SH_MAXHAM)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _simhash48_body() -> str:
    bit_sums = ",\n    ".join(
        f"CAST(sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS b{b}"
        for b in range(_SH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SH_BITS)
    )
    return f"""
tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), h AS (
  SELECT doc_id, {hash64_duck("tok")} AS hv FROM tok
), bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM h GROUP BY doc_id
), sig AS (
  SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM bits
)"""


register_split(
    "simhash_dup_candidates",
    simhash_dup_candidates,
    f"""
WITH {_simhash48_body()},
bands AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * {_SH_BAND_W})) & {(1 << _SH_BAND_W) - 1} AS bv
  FROM sig, unnest([0, 1, 2, 3]) AS t(band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SH_MAXHAM}
ORDER BY doc_a, doc_b
""",
)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard on a bounded candidate set (the verification
# step that follows LSH; here run on a doc_id-bounded subset so the
# oracle can brute-force the same pairs). At scale the input would be
# minhash_lsh_pairs instead of the id-range cross join.
def ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 150)
    sh = docs.select("doc_id", _shingles_spark().alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Deterministic train/test split — hash-based assignment (stable under
# re-runs, additions, and re-partitioning; the only correct way to
# split at 100 TB). Portable hash64 so the oracle verifies assignment.
def _split_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    docs = spark.table("documents")
    bucket = hash64(F.col("doc_id").cast("string")) % 100
    return (
        docs.select(
            F.when(bucket < 80, "train").otherwise("test").alias("split")
        )
        .groupBy("split")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("split")
    )


register_split(
    "train_test_split",
    _split_fn,
    f"""
SELECT split, CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT CASE WHEN {hash64_duck("CAST(doc_id AS VARCHAR)")} % 100 < 80
              THEN 'train' ELSE 'test' END AS split
  FROM documents
) t
GROUP BY split
ORDER BY split
""",
)


# text normalization → canonical fingerprint (dedup robustness to
# case/punctuation/whitespace)
register_shared_sql(
    "text_normalize",
    """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''),
                               ' +', ' '))) AS norm_fp
FROM documents
ORDER BY doc_id
""",
)


# Contamination check: documents sharing any word-3-gram with a
# "benchmark" set (docs 0-9) — the eval-leak scan, as a semi-join on
# shingle hashes (shuffle on hash at scale, no all-pairs work).
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    docs = spark.table("documents")
    sh = _shingles_exploded(docs).withColumn("h", hash64(F.col("shingle")))
    bench = sh.filter(F.col("doc_id") < 10).select("h").distinct()
    return (
        sh.filter(F.col("doc_id") >= 10)
        .join(bench, "h", "left_semi")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )


register_split(
    "contamination_check",
    contamination_check,
    f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM documents
), hashed AS (
  SELECT doc_id, {hash64_duck("shingle")} AS h FROM sh
)
SELECT DISTINCT doc_id
FROM hashed
WHERE doc_id >= 10
  AND h IN (SELECT h FROM hashed WHERE doc_id < 10)
ORDER BY doc_id
""",
)


# Duplicate clustering: connected components over the LSH candidate
# pairs, canonical representative = min doc_id. Oracle: DuckDB
# recursive CTE computing the same transitive closure.
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.components import connected_components

    pairs = minhash_lsh_pairs(spark, sf_dir)
    return connected_components(pairs).orderBy("doc_id")


def _components_oracle_sql() -> str:
    mh_cols = ",\n    ".join(
        f"list_min(list_transform(hashes, h -> "
        f"CAST('0x' || substr(h, {start}, {width}) AS BIGINT))) AS mh{s}"
        for s, (start, width) in enumerate(_MH_SLICES)
    )
    return f"""
WITH RECURSIVE s AS (
  SELECT doc_id, {_SHINGLES_DUCK} AS shingles FROM documents
), hs AS (
  SELECT doc_id, list_transform(shingles, x -> md5(x)) AS hashes FROM s
), sig AS (
  SELECT doc_id,
    {mh_cols}
  FROM hs
), bands AS (
  SELECT doc_id, 0 AS band, mh0 AS h1, mh1 AS h2 FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, mh2 AS h1, mh3 AS h2 FROM sig
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
), nodes AS (
  SELECT DISTINCT u AS doc FROM edges
), reach AS (
  SELECT doc, doc AS r FROM nodes
  UNION
  SELECT e.v AS doc, reach.r
  FROM reach JOIN edges e ON e.u = reach.doc
)
SELECT doc AS doc_id, CAST(min(r) AS BIGINT) AS component
FROM reach
GROUP BY doc
ORDER BY doc_id
"""


register_split("dedup_components", dedup_components, _components_oracle_sql())


register_split(
    "ngram_jaccard_topk",
    ngram_jaccard_topk,
    f"""
WITH s AS (
  SELECT doc_id, {_SHINGLES_DUCK} AS sh FROM documents WHERE doc_id < 150
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 20
""",
)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling — per-stratum keep rates via the
# portable hash (the source-mixing / rebalancing step of a training
# pipeline). Same idiom as train_test_split: assignment depends only
# on the row key, so it is re-run-stable, partitioning-independent,
# and exactly reproducible by the oracle — unlike rand()/TABLESAMPLE.
# Rates: even-numbered sources keep 80%, odd keep 20%.
register_split(
    "stratified_sample_by_source",
    lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            f"""
WITH kept AS (
  SELECT source, doc_id
  FROM documents
  WHERE {hash64_sql("CAST(doc_id AS STRING)")} % 100 <
        CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 80 ELSE 20 END
)
SELECT source, CAST(count(*) AS BIGINT) AS n_kept
FROM kept
GROUP BY source
ORDER BY source
"""
        ),
    )[1],
    f"""
WITH kept AS (
  SELECT source, doc_id
  FROM documents
  WHERE {hash64_duck("CAST(doc_id AS VARCHAR)")} % 100 <
        CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 80 ELSE 20 END
)
SELECT source, CAST(count(*) AS BIGINT) AS n_kept
FROM kept
GROUP BY source
ORDER BY source
""",
)


# ---------------------------------------------------------------------------
# Exact duplicate-passage detection — substring-level dedup.
#
# Document-level exact/near dedup misses the dominant real-world case:
# distinct documents sharing long verbatim SPANS (boilerplate,
# licenses, quoted text). The standard training-data treatment
# ("Deduplicating Training Data Makes Language Models Better",
# Lee et al. 2022) finds all duplicated token windows of length >= k.
# A suffix array is the single-node tool; the distributed re-expression
# is the rolling k-gram fingerprint: explode every doc into its
# len-k+1 windows, hash each window, one shuffle on the hash. At
# 100 TB this is the same banded shape as MinHash — never all-pairs,
# and the k-gram stream partial-aggregates map-side.
#
# md5 keeps the fingerprint engine-portable (DuckDB computes the
# identical hash), so both entries below are value-exact oracles.
PASSAGE_K = 5  # token window length (small corpus => small k)

_GRAMS_SPARK = f"""
toks AS (
  SELECT doc_id, split(text, ' ') AS t
  FROM documents
  WHERE size(split(text, ' ')) >= {PASSAGE_K}
),
grams AS (
  SELECT doc_id,
         md5(array_join(slice(t, i + 1, {PASSAGE_K}), ' ')) AS g
  FROM toks
  LATERAL VIEW explode(sequence(0, size(t) - {PASSAGE_K})) e AS i
)
"""

_GRAMS_DUCK = f"""
toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents
  WHERE len(string_split(text, ' ')) >= {PASSAGE_K}
),
grams AS (
  SELECT doc_id,
         md5(array_to_string(t[i + 1 : i + {PASSAGE_K}], ' ')) AS g
  FROM toks, UNNEST(generate_series(0, len(t) - {PASSAGE_K})) AS u(i)
)
"""

_DUP_TOPK_BODY = """
SELECT g AS passage_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM grams
GROUP BY g
HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, passage_hash
LIMIT 20
"""

register_split(
    "dup_passages_topk",
    lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(f"WITH {_GRAMS_SPARK} {_DUP_TOPK_BODY}"),
    )[1],
    f"WITH {_GRAMS_DUCK} {_DUP_TOPK_BODY}",
)

# Per-document duplicated-content share — the filtering decision a
# pipeline actually makes ("drop/trim docs whose duplicated-window
# share exceeds X%"). Exact integer counts; ONE IEEE division per doc
# keeps the share engine-portable.
_DUP_SHARE_BODY = """
, gstat AS (
  SELECT g, count(DISTINCT doc_id) AS nd
  FROM grams
  GROUP BY g
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(CASE WHEN s.nd >= 2 THEN 1 END) AS BIGINT) AS n_dup,
       CAST(count(CASE WHEN s.nd >= 2 THEN 1 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_share
FROM grams d JOIN gstat s ON d.g = s.g
GROUP BY d.doc_id
ORDER BY dup_share DESC, d.doc_id
LIMIT 20
"""

register_split(
    "dup_passage_doc_share",
    lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(f"WITH {_GRAMS_SPARK} {_DUP_SHARE_BODY}"),
    )[1],
    f"WITH {_GRAMS_DUCK} {_DUP_SHARE_BODY}",
)


# ---------------------------------------------------------------------------
# Streaming near-dup detection, driven in batch form. The documents
# arrive as two waves (doc_id parity); each wave runs the EXACT
# micro-batch step streaming/neardup_stream.apply_neardup_batch
# executes under foreachBatch against a fresh on-disk MinHash-LSH
# index (batch≡stream equivalence under arbitrary chopping is
# pytest-checked in tests/test_neardup_stream.py). portable_hash=True
# switches the shingle hash to the md5-based hash64 so the oracle
# re-derives every signature, band bucket, and agreement decision
# bit-for-bit. is_neardup(doc) = doc near-duplicates an
# earlier-arrived or smaller-id-same-wave document at >= 50%
# signature agreement. Extension surface (the reference has no
# streaming near-dup; SURVEY.md §2.9).
_ND_PERMS, _ND_BANDS, _ND_TAU = 16, 4, 0.5


def neardup_stream_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from citus_spark.streaming.neardup_stream import apply_neardup_batch

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    idx = tempfile.mkdtemp(prefix="citus_spark_neardup_entry_")
    try:
        waves = [
            apply_neardup_batch(
                spark,
                docs.filter(F.col("doc_id") % 2 == w),
                idx,
                n_perms=_ND_PERMS,
                n_bands=_ND_BANDS,
                tau=_ND_TAU,
                portable_hash=True,
            )
            for w in (0, 1)
        ]
        # each wave is eagerly localCheckpoint'ed inside the step, so
        # the index directory is free to go before the caller collects
        return (
            waves[0]
            .unionByName(waves[1])
            .select("doc_id", "is_neardup")
            .orderBy("doc_id")
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _neardup_stream_oracle() -> str:
    from citus_spark.operators.minhash import _P31, _perm_params

    r = _ND_PERMS // _ND_BANDS
    min_agree = int(_ND_TAU * _ND_PERMS)  # count/16.0 >= 0.5 <=> count >= 8
    sig_items = ",\n      ".join(
        f"list_min(list_transform(h31, x -> ({a} * x + {b}) % {_P31}))"
        for a, b in _perm_params(_ND_PERMS)
    )
    return f"""
WITH d AS (
  SELECT doc_id, text, doc_id % 2 AS wave FROM documents
), sh AS (
  SELECT doc_id, wave, {_SHINGLES_DUCK} AS shingles FROM d
), h AS (
  SELECT doc_id, wave,
         list_transform(shingles, s -> {hash64_duck('s')} % {_P31}) AS h31
  FROM sh
), sig AS (
  SELECT doc_id, wave,
    [{sig_items}] AS sig
  FROM h
), bands AS (
  SELECT doc_id, wave, b.band AS band,
         md5(array_to_string(list_transform(
           sig[b.band * {r} + 1 : b.band * {r} + {r}],
           v -> CAST(v AS VARCHAR)), ',')) AS bucket
  FROM sig, (SELECT unnest(range({_ND_BANDS})) AS band) b
), cand AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
  FROM bands n JOIN bands o
    ON n.band = o.band AND n.bucket = o.bucket
   AND (o.wave < n.wave OR (o.wave = n.wave AND o.doc_id < n.doc_id))
), ver AS (
  SELECT DISTINCT c.new_id
  FROM cand c
  JOIN sig sn ON sn.doc_id = c.new_id
  JOIN sig so ON so.doc_id = c.old_id
  WHERE len(list_filter(range(1, {_ND_PERMS} + 1),
                        i -> sn.sig[i] = so.sig[i])) >= {min_agree}
)
SELECT d.doc_id, (v.new_id IS NOT NULL) AS is_neardup
FROM d LEFT JOIN ver v ON d.doc_id = v.new_id
ORDER BY doc_id
"""


register_split(
    "neardup_stream_batch", neardup_stream_batch, _neardup_stream_oracle()
)


# ---------------------------------------------------------------------------
# Entity resolution (record linkage) over customers with planted
# duplicates: blocking (name suffix + segment|nation) -> weighted
# levenshtein scoring -> transitive clustering
# (operators/entity_resolution.py — the Fellegi–Sunter three-stage
# shape Splink/dedupe implement). Planted dup = every 37th customer
# re-appears under a new id with the '#' dropped from its name; the
# fixture's digit-dense synthetic names also make single-digit
# neighbors in the same (segment, nation) block legitimate matches, so
# the transitive closure does real multi-hop work. Oracle: DuckDB
# re-derives the blocks, the identical similarity arithmetic
# (levenshtein scales match), and the closure via recursive CTE.
def entity_resolution_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.entity_resolution import resolve_entities

    load_views(spark, sf_dir)
    base = spark.table("customer").select(
        F.col("c_custkey").cast("long").alias("cid"),
        "c_name",
        "c_mktsegment",
        "c_nationkey",
    )
    dups = base.filter(F.col("cid") % 37 == 0).select(
        (F.col("cid") + 1000000).alias("cid"),
        F.concat(
            F.substring("c_name", 1, 8), F.substring("c_name", 10, 64)
        ).alias("c_name"),
        "c_mktsegment",
        "c_nationkey",
    )
    recs = base.unionByName(dups)
    out = resolve_entities(
        recs,
        "cid",
        blocking=[
            F.expr("right(c_name, 6)"),
            F.concat_ws(
                "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
            ),
        ],
        fields={"c_name": 2.0, "c_mktsegment": 1.0},
        threshold=0.95,
    )
    return out.orderBy("id")


# weights exactly as score_pairs computes them (w / total in Python
# doubles, pasted verbatim so both engines multiply the same constant)
_ER_W_NAME = repr(2.0 / 3.0)
_ER_W_SEG = repr(1.0 / 3.0)

register_split(
    "entity_resolution_customers",
    entity_resolution_customers,
    f"""
WITH RECURSIVE base AS (
  SELECT CAST(c_custkey AS BIGINT) AS cid, c_name, c_mktsegment, c_nationkey
  FROM customer
), dups AS (
  SELECT cid + 1000000 AS cid,
         substr(c_name, 1, 8) || substr(c_name, 10) AS c_name,
         c_mktsegment, c_nationkey
  FROM base WHERE cid % 37 = 0
), recs AS (
  SELECT * FROM base UNION ALL SELECT * FROM dups
), pairs AS (
  SELECT a.cid AS id_a, b.cid AS id_b
  FROM recs a JOIN recs b
    ON right(a.c_name, 6) = right(b.c_name, 6) AND a.cid < b.cid
  UNION
  SELECT a.cid, b.cid
  FROM recs a JOIN recs b
    ON a.c_mktsegment || '|' || CAST(a.c_nationkey AS VARCHAR)
       = b.c_mktsegment || '|' || CAST(b.c_nationkey AS VARCHAR)
   AND a.cid < b.cid
), edges0 AS (
  SELECT id_a, id_b
  FROM pairs p
  JOIN recs ra ON ra.cid = p.id_a
  JOIN recs rb ON rb.cid = p.id_b
  WHERE (1.0 - CAST(levenshtein(ra.c_name, rb.c_name) AS DOUBLE)
             / CAST(greatest(length(ra.c_name), length(rb.c_name), 1)
                    AS DOUBLE)) * {_ER_W_NAME}
      + (1.0 - CAST(levenshtein(ra.c_mktsegment, rb.c_mktsegment) AS DOUBLE)
             / CAST(greatest(length(ra.c_mktsegment),
                             length(rb.c_mktsegment), 1)
                    AS DOUBLE)) * {_ER_W_SEG}
      >= 0.95
), edges AS (
  SELECT id_a AS u, id_b AS v FROM edges0
  UNION
  SELECT id_b, id_a FROM edges0
), nodes AS (
  SELECT DISTINCT u AS n FROM edges
), reach AS (
  SELECT n AS doc, n AS r FROM nodes
  UNION
  SELECT e.v AS doc, reach.r
  FROM reach JOIN edges e ON e.u = reach.doc
), comp AS (
  SELECT doc, min(r) AS component FROM reach GROUP BY doc
)
SELECT r.cid AS id,
       CAST(coalesce(c.component, r.cid) AS BIGINT) AS cluster_id,
       (CAST(coalesce(c.component, r.cid) AS BIGINT) = r.cid) AS is_canonical
FROM recs r LEFT JOIN comp c ON r.cid = c.doc
ORDER BY id
""",
)


# ---------------------------------------------------------------------------
# Quality-aware duplicate-cluster canonical selection: the keep-best
# policy a training pipeline actually runs (SemDeDup keeps ONE doc per
# near-dup cluster; production keeps the HIGHEST-QUALITY member, not
# the smallest id). Clusters = connected components over the LSH
# candidate pairs; winner = max n_chars, doc_id tie-break. Oracle:
# recursive-CTE transitive closure + the same deterministic
# row_number. Singleton docs are trivially their own keep — the entry
# returns multi-member clusters (the rows where the policy decides).
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from citus_spark.operators.components import connected_components

    pairs = minhash_lsh_pairs(spark, sf_dir)
    comps = connected_components(pairs)  # (doc_id, component)
    docs = spark.table("documents").select("doc_id", "n_chars")
    members = comps.join(docs, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        members.withColumn("rk", F.row_number().over(w))
        .select(
            F.col("component").cast("long").alias("cluster_id"),
            "doc_id",
            "n_chars",
            (F.col("rk") == 1).alias("keep"),
        )
        .orderBy("cluster_id", "doc_id")
    )


def _keep_best_oracle() -> str:
    closure = _components_oracle_sql().rsplit("SELECT doc AS doc_id", 1)[0]
    return f"""{closure.rstrip()}, comp AS (
  SELECT doc AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
  FROM reach GROUP BY doc
)
SELECT c.cluster_id, c.doc_id, d.n_chars,
       (row_number() OVER (PARTITION BY c.cluster_id
                           ORDER BY d.n_chars DESC, c.doc_id) = 1) AS keep
FROM comp c JOIN documents d ON d.doc_id = c.doc_id
ORDER BY c.cluster_id, c.doc_id
"""


register_split(
    "dedup_keep_best_quality", dedup_keep_best_quality, _keep_best_oracle()
)


# ---------------------------------------------------------------------------
# Duplicate-cluster size histogram — the distribution a dedup run is
# judged by (how many pairs/triples/larger families the corpus holds,
# and how many rows deduplication would remove). Built on the same
# LSH → connected-components pipeline; singleton docs (no near-dup)
# are excluded, exactly like the reference-world reporting query.
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = dedup_components(spark, sf_dir)
    return (
        comp.groupBy("component")
        .count()
        .groupBy(F.col("count").alias("cluster_size"))
        .agg(F.count("*").alias("n_clusters"))
        .withColumn(
            "rows_removable",
            (F.col("cluster_size") - F.lit(1)) * F.col("n_clusters"),
        )
        .orderBy("cluster_size")
    )


register_split(
    "dup_cluster_size_histogram",
    dup_cluster_size_histogram,
    f"""
WITH comp AS ({_components_oracle_sql().replace("ORDER BY doc_id", "")}),
sizes AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
)
SELECT cluster_size, count(*) AS n_clusters,
       (cluster_size - 1) * count(*) AS rows_removable
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
""",
)


# ---------------------------------------------------------------------------
# Corpus-QA: duplication rate per source — the first report a data
# curator pulls before mixing sources (share of docs whose exact
# fingerprint already occurred anywhere in the source). Same md5
# fingerprint as dedup_exact; at scale one hash shuffle on (source,
# fp) with map-side partial counts.
register_shared_sql(
    "dedup_rate_by_source",
    """
SELECT source,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq_docs,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS dup_docs
FROM documents
GROUP BY source
ORDER BY source
""",
)
