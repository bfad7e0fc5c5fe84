"""Text analysis over the `documents` table — training-data-pipeline
operators (language-ID, quality scoring, token counting, document
fingerprinting).

These extend the reference surface (BASELINE.json's LLM-pipeline
scope); the reference itself delegates all scalar text functions to
PostgreSQL inside shard SQL (SURVEY.md §2.2), and the same holds here:
everything below is built-in `pyspark.sql.functions` (JVM-side,
codegen'd) — no Python UDFs in the hot path, so the plan scales as a
pure map over document partitions (no shuffle at all except the
explicit aggregates).

Spark-side implementations use the DataFrame API; oracles are
DuckDB-dialect SQL (list/array function names differ between engines).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citus_spark.functions import hash64_duck, hash64_sql
from citus_spark.queries import load_views, register_shared_sql, register_split

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# per-language function-word profiles for the n-gram/keyword heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "una"),
    "zh": ("de5", "shi4", "le5", "zai4"),  # romanized placeholders
}


# ---------------------------------------------------------------------------
# Document fingerprinting — content hash (shared SQL: md5 is identical
# in both engines). The scale path for exact dedup: group by fp.
register_shared_sql(
    "text_fingerprint",
    """
SELECT doc_id, md5(text) AS fp
FROM documents
ORDER BY doc_id
""",
)

# per-source corpus stats (shared SQL)
register_shared_sql(
    "doc_stats_by_source",
    """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY source
ORDER BY source
""",
)


# ---------------------------------------------------------------------------
# Token counting — whitespace tokens + word-regex tokens ("BPE-ish"
# boundary: alnum runs). Pure narrow projection: the scan should read
# only (doc_id, text).
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.col("text"), " ")
    words = F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
    return (
        docs.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_ws_tokens"),
            F.size(words).cast("long").alias("n_word_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        )
        .orderBy("doc_id")
    )


register_split(
    "token_count",
    token_count,
    """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_word_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens
FROM documents
ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# Quality scoring — length/stopword/diversity ratios combined into one
# deterministic double. All integer counts divided as doubles, so both
# engines produce bit-identical scores.
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    n_uniq = F.size(F.array_distinct(toks))
    d = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        n_toks.cast("long").alias("n_tokens"),
        (n_stop.cast("double") / n_toks.cast("double")).alias("stopword_ratio"),
        (n_uniq.cast("double") / n_toks.cast("double")).alias("diversity"),
    )
    quality = (
        F.col("stopword_ratio") * 0.25
        + F.col("diversity") * 0.5
        + F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 500), 0.25)
        .otherwise(0.0)
    )
    return d.withColumn("quality_score", quality).orderBy("doc_id")


register_split(
    "text_quality",
    text_quality,
    f"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS len_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN {STOPWORDS!r})) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS diversity
  FROM documents
)
SELECT doc_id, len_chars, n_tokens, stopword_ratio, diversity,
       stopword_ratio * 0.25 + diversity * 0.5 +
       CASE WHEN n_tokens >= 20 AND n_tokens <= 500 THEN 0.25 ELSE 0.0 END
         AS quality_score
FROM t
ORDER BY doc_id
""".replace("'", "'"),
)


# ---------------------------------------------------------------------------
# Language ID — keyword-profile hit counts with a fixed-priority argmax.
# (The driver's synthetic corpus uses one shared vocabulary for every
# lang label, so accuracy is not measurable here; the operator is the
# deterministic scale-path plumbing: one narrow projection, no shuffle.)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.col("text"), " ")
    cols = [
        F.size(F.filter(toks, lambda x: x.isin(*words))).alias(f"hits_{lang}")
        for lang, words in LANG_PROFILES.items()
    ]
    d = docs.select("doc_id", *cols)
    # fixed priority order = dict order; strict argmax with first-wins ties
    langs = list(LANG_PROFILES)
    pred = F
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"hits_{lang}") >= F.col(f"hits_{other}")
            cond = c if cond is None else (cond & c)
        expr = (
            F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
        )
    d = d.withColumn("pred_lang", expr.otherwise(F.lit(langs[0])))
    return d.select(
        "doc_id", *[F.col(f"hits_{lang}").cast("long") for lang in langs], "pred_lang"
    ).orderBy("doc_id")


def _lang_oracle() -> str:
    hit_cols = ",\n         ".join(
        f"CAST(len(list_filter(string_split(text, ' '), x -> x IN {words!r})) AS BIGINT)"
        f" AS hits_{lang}"
        for lang, words in LANG_PROFILES.items()
    )
    langs = list(LANG_PROFILES)
    cases = []
    for lang in langs:
        conds = " AND ".join(
            f"hits_{lang} >= hits_{o}" for o in langs if o != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[0]}' END"
    return f"""
WITH t AS (
  SELECT doc_id,
         {hit_cols}
  FROM documents
)
SELECT doc_id, {', '.join('hits_' + lang for lang in langs)},
       {case_sql} AS pred_lang
FROM t
ORDER BY doc_id
"""


register_split("lang_id", lang_id, _lang_oracle())


# ---------------------------------------------------------------------------
# Multimodal plumbing entry: binary media column → mapInPandas
# (Arrow-batched) feature extraction. The payload here is the utf-8
# encoding of `text` (the fixture has no real media), so the oracle can
# verify the Arrow path end-to-end: byte length and md5 digest computed
# in pandas over BINARY must equal DuckDB's string-side values.
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.multimodal import byte_features, media_from_documents

    load_views(spark, sf_dir)
    media = media_from_documents(spark.table("documents"))
    return (
        byte_features(media)
        .select(F.col("id").alias("doc_id"), "n_bytes", "digest")
        .orderBy("doc_id")
    )


register_split(
    "multimodal_byte_stats",
    multimodal_byte_stats,
    """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes, md5(text) AS digest
FROM documents
ORDER BY doc_id
""",
)


# Video frame-sampling plumbing: the UDTF-shaped mapInPandas kernel
# (one input row → many frame rows). The fake decode chunks the
# payload into 256-byte frames and samples every 10th, which is
# exactly expressible in SQL — so the oracle verifies the whole
# Arrow explode path (row fan-out, frame offsets, tail-frame length),
# not just row counts. (`length(text)` == byte length here: the
# fixture text is ASCII, already proven by multimodal_byte_stats'
# green md5/n_bytes check.)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.multimodal import frame_sample, media_from_documents

    load_views(spark, sf_dir)
    media = media_from_documents(spark.table("documents"))
    return (
        frame_sample(media, every_n=10)
        .select(
            F.col("id").alias("doc_id"),
            "frame_no",
            F.octet_length("frame").alias("frame_bytes"),
        )
        .orderBy("doc_id", "frame_no")
    )


register_split(
    "video_frame_sample",
    video_frame_sample,
    """
WITH d AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS blen FROM documents
),
f AS (
  SELECT doc_id, blen,
         unnest(range(0, CAST(ceil(blen / 256.0) AS BIGINT), 10)) AS frame_no
  FROM d
)
SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
       CAST(CASE WHEN (frame_no + 1) * 256 <= blen THEN 256
                 ELSE blen - frame_no * 256 END AS INT) AS frame_bytes
FROM f
ORDER BY doc_id, frame_no
""",
)


# Audio feature extraction (RMS / zero-crossing-rate / duration) over
# the same binary-media path. Feature math is numpy-side (not
# SQL-expressible) → rows-only driver check; exactness is covered by
# tests/test_multimodal.py's hand-computed fixtures.
def audio_clip_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.multimodal import audio_features, media_from_documents

    load_views(spark, sf_dir)
    media = media_from_documents(spark.table("documents"))
    feats = audio_features(media).select(
        F.col("id").alias("doc_id"),
        "n_frames",
        "duration_s",
        "rms_mean",
        "zcr_mean",
    )
    # boolean contract: one feature row per document (count
    # cross-checked against the real table in both engines); features
    # in their physical ranges — rms/zcr of PCM are [0,1] by
    # definition, frames/duration non-negative (zero for the ~2/3 of
    # docs whose modality isn't audio); and at least one real audio
    # row decodes to frames. (The REAL WAV decode path is separately
    # oracle-checked value-for-value by audio_decode_roundtrip.)
    out = feats.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min((F.col("n_frames") >= 0) & (F.col("duration_s") >= 0)).alias(
            "frames_duration_nonneg"
        ),
        F.min(
            F.col("rms_mean").between(0.0, 1.0)
            & F.col("zcr_mean").between(0.0, 1.0)
        ).alias("features_in_range"),
        F.max(F.col("n_frames") > 0).alias("some_audio_decoded"),
    )
    return out


register_split(
    "audio_clip_features",
    audio_clip_features,
    """
SELECT (SELECT count(*) FROM documents) AS n_docs,
       TRUE AS frames_duration_nonneg, TRUE AS features_in_range,
       TRUE AS some_audio_decoded
""",
)


# ---------------------------------------------------------------------------
# Repetition detection — duplicate word-bigram ratio (the Gopher-rules
# "repetition" signal: heavily templated/spammy docs have a high share
# of repeated n-grams). Integer counts divided as doubles → exact.
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    bg = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", toks[i], toks[i + 1]),
        ),
    ).otherwise(F.array(F.col("text")))
    d = spark.table("documents").select(
        "doc_id",
        F.size(bg).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(bg)).cast("long").alias("n_distinct_bigrams"),
    )
    return d.withColumn(
        "dup_ratio",
        F.lit(1.0)
        - F.col("n_distinct_bigrams").cast("double")
        / F.col("n_bigrams").cast("double"),
    ).orderBy("doc_id")


register_split(
    "repetition_ratio",
    repetition_ratio,
    """
WITH b AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 2
              THEN list_transform(
                     range(len(string_split(text, ' ')) - 1),
                     i -> string_split(text, ' ')[i + 1] || ' '
                          || string_split(text, ' ')[i + 2])
              ELSE [text] END AS bg
  FROM documents
)
SELECT doc_id,
       CAST(len(bg) AS BIGINT) AS n_bigrams,
       CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams,
       1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
         AS dup_ratio
FROM b
ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# Gopher-style quality rules — mean word length, numeric-token ratio,
# long-word ratio, symbol-to-char ratio. All ratios derive from
# integer counts (exact across engines); the symbol count uses
# non-regex replace() so no dialect divergence.
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("double")
    mean_wl = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n
    )
    numeric = F.size(F.filter(toks, lambda x: x.rlike("^[0-9]+$"))).cast("double") / n
    longw = F.size(F.filter(toks, lambda x: F.length(x) > 8)).cast("double") / n
    return (
        spark.table("documents")
        .select(
            "doc_id",
            mean_wl.alias("mean_word_len"),
            numeric.alias("numeric_token_ratio"),
            longw.alias("long_word_ratio"),
        )
        .orderBy("doc_id")
    )


register_split(
    "quality_gopher_rules",
    quality_gopher_rules,
    """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents
)
SELECT doc_id,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS mean_word_len,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS numeric_token_ratio,
       CAST(len(list_filter(toks, x -> length(x) > 8)) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS long_word_ratio
FROM t
ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# PII redaction — regex scrub of email-shaped and long-digit-run
# tokens (the pre-training privacy pass). Spark's regexp_replace is
# global by default; DuckDB needs the 'g' flag — hence a split entry.
_PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PII_DIGITS = "[0-9]{4,}"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
        _PII_DIGITS,
        "<NUM>",
    )
    return (
        spark.table("documents")
        .select(
            "doc_id",
            F.md5(red).alias("redacted_fp"),
            F.length(red).cast("long").alias("redacted_len"),
            (F.length(red) != F.length("text")).alias("was_redacted"),
        )
        .orderBy("doc_id")
    )


register_split(
    "pii_redact",
    pii_redact,
    f"""
WITH r AS (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                        '{_PII_DIGITS}', '<NUM>', 'g') AS red
  FROM documents
)
SELECT doc_id, md5(red) AS redacted_fp,
       CAST(length(red) AS BIGINT) AS redacted_len,
       length(red) <> length(text) AS was_redacted
FROM r
ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# Edit-distance verification — exact Levenshtein over a bounded
# candidate set (the post-LSH verification step when shingle Jaccard
# is too coarse). levenshtein() is built into both engines with
# identical semantics → shared SQL.
register_shared_sql(
    "edit_distance_pairs",
    """
WITH c AS (SELECT doc_id, text FROM documents WHERE doc_id < 30)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
FROM c a JOIN c b ON a.doc_id < b.doc_id
ORDER BY edit_dist, doc_a, doc_b
LIMIT 20
""",
)


# ---------------------------------------------------------------------------
# Deterministic uniform sample — ORDER BY portable hash: reproducible
# across engines, re-runs, and partitionings (rand()/TABLESAMPLE are
# not), and at scale it is a single top-k (TakeOrdered), no full sort.
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        f"""
SELECT doc_id, source
FROM documents
ORDER BY {hash64_sql("CAST(doc_id AS STRING)")}, doc_id
LIMIT 100
"""
    )


register_split(
    "deterministic_sample",
    deterministic_sample,
    f"""
SELECT doc_id, source
FROM documents
ORDER BY {hash64_duck("CAST(doc_id AS VARCHAR)")}, doc_id
LIMIT 100
""",
)


# ---------------------------------------------------------------------------
# BM25 retrieval scoring — the classic bag-of-words ranker (Robertson/
# Sparck-Jones idf, k1=1.2 b=0.75), the retrieval primitive a
# training-data pipeline uses for contamination lookup and quality
# mining. Whole pipeline is explode → two grouped counts → one
# broadcastable join chain — no UDFs, every stage a plain shuffle on
# its key, so it scales like any agg. Scores are rounded to integer
# micros BEFORE ordering (ln/libm may differ in the last ulp between
# engines; a 1e-6 quantum absorbs that while keeping ranks exact).
_BM25_TERMS = "('spark', 'scan', 'dup')"
# doclen comes from array length, NOT from the exploded tokens: the
# explode fan-out (~100 rows/doc) is only materialized for the tiny
# term-filtered tf branch, so the corpus-wide path stays one narrow
# map — at 100 TB that is the difference between one scan and an
# extra full-corpus explode+shuffle.
_BM25 = """
WITH doclen AS (
  {DOCLEN}
),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avg_dl FROM doclen),
tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf FROM ({TOKS}) toks
       WHERE w IN {TERMS} GROUP BY doc_id, w),
df AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * tf * 2.2
             / (tf + 1.2 * (0.25 + 0.75 * dl / avg_dl))) AS score
  FROM tf
  JOIN df ON tf.w = df.w
  JOIN doclen ON tf.doc_id = doclen.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
FROM scored
ORDER BY score_micro DESC, doc_id
LIMIT 20
"""


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        _BM25.format(
            DOCLEN="SELECT doc_id, size(split(lower(text), ' ')) AS dl "
            "FROM documents",
            TOKS="SELECT doc_id, w FROM documents "
            "LATERAL VIEW explode(split(lower(text), ' ')) t AS w",
            TERMS=_BM25_TERMS,
        )
    )


register_split(
    "bm25_topk",
    bm25_topk,
    _BM25.format(
        DOCLEN="SELECT doc_id, len(string_split(lower(text), ' ')) AS dl "
        "FROM documents",
        TOKS="SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
        "FROM documents",
        TERMS=_BM25_TERMS,
    ),
)


# ---------------------------------------------------------------------------
# Context-window chunking — sliding window with overlap, the
# tokenize-and-pack precursor every LLM training pipeline runs
# (complement of sequence_pack: chunking splits long documents,
# packing concatenates short ones). Pure JVM expressions: one
# explode(sequence) fan-out + substring per chunk, no shuffle, scales
# as a map over document partitions. chunk=500 chars, stride=400
# (100 overlap); n_chunks = ceil((len-overlap)/stride), min 1, so
# every character is covered and the last chunk may run short.
_CHUNK, _STRIDE, _OVERLAP = 500, 400, 100

register_split(
    "chunk_documents_overlap",
    lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            f"""
SELECT doc_id, CAST(pos AS INT) AS chunk_no,
       substring(text, pos * {_STRIDE} + 1, {_CHUNK}) AS chunk,
       length(substring(text, pos * {_STRIDE} + 1, {_CHUNK})) AS n_chars
FROM documents
LATERAL VIEW explode(sequence(0,
  greatest(CAST(ceil((length(text) - {_OVERLAP}) / {_STRIDE}.0) AS INT), 1) - 1
)) t AS pos
ORDER BY doc_id, chunk_no
"""
        ),
    )[1],
    f"""
SELECT doc_id, CAST(pos AS INT) AS chunk_no,
       substring(text, CAST(pos * {_STRIDE} + 1 AS INT), {_CHUNK}) AS chunk,
       length(substring(text, CAST(pos * {_STRIDE} + 1 AS INT), {_CHUNK})) AS n_chars
FROM documents,
     unnest(range(0,
       greatest(CAST(ceil((length(text) - {_OVERLAP}) / {_STRIDE}.0) AS BIGINT), 1)
     )) AS t(pos)
ORDER BY doc_id, chunk_no
""",
)


# ---------------------------------------------------------------------------
# Weighted deterministic sample — sequential Poisson sampling
# (Ohlsson's πps approximation, the standard survey-sampling scheme):
# rank by uniform-hash / weight and take the k smallest, so inclusion
# probability is ∝ weight (here: document length — the common
# training-data mix knob "sample long documents more"). Entirely
# hash + one IEEE division, so the ranking is bit-identical across
# engines and partitionings, and at scale it is a TakeOrdered top-k,
# no full sort, no rand().
def weighted_sample_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        f"""
SELECT doc_id, source, length(text) AS n_chars
FROM documents
ORDER BY CAST({hash64_sql("CAST(doc_id AS STRING)")} AS DOUBLE)
           / CAST(GREATEST(length(text), 1) AS DOUBLE),
         doc_id
LIMIT 100
"""
    )


register_split(
    "weighted_sample_by_length",
    weighted_sample_by_length,
    f"""
SELECT doc_id, source, length(text) AS n_chars
FROM documents
ORDER BY CAST({hash64_duck("CAST(doc_id AS VARCHAR)")} AS DOUBLE)
           / CAST(GREATEST(length(text), 1) AS DOUBLE),
         doc_id
LIMIT 100
""",
)


# ---------------------------------------------------------------------------
# Image near-dup dedup via perceptual hash — aHash per item (numpy
# mapInPandas over the binary media column), then banded Hamming
# self-join (pigeonhole: ≤3 differing bits guarantees a shared 16-bit
# band) with a JVM-side bit_count verify. Numpy hashing is not
# SQL-expressible row-for-row (exactness is pinned by
# tests/test_multimodal_streaming.py's brute-force comparison); the
# boolean contract checks the join's structural guarantees: every
# emitted pair within the declared radius, canonical id_a < id_b
# ordering (each pair exactly once, no self-pairs). The REAL-decode
# pipeline is separately value-checked by image_phash_real_dedup.
def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.multimodal import (
        image_ahash,
        media_from_documents,
        phash_dup_candidates,
    )

    load_views(spark, sf_dir)
    media = media_from_documents(spark.table("documents"))
    pairs = phash_dup_candidates(image_ahash(media), max_hamming=3)
    return pairs.agg(
        F.min(F.col("hamming") <= 3).alias("all_within_radius"),
        F.min(F.col("id_a") < F.col("id_b")).alias("canonical_order"),
        F.count("*").cast("long").alias("n_pairs_nonneg"),
    ).select(
        F.coalesce("all_within_radius", F.lit(True)).alias(
            "all_within_radius"
        ),
        F.coalesce("canonical_order", F.lit(True)).alias("canonical_order"),
        (F.col("n_pairs_nonneg") >= 0).alias("n_pairs_nonneg"),
    )


register_split(
    "image_phash_dedup",
    image_phash_dedup,
    """
SELECT TRUE AS all_within_radius, TRUE AS canonical_order,
       TRUE AS n_pairs_nonneg
""",
)


# Real PNG decode, end-to-end oracle-checked: build a deterministic
# PNG per document (dims derived from text length, pixels from the
# doc's bytes) with the vendored pure-Python encoder, push it through
# decode_image(fake=False) — the REAL codec path, not the fake — and
# report the decoded dimensions, which DuckDB predicts from length()
# alone. A codec regression (wrong unfilter, bad IHDR parse, channel
# mix-up) changes decoded dims or nulls them → hash mismatch.
def image_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from citus_spark.operators.multimodal import decode_image

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")

    def encode_batch(it):
        from citus_spark.operators.imagecodec import encode_png

        for pdf in it:
            ids, blobs = [], []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                w, h = len(data) % 32 + 8, len(data) % 24 + 8
                px = np.frombuffer(data, dtype=np.uint8)
                px = np.resize(px, h * w * 3).reshape(h, w, 3)
                ids.append(i)
                blobs.append(encode_png(px))
            yield pd.DataFrame({"id": ids, "media": blobs})

    media = docs.mapInPandas(encode_batch, schema="id long, media binary")
    return (
        decode_image(media, fake=False)
        .select("id", "width", "height", "channels")
        .orderBy("id")
    )


register_split(
    "image_decode_roundtrip",
    image_decode_roundtrip,
    """
SELECT doc_id AS id,
       CAST(length(text) % 32 + 8 AS INT) AS width,
       CAST(length(text) % 24 + 8 AS INT) AS height,
       CAST(3 AS INT) AS channels
FROM documents
ORDER BY id
""",
)


# Real baseline-JPEG decode, oracle-checked (vendored T.81 codec,
# operators/jpegcodec.py): build a PER-BLOCK-UNIFORM grayscale image
# per document (dims from text length — deliberately NOT multiples of
# 8, so MCU padding and crop are exercised; block values from the
# doc's bytes), encode at quality=100 (all-ones quant table → uniform
# blocks are pure-DC and mathematically lossless), decode with the
# vendored decoder, and compare pixels. DuckDB pins the dims from
# length() and the bit_exact contract; any Huffman/marker/IDCT/
# padding regression flips a value.
def jpeg_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")

    def kernel(it):
        from citus_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

        for pdf in it:
            rows = []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                w, h = len(data) % 30 + 9, len(data) % 22 + 9
                bw, bh = -(-w // 8), -(-h // 8)
                vals = np.resize(data if len(data) else np.zeros(1, np.uint8),
                                 bh * bw).reshape(bh, bw)
                img = np.repeat(np.repeat(vals, 8, 0), 8, 1)[:h, :w]
                dec = decode_jpeg(encode_jpeg(img, quality=100))
                rows.append((
                    int(i), int(dec.shape[1]), int(dec.shape[0]),
                    int(dec.shape[2]),
                    bool(np.array_equal(dec[:, :, 0], img)),
                ))
            yield pd.DataFrame(
                rows,
                columns=["id", "width", "height", "channels", "bit_exact"],
            )

    return docs.mapInPandas(
        kernel,
        schema="id long, width int, height int, channels int, "
        "bit_exact boolean",
    ).orderBy("id")


register_split(
    "jpeg_decode_roundtrip",
    jpeg_decode_roundtrip,
    """
SELECT doc_id AS id,
       CAST(length(text) % 30 + 9 AS INT) AS width,
       CAST(length(text) % 22 + 9 AS INT) AS height,
       CAST(1 AS INT) AS channels,
       TRUE AS bit_exact
FROM documents
ORDER BY id
""",
)


# The ENTIRE real image-dedup pipeline, oracle-checked: PNG encode →
# real decode → luma aHash → banded Hamming self-join. Planted dups
# are brightness-shifted copies (+25 clipped-free by construction),
# which real aHash maps to the IDENTICAL hash (threshold is vs the
# cell mean — a uniform shift cancels), so the expected hamming-0
# pair list is exactly the planted one and DuckDB enumerates it from
# doc_ids alone. Accidental 64-bit aHash collisions between distinct
# random-content images are ~2^-60 — structurally impossible to flip
# the oracle.
def image_phash_real_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from citus_spark.operators.multimodal import (
        image_ahash,
        phash_dup_candidates,
    )

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").filter(
        "doc_id < 100"
    )

    def encode_batch(it):
        from citus_spark.operators.imagecodec import encode_png

        for pdf in it:
            ids, blobs = [], []
            for i in pdf["doc_id"]:
                # image seeded from doc_id ALONE: duplicate fixture
                # texts must not produce accidental hamming-0 pairs.
                # Pixels in [0, 230] so the +25 shift never clips.
                px = (
                    np.random.default_rng(int(i))
                    .integers(0, 231, size=(16, 16, 3))
                    .astype(np.uint8)
                )
                ids.append(i)
                blobs.append(encode_png(px))
                if i % 10 == 0:  # planted duplicate: uniform +25 shift
                    ids.append(i + 9000)
                    blobs.append(encode_png(px + 25))
            yield pd.DataFrame({"id": ids, "media": blobs})

    media = docs.mapInPandas(encode_batch, schema="id long, media binary")
    hashed = image_ahash(media, fake=False)
    return (
        phash_dup_candidates(hashed, max_hamming=0, n_bands=1)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


register_split(
    "image_phash_real_dedup",
    image_phash_real_dedup,
    """
SELECT doc_id AS id_a, doc_id + 9000 AS id_b, CAST(0 AS INT) AS hamming
FROM documents
WHERE doc_id < 100 AND doc_id % 10 = 0
ORDER BY id_a, id_b
""",
)


# Real WAV decode, end-to-end oracle-checked (same construction as
# image_decode_roundtrip): build a deterministic RIFF/PCM clip per
# document — stereo int16, sample count and sample rate derived from
# text length, channel 0 a full-scale/2 period-2 square wave
# (+16384/−16384), channel 1 silent — and push it through
# audio_features(fake=False), the REAL codec path. Every reported
# feature is then analytically exact in IEEE doubles: ±16384/32768 is
# ±0.5 exactly, so per-frame RMS is 0.5 and ZCR is 1.0, and duration
# is one int/int double division both engines perform identically.
# The silent channel 1 makes wrong-channel extraction (interleave
# bugs) flip rms to 0 → hash mismatch; a header misparse changes
# sample_rate or count → duration/n_frames mismatch.
def audio_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from citus_spark.operators.multimodal import audio_features

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")

    def encode_batch(it):
        from citus_spark.operators.audiocodec import encode_wav

        for pdf in it:
            ids, blobs = [], []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text) % 2000 + 512
                rate = 8000 + (len(text) % 5) * 1000
                left = np.where(np.arange(n) % 2 == 0, 16384, -16384)
                clip = np.stack(
                    [left, np.zeros(n, dtype=np.int64)], axis=1
                ).astype(np.int16)
                ids.append(i)
                blobs.append(encode_wav(clip, rate))
            yield pd.DataFrame({"id": ids, "media": blobs})

    media = docs.mapInPandas(encode_batch, schema="id long, media binary")
    return (
        audio_features(media, fake=False)
        .select("id", "n_frames", "duration_s", "rms_mean", "rms_max", "zcr_mean")
        .orderBy("id")
    )


register_split(
    "audio_decode_roundtrip",
    audio_decode_roundtrip,
    """
SELECT doc_id AS id,
       CAST(floor((length(text) % 2000 + 512) / 512.0) AS INT) AS n_frames,
       CAST(length(text) % 2000 + 512 AS DOUBLE)
         / CAST(8000 + (length(text) % 5) * 1000 AS DOUBLE) AS duration_s,
       CAST(0.5 AS DOUBLE) AS rms_mean,
       CAST(0.5 AS DOUBLE) AS rms_max,
       CAST(1.0 AS DOUBLE) AS zcr_mean
FROM documents
ORDER BY id
""",
)


# Real Y4M video decode, end-to-end oracle-checked: build a
# deterministic YUV4MPEG2 stream per document (frame count from text
# length, frame k's luma plane CONSTANT at (doc_id*31 + k*7) % 256,
# C420 chroma written neutral), frame-sample every 2nd frame through
# frame_sample(fake=False) — the REAL codec path — then reduce each
# sampled plane to (pixel count, mean luma). The mean of a constant
# uint8 plane over 64 pixels is that constant exactly (integer sum,
# power-of-two divide), so DuckDB predicts every value from doc_id
# and length() alone. A plane-layout bug (chroma not skipped, wrong
# stride, FRAME marker drift) shifts bytes into the luma plane →
# wrong mean or pixel count → hash mismatch.
def video_decode_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from citus_spark.operators.multimodal import frame_sample

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").filter("doc_id < 200")

    def encode_batch(it):
        from citus_spark.operators.videocodec import encode_y4m

        for pdf in it:
            ids, blobs = [], []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                nf = len(text) % 7 + 2
                lumas = (int(i) * 31 + np.arange(nf) * 7) % 256
                frames = np.broadcast_to(
                    lumas.astype(np.uint8)[:, None, None], (nf, 8, 8)
                ).copy()
                ids.append(i)
                blobs.append(encode_y4m(frames, fps=(30, 1), colorspace="420"))
            yield pd.DataFrame({"id": ids, "media": blobs})

    media = docs.mapInPandas(encode_batch, schema="id long, media binary")
    sampled = frame_sample(media, every_n=2, fake=False)

    def stats_batch(it):
        for pdf in it:
            rows = []
            for i, fn, frame in zip(pdf["id"], pdf["frame_no"], pdf["frame"]):
                plane = np.frombuffer(bytes(frame), dtype=np.uint8)
                rows.append(
                    {
                        "id": i,
                        "frame_no": fn,
                        "frame_pixels": len(plane),
                        "luma_mean": float(plane.astype(np.float64).mean()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["id", "frame_no", "frame_pixels", "luma_mean"]
            )

    return sampled.mapInPandas(
        stats_batch,
        schema="id long, frame_no int, frame_pixels int, luma_mean double",
    ).orderBy("id", "frame_no")


register_split(
    "video_decode_frame_stats",
    video_decode_frame_stats,
    """
WITH d AS (
  SELECT doc_id, length(text) % 7 + 2 AS nf
  FROM documents WHERE doc_id < 200
),
f AS (
  SELECT doc_id, unnest(range(0, nf, 2)) AS frame_no FROM d
)
SELECT doc_id AS id, CAST(frame_no AS INT) AS frame_no,
       CAST(64 AS INT) AS frame_pixels,
       CAST((doc_id * 31 + frame_no * 7) % 256 AS DOUBLE) AS luma_mean
FROM f
ORDER BY id, frame_no
""",
)


# ---------------------------------------------------------------------------
# Theta/KMV distinct sketches (operators/theta_sketch.py) — mergeable
# NDV states with intersection estimates, the set-expression query HLL
# cannot answer. Deterministic bottom-k of the portable hash, so the
# DuckDB oracle recomputes the state (and therefore the estimate)
# bit-for-bit.
_THETA_K = 256
_THETA_H = float(1 << 60)


def theta_ndv_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.theta_sketch import theta_ndv, theta_sketch

    load_views(spark, sf_dir)
    toks = spark.table("documents").select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    sk = theta_sketch(toks, ["source"], "tok", k=_THETA_K)
    return sk.select(
        "source",
        F.size("sketch").cast("long").alias("state_size"),
        theta_ndv(F.col("sketch"), k=_THETA_K).alias("ndv_est"),
    ).orderBy("source")


register_split(
    "theta_ndv_by_source",
    theta_ndv_by_source,
    f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), hh AS (
  SELECT DISTINCT source, {hash64_duck("tok")} AS h FROM tok
), r AS (
  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM hh
)
SELECT source,
       CAST(count(*) AS BIGINT) AS state_size,
       CASE WHEN count(*) < {_THETA_K} THEN CAST(count(*) AS DOUBLE)
            ELSE {float(_THETA_K - 1)} * {_THETA_H} /
                 CAST(max(CASE WHEN rn = {_THETA_K} THEN h END) AS DOUBLE) END
         AS ndv_est
FROM r WHERE rn <= {_THETA_K}
GROUP BY source
ORDER BY source
""",
)


def theta_intersection_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.theta_sketch import (
        theta_intersect_ndv,
        theta_sketch,
    )

    load_views(spark, sf_dir)
    toks = (
        spark.table("documents")
        .filter(F.col("source").isin("src0", "src1", "src2"))
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
    )
    sk = theta_sketch(toks, ["source"], "tok", k=_THETA_K)
    a, b = sk.alias("a"), sk.alias("b")
    return (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            theta_intersect_ndv(
                F.col("a.sketch"), F.col("b.sketch"), k=_THETA_K
            ).alias("intersection_est"),
        )
        .orderBy("src_a", "src_b")
    )


register_split(
    "theta_intersection_sources",
    theta_intersection_sources,
    f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
  WHERE source IN ('src0', 'src1', 'src2')
), hh AS (
  SELECT DISTINCT source, {hash64_duck("tok")} AS h FROM tok
), r AS (
  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM hh
), st AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_state,
         CASE WHEN count(*) < {_THETA_K} THEN {_THETA_H}
              ELSE CAST(max(CASE WHEN rn = {_THETA_K} THEN h END) AS DOUBLE) END
           AS theta
  FROM r WHERE rn <= {_THETA_K}
  GROUP BY source
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         least(a.theta, b.theta) AS theta
  FROM st a JOIN st b ON a.source < b.source
)
SELECT p.src_a, p.src_b,
       CAST((SELECT count(*)
             FROM r ra JOIN r rb ON ra.h = rb.h
             WHERE ra.source = p.src_a AND rb.source = p.src_b
               AND ra.rn <= {_THETA_K} AND rb.rn <= {_THETA_K}
               AND CAST(ra.h AS DOUBLE) < p.theta) AS DOUBLE)
         * {_THETA_H} / p.theta AS intersection_est
FROM pairs p
ORDER BY src_a, src_b
""",
)


# ---------------------------------------------------------------------------
# Sequence packing — concatenate the (doc_id-ordered) token stream and
# cut fixed-length training sequences; emit each document's overlap
# with each chunk. THE pretraining batch-prep step. Built on the
# distributed prefix sum (operators/prefix_sum.py — two-phase, never
# a single-task global window), then a pure-integer explode of the
# chunk range each document spans. Everything after tokenize is exact
# int arithmetic → the DuckDB oracle recomputes it bit-for-bit.
_SEQ_LEN = 512


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.prefix_sum import with_global_offset

    load_views(spark, sf_dir)
    t = spark.table("documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    o = with_global_offset(t, "doc_id", "n_tokens", out_col="tok_offset")
    first_chunk = F.floor(F.col("tok_offset") / _SEQ_LEN).cast("long")
    last_chunk = F.floor(
        (F.col("tok_offset") + F.col("n_tokens") - 1) / _SEQ_LEN
    ).cast("long")
    ex = o.select(
        "doc_id",
        "n_tokens",
        "tok_offset",
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk_id"),
    )
    # the slice of THIS doc that lands in THIS chunk (doc-local token
    # positions, [start, end) )
    c0 = F.col("chunk_id") * _SEQ_LEN
    start_in_doc = F.greatest(c0 - F.col("tok_offset"), F.lit(0))
    end_in_doc = F.least(
        c0 + _SEQ_LEN - F.col("tok_offset"), F.col("n_tokens")
    )
    return ex.select(
        "doc_id",
        "chunk_id",
        start_in_doc.cast("long").alias("tok_start"),
        end_in_doc.cast("long").alias("tok_end"),
    ).orderBy("doc_id", "chunk_id")


register_split(
    "sequence_pack",
    sequence_pack,
    f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS tok_offset
  FROM t
), ex AS (
  SELECT doc_id, n_tokens, tok_offset,
         unnest(range(CAST(floor(tok_offset / {_SEQ_LEN}.0) AS BIGINT),
                      CAST(floor((tok_offset + n_tokens - 1) / {_SEQ_LEN}.0)
                           AS BIGINT) + 1)) AS chunk_id
  FROM o
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(greatest(chunk_id * {_SEQ_LEN} - tok_offset, 0) AS BIGINT)
         AS tok_start,
       CAST(least(chunk_id * {_SEQ_LEN} + {_SEQ_LEN} - tok_offset, n_tokens)
         AS BIGINT) AS tok_end
FROM ex
ORDER BY doc_id, chunk_id
""",
)


# ---------------------------------------------------------------------------
# Training-mix reweighting — the "domain weights" computation every
# data-mix pipeline runs before sampling: per-source token counts vs a
# uniform target share, weight = target/actual. The division is one
# bigint-to-double IEEE op on exact integer aggregates, so the weights
# are bit-identical across engines. Upsampling sources (weight > 1)
# and the downsampled tail are both visible in the output.
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    docs = spark.table("documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    totals = per_src.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("n_sources"),
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (
                F.col("total_tokens").cast("double")
                / (F.col("n_sources") * F.col("n_tokens")).cast("double")
            ).alias("mix_weight"),
        )
        .orderBy("source")
    )


register_split(
    "domain_mix_weights",
    domain_mix_weights,
    """
WITH per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), totals AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       CAST(total_tokens AS DOUBLE)
         / CAST(n_sources * n_tokens AS DOUBLE) AS mix_weight
FROM per_src, totals
ORDER BY source
""",
)


# ---------------------------------------------------------------------------
# Python UDTF — the set-returning-function API surface itself
# (↔ SURVEY §2.10: PG SRFs in FROM are "recurring tuples"; Spark 4's
# @udtf is the 1:1 user-facing analog, LATERAL-joinable from SQL).
# The built-in explode path is the hot path for production n-grams
# (tokenization entries above use it); this entry pins the UDTF
# *registration + LATERAL* contract end-to-end — per-row Python fan-
# out with its own output schema — against a pure-SQL prediction.
def python_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    load_views(spark, sf_dir)

    @udtf(returnType="pos int, gram string")
    class CharNgrams:
        def eval(self, text: str, n: int):
            if text is None:
                return
            for i in range(len(text) - n + 1):
                yield i, text[i : i + n]

    spark.udtf.register("char_ngrams", CharNgrams)
    return spark.sql(
        """
SELECT doc_id, pos, gram
FROM (SELECT doc_id, substring(text, 1, 40) AS s
      FROM documents WHERE doc_id < 100),
     LATERAL char_ngrams(s, 3)
ORDER BY doc_id, pos
"""
    )


register_split(
    "python_udtf_ngrams",
    python_udtf_ngrams,
    """
WITH t AS (
  SELECT doc_id, substring(text, 1, 40) AS s
  FROM documents WHERE doc_id < 100
)
SELECT doc_id, CAST(i AS INT) AS pos, substring(s, CAST(i + 1 AS INT), 3) AS gram
FROM t, unnest(range(0, greatest(length(s) - 2, 0))) AS u(i)
ORDER BY doc_id, pos
""",
)


# Real GIF decode, oracle-checked (vendored GIF89a codec,
# operators/gifcodec.py): a palette image per document (dims from
# text length, palette and indices from the doc's bytes; every even
# doc interlaced — both row orders covered), decoded and compared
# pixel-for-pixel. GIF is lossless, so bit_exact is an equality, not
# a tolerance.
def gif_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")

    def kernel(it):
        from citus_spark.operators.gifcodec import decode_gif, encode_gif

        for pdf in it:
            rows = []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                if not len(data):
                    data = np.zeros(1, np.uint8)
                w, h = len(data) % 40 + 5, len(data) % 28 + 5
                n_pal = len(data) % 200 + 17
                pal = np.resize(data, n_pal * 3).reshape(n_pal, 3)
                idx = (np.resize(data, h * w) % n_pal).reshape(h, w)
                blob = encode_gif(idx, pal, interlace=bool(i % 2 == 0))
                dec = decode_gif(blob)
                rows.append((
                    int(i), int(dec.shape[1]), int(dec.shape[0]),
                    bool(np.array_equal(dec, pal[idx])),
                ))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "bit_exact"]
            )

    return docs.mapInPandas(
        kernel, schema="id long, width int, height int, bit_exact boolean"
    ).orderBy("id")


register_split(
    "gif_decode_roundtrip",
    gif_decode_roundtrip,
    """
SELECT doc_id AS id,
       CAST(length(text) % 40 + 5 AS INT) AS width,
       CAST(length(text) % 28 + 5 AS INT) AS height,
       TRUE AS bit_exact
FROM documents
ORDER BY id
""",
)


# ---------------------------------------------------------------------------
# N-gram language-model quality scoring — the CCNet-style "score every
# document under a corpus LM" pipeline stage, here with a bigram model
# trained ON the corpus itself in the same query (two count
# aggregations), then every document scored by its mean smoothed
# transition probability. Plan shape at 100 TB: tokenize is a narrow
# map; unigram/bigram counts are classic two-phase aggregations; the
# scoring join shuffles on the bigram key. No driver-side state at
# all — the model IS a distributed table.
#
# Cross-engine exactness: probabilities are single IEEE divisions
# (identical in both engines — unlike log(), whose last-ulp behavior
# is libm-specific). The oracle-checked score is therefore the mean
# transition probability; a log-perplexity variant is the same plan
# with sum(log(prob)) and lives outside the hash-exact contract.
# Sums use the fixed-point DSUM idiom so partition order cannot move
# the result.
from citus_spark.queries import DSUM as _DSUM

_NGRAM_SPARK_SQL = f"""
WITH toks AS (
  SELECT doc_id, split(text, ' ') AS t FROM documents
),
bg AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2
  FROM toks
  LATERAL VIEW explode(
    transform(slice(t, 1, size(t) - 1),
              (x, i) -> struct(x AS w1, element_at(t, i + 2) AS w2))
  ) e AS b
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT explode(t) AS w FROM toks) GROUP BY w
),
v AS (SELECT CAST(count(*) AS DOUBLE) AS vsz FROM uni),
bgc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM bg GROUP BY w1, w2
),
p AS (
  SELECT bg.doc_id,
         CAST(c12 AS DOUBLE) / (CAST(c1 AS DOUBLE) + vsz) AS prob
  FROM bg JOIN bgc USING (w1, w2) JOIN uni ON bg.w1 = uni.w CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       {_DSUM('prob', 'trans_score')}
FROM p GROUP BY doc_id ORDER BY doc_id
"""

_NGRAM_DUCK_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS (
  SELECT doc_id, t[u.g] AS w1, t[u.g + 1] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS u(g)
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
),
v AS (SELECT CAST(count(*) AS DOUBLE) AS vsz FROM uni),
bgc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM bg GROUP BY w1, w2
),
p AS (
  SELECT bg.doc_id,
         CAST(c12 AS DOUBLE) / (CAST(c1 AS DOUBLE) + vsz) AS prob
  FROM bg JOIN bgc USING (w1, w2) JOIN uni ON bg.w1 = uni.w CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       {_DSUM('prob', 'trans_score')}
FROM p GROUP BY doc_id ORDER BY doc_id
"""


def ngram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(_NGRAM_SPARK_SQL)


register_split("ngram_lm_quality", ngram_lm_quality, _NGRAM_DUCK_SQL)


# BPE tokenizer roundtrip (operators/bpe.py — train on the corpus,
# encode every document, decode back). Training is iterative (outside
# the SQL oracle's reach, like k-means); what IS value-exact is the
# roundtrip: the decoded stream must equal the whitespace-normalized
# source, whose length DuckDB computes independently. A wrong merge
# application, lost end-of-word marker, or dropped token changes the
# reconstruction.
def bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.bpe import bpe_encode, bpe_train

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    merges = bpe_train(docs, n_merges=80)
    enc = bpe_encode(docs, merges)
    recon = F.expr(
        "rtrim(replace(concat_ws('', bpe_tokens), '</w>', ' '))"
    )
    norm = F.expr(
        "array_join(filter(split(text, '\\\\s+'), x -> x != ''), ' ')"
    )
    return (
        docs.join(enc, "doc_id")
        .select(
            "doc_id",
            F.length(recon).cast("long").alias("reconstructed_len"),
            (recon == norm).alias("roundtrip_exact"),
        )
        .orderBy("doc_id")
    )


register_split(
    "bpe_roundtrip",
    bpe_roundtrip,
    r"""
SELECT doc_id,
       CAST(length(array_to_string(
         list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
         ' ')) AS BIGINT) AS reconstructed_len,
       TRUE AS roundtrip_exact
FROM documents
ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# IMA-ADPCM decode, end-to-end oracle-checked — the COMPRESSED audio
# path (WAVE format tag 0x11, operators/audiocodec.py). The Spark
# side synthesizes a real one-block mono IMA-ADPCM WAV per document
# (nibble i = (doc_id*7 + i*5 + 3) % 16, initial predictor/index 0)
# and decodes it through the production decode_wav dispatch. The
# oracle is a genuine INDEPENDENT re-derivation: a DuckDB recursive
# CTE implements the published IMA step arithmetic (step table +
# index table + int16 clamp) over the same nibble stream — so a
# lossy-codec entry still gets a value-exact cross-engine check.
# ↔ reference: no media codecs in citus (extension surface, SURVEY
# §2 extension); conformance vs stdlib audioop in tests/test_adpcm.py.
def adpcm_decode_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct as _struct

    import pandas as pd

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id").filter("doc_id < 40")

    def decode_batch(it):
        from citus_spark.operators.audiocodec import decode_wav

        for pdf in it:
            out_id, out_i, out_s = [], [], []
            for did in pdf["doc_id"]:
                nibs = [(int(did) * 7 + i * 5 + 3) % 16 for i in range(128)]
                data = bytes(
                    (nibs[j] & 0xF) | ((nibs[j + 1] & 0xF) << 4)
                    for j in range(0, 128, 2)
                )
                block = _struct.pack("<hBB", 0, 0, 0) + data
                fmt = _struct.pack(
                    "<HHIIHHHH", 0x11, 1, 8000, 4000, len(block), 4, 2, 129
                )
                body = (
                    b"WAVE"
                    + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                    + b"fact" + _struct.pack("<II", 4, 129)
                    + b"data" + _struct.pack("<I", len(block)) + block
                )
                wav = b"RIFF" + _struct.pack("<I", len(body)) + body
                samples, rate = decode_wav(wav)
                assert rate == 8000 and samples.shape == (129, 1)
                for i, s in enumerate(samples[:, 0]):
                    out_id.append(int(did))
                    out_i.append(i)
                    out_s.append(int(s))
            yield pd.DataFrame({"id": out_id, "i": out_i, "sample": out_s})

    return (
        docs.mapInPandas(decode_batch, schema="id long, i int, sample int")
        .orderBy("id", "i")
    )


def _adpcm_oracle() -> str:
    from citus_spark.operators.audiocodec import _IMA_STEP_TABLE

    steps = ",".join(f"({i},{int(v)})" for i, v in enumerate(_IMA_STEP_TABLE))
    return f"""
WITH RECURSIVE steps(si, sv) AS (VALUES {steps}),
docs AS (SELECT doc_id FROM documents WHERE doc_id < 40),
dec(doc_id, i, pred, idx) AS (
  SELECT doc_id, 0, 0, 0 FROM docs
  UNION ALL
  SELECT doc_id, i + 1,
         greatest(-32768, least(32767,
           pred + CASE WHEN (nb & 8) = 8 THEN -dmag ELSE dmag END)),
         greatest(0, least(88, idx +
           CASE (nb & 7) WHEN 4 THEN 2 WHEN 5 THEN 4
                         WHEN 6 THEN 6 WHEN 7 THEN 8 ELSE -1 END))
  FROM (
    SELECT d.*, ((d.doc_id * 7 + d.i * 5 + 3) % 16) AS nb,
           (s.sv >> 3)
           + CASE WHEN (((d.doc_id * 7 + d.i * 5 + 3) % 16) & 1) = 1
                  THEN (s.sv >> 2) ELSE 0 END
           + CASE WHEN (((d.doc_id * 7 + d.i * 5 + 3) % 16) & 2) = 2
                  THEN (s.sv >> 1) ELSE 0 END
           + CASE WHEN (((d.doc_id * 7 + d.i * 5 + 3) % 16) & 4) = 4
                  THEN s.sv ELSE 0 END AS dmag
    FROM dec d JOIN steps s ON s.si = d.idx
    WHERE d.i < 128
  )
)
SELECT CAST(doc_id AS BIGINT) AS id, CAST(i AS INT) AS i,
       CAST(pred AS INT) AS sample
FROM dec ORDER BY id, i
"""


register_split("adpcm_decode_spec", adpcm_decode_spec, _adpcm_oracle())


# ---------------------------------------------------------------------------
# MJPEG-AVI decode, end-to-end oracle-checked — the COMPRESSED video
# path (operators/avicodec.py over operators/jpegcodec.py). Same
# construction as video_decode_frame_stats, but the per-doc blob is a
# RIFF/'AVI ' container whose frames are real baseline JPEGs: each
# sampled frame goes through RIFF walk → movi chunk → huffman decode →
# IDCT. Constant-luma 16x16 frames are BIT-exact under the q100
# flat-1 quantizer (the jpegcodec oracle contract), so DuckDB
# predicts every pixel count and mean from doc_id and length() alone.
def mjpeg_avi_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from citus_spark.operators.multimodal import frame_sample

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").filter("doc_id < 60")

    def encode_batch(it):
        from citus_spark.operators.avicodec import encode_avi_mjpeg

        for pdf in it:
            ids, blobs = [], []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                nf = len(text) % 5 + 2
                lumas = (int(i) * 13 + np.arange(nf) * 11) % 256
                frames = np.broadcast_to(
                    lumas.astype(np.uint8)[:, None, None], (nf, 16, 16)
                ).copy()
                ids.append(i)
                blobs.append(encode_avi_mjpeg(frames, fps=(30, 1)))
            yield pd.DataFrame({"id": ids, "media": blobs})

    media = docs.mapInPandas(encode_batch, schema="id long, media binary")
    sampled = frame_sample(media, every_n=2, fake=False)

    def stats_batch(it):
        for pdf in it:
            rows = []
            for i, fn, frame in zip(pdf["id"], pdf["frame_no"], pdf["frame"]):
                plane = np.frombuffer(bytes(frame), dtype=np.uint8)
                rows.append(
                    {
                        "id": i,
                        "frame_no": fn,
                        "frame_pixels": len(plane),
                        "luma_mean": float(plane.astype(np.float64).mean()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["id", "frame_no", "frame_pixels", "luma_mean"]
            )

    return sampled.mapInPandas(
        stats_batch,
        schema="id long, frame_no int, frame_pixels int, luma_mean double",
    ).orderBy("id", "frame_no")


register_split(
    "mjpeg_avi_frame_stats",
    mjpeg_avi_frame_stats,
    """
WITH d AS (
  SELECT doc_id, length(text) % 5 + 2 AS nf
  FROM documents WHERE doc_id < 60
),
f AS (
  SELECT doc_id, unnest(range(0, nf, 2)) AS frame_no FROM d
)
SELECT doc_id AS id, CAST(frame_no AS INT) AS frame_no,
       CAST(256 AS INT) AS frame_pixels,
       CAST((doc_id * 13 + frame_no * 11) % 256 AS DOUBLE) AS luma_mean
FROM f
ORDER BY id, frame_no
""",
)


# ---------------------------------------------------------------------------
# Count-min sketch (operators/cms.py) — mergeable frequency-estimate
# states; the "how often did ANY key occur" question TopN's bounded
# list cannot answer. Seeded portable hashes → the DuckDB oracle
# re-derives the sparse counter state bit-for-bit, so the estimates
# AND the state checksum are value-exact. est >= exact (CMS is
# one-sided) travels as data the oracle reproduces.
_CMS_D, _CMS_W = 4, 256


def cms_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.cms import cms_estimate, cms_sketch

    load_views(spark, sf_dir)
    ev = spark.table("events").select("user_id")
    sk = cms_sketch(ev, [], "user_id", depth=_CMS_D, width=_CMS_W)
    q = spark.createDataFrame(
        [(i,) for i in range(1, 6)], "user_id long"
    )
    est = q.crossJoin(sk).select(
        "user_id",
        cms_estimate(
            F.col("sketch"), F.col("user_id"),
            depth=_CMS_D, width=_CMS_W,
        ).alias("est"),
        F.size("sketch").cast("long").alias("state_entries"),
        F.aggregate(
            F.col("sketch"),
            F.lit(0).cast("long"),
            lambda acc, s: acc + s.pos * s.cnt,
        ).alias("state_checksum"),
    )
    exact = (
        spark.table("events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("exact"))
    )
    return (
        est.join(exact, "user_id", "left")
        .select(
            "user_id",
            "est",
            F.coalesce("exact", F.lit(0)).cast("long").alias("exact"),
            (F.col("est") >= F.coalesce("exact", F.lit(0)))
            .alias("est_is_upper_bound"),
            "state_entries",
            "state_checksum",
        )
        .orderBy("user_id")
    )


_CMS_HASH = hash64_duck("i || ':' || CAST(user_id AS VARCHAR)")

register_split(
    "cms_user_frequency",
    cms_user_frequency,
    f"""
WITH seeds AS (SELECT unnest([0, 1, 2, 3]) AS i),
pos AS (
  SELECT e.user_id, s.i,
         s.i * {_CMS_W} + {_CMS_HASH} % {_CMS_W} AS pos
  FROM events e, seeds s
),
counters AS (
  SELECT pos, CAST(count(*) AS BIGINT) AS cnt FROM pos GROUP BY pos
),
state AS (
  SELECT CAST(count(*) AS BIGINT) AS state_entries,
         CAST(sum(pos * cnt) AS BIGINT) AS state_checksum
  FROM counters
),
q AS (SELECT unnest([1, 2, 3, 4, 5]) AS user_id),
qpos AS (
  SELECT q.user_id, s.i,
         s.i * {_CMS_W} + {_CMS_HASH} % {_CMS_W} AS pos
  FROM q, seeds s
),
est AS (
  SELECT user_id,
         CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
  FROM qpos LEFT JOIN counters c USING (pos)
  GROUP BY user_id
),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact
  FROM events GROUP BY user_id
)
SELECT e.user_id, e.est,
       CAST(coalesce(x.exact, 0) AS BIGINT) AS exact,
       e.est >= coalesce(x.exact, 0) AS est_is_upper_bound,
       state.state_entries, state.state_checksum
FROM est e LEFT JOIN exact x USING (user_id), state
ORDER BY e.user_id
""",
)


# Bloom filter columns (operators/bloom.py) — mergeable membership
# states (the data-side counterpart of the planner's runtime
# bloom-filter injection): a per-group bloom of its key set answers
# "definitely not present" from a rollup. No false negatives by
# construction — n_maybe >= n_true per group, both value-exact (the
# oracle re-derives the set bits from the same seeded hashes).
_BLOOM_BITS, _BLOOM_K = 2048, 4


def bloom_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.bloom import bloom_build, bloom_maybe_contains

    load_views(spark, sf_dir)
    ev = spark.table("events").select("event_type", "user_id")
    blooms = bloom_build(
        ev, ["event_type"], "user_id",
        bits=_BLOOM_BITS, hashes=_BLOOM_K,
    )
    users = ev.select("user_id").distinct()
    maybe = (
        users.crossJoin(blooms)
        .filter(bloom_maybe_contains(
            F.col("bloom"), F.col("user_id"),
            bits=_BLOOM_BITS, hashes=_BLOOM_K,
        ))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_maybe"))
    )
    true_members = ev.distinct().groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_true")
    )
    state = blooms.select(
        "event_type",
        F.size("bloom").cast("long").alias("bits_set"),
        F.aggregate(
            F.col("bloom"), F.lit(0).cast("long"), lambda a, p: a + p
        ).alias("bits_checksum"),
    )
    return (
        maybe.join(true_members, "event_type")
        .join(state, "event_type")
        .select(
            "event_type", "n_maybe", "n_true",
            (F.col("n_maybe") >= F.col("n_true")).alias("no_false_negatives"),
            "bits_set", "bits_checksum",
        )
        .orderBy("event_type")
    )


_BLOOM_HASH = hash64_duck("i || ':' || CAST(user_id AS VARCHAR)")

register_split(
    "bloom_users_by_type",
    bloom_users_by_type,
    f"""
WITH seeds AS (SELECT unnest([0, 1, 2, 3]) AS i),
bits AS (
  SELECT DISTINCT e.event_type,
         {_BLOOM_HASH} % {_BLOOM_BITS} AS p
  FROM events e, seeds
),
users AS (SELECT DISTINCT user_id FROM events),
upos AS (
  SELECT u.user_id, seeds.i,
         {_BLOOM_HASH} % {_BLOOM_BITS} AS p
  FROM users u, seeds
),
maybe AS (
  SELECT b.event_type, u.user_id
  FROM upos u JOIN bits b USING (p)
  GROUP BY b.event_type, u.user_id
  HAVING count(DISTINCT u.i) = {_BLOOM_K}
),
n_maybe AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_maybe
  FROM maybe GROUP BY event_type
),
n_true AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_true
  FROM events GROUP BY event_type
),
state AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS bits_set,
         CAST(sum(p) AS BIGINT) AS bits_checksum
  FROM bits GROUP BY event_type
)
SELECT t.event_type, m.n_maybe, t.n_true,
       m.n_maybe >= t.n_true AS no_false_negatives,
       s.bits_set, s.bits_checksum
FROM n_true t JOIN n_maybe m USING (event_type)
JOIN state s USING (event_type)
ORDER BY t.event_type
""",
)


# ---------------------------------------------------------------------------
# Composite quality filter — the FineWeb/C4-style keep/drop decision a
# pre-training pipeline applies per document, expressed as a rule DAG
# whose every term is exact integer arithmetic (counts and count
# ratios), so keep flags are bit-identical across engines and
# partitionings. Real pipelines tune thresholds per corpus; these are
# set to discriminate on the fixture (each rule passes most but not
# all documents). One scan, no shuffle (the final ORDER BY is the
# driver-compare convention, not part of the operator).
_QF_MIN_WORDS = 30
_QF_MAX_MEAN_WL = 4.6          # mean word length ceiling
_QF_MIN_STOPWORD = 0.04       # 'a'/'the' share floor (prose-likeness)
_QF_MAX_DUP_BIGRAM = 0.05     # repetition ceiling


def composite_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    nd = n.cast("double")
    mean_wl = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / nd
    )
    stop = (
        F.size(F.filter(toks, lambda x: x.isin("a", "the"))).cast("double") / nd
    )
    bg = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", toks[i], toks[i + 1]),
        ),
    ).otherwise(F.array(F.col("text")))
    dup = (
        F.lit(1.0)
        - F.size(F.array_distinct(bg)).cast("double") / F.size(bg).cast("double")
    )
    d = spark.table("documents").select(
        "doc_id",
        (n >= _QF_MIN_WORDS).alias("len_ok"),
        (mean_wl <= _QF_MAX_MEAN_WL).alias("word_len_ok"),
        (stop >= _QF_MIN_STOPWORD).alias("stopword_ok"),
        (dup <= _QF_MAX_DUP_BIGRAM).alias("repetition_ok"),
    )
    return d.withColumn(
        "keep",
        F.col("len_ok") & F.col("word_len_ok") & F.col("stopword_ok")
        & F.col("repetition_ok"),
    ).orderBy("doc_id")


register_split(
    "composite_quality_filter",
    composite_quality_filter,
    f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) AS mean_wl,
         CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) AS stop_ratio,
         CASE WHEN len(toks) >= 2
              THEN list_transform(
                     range(len(toks) - 1),
                     i -> toks[i + 1] || ' ' || toks[i + 2])
              ELSE [text] END AS bg
  FROM t
)
SELECT doc_id,
       n >= {_QF_MIN_WORDS} AS len_ok,
       mean_wl <= {_QF_MAX_MEAN_WL} AS word_len_ok,
       stop_ratio >= {_QF_MIN_STOPWORD} AS stopword_ok,
       1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
         <= {_QF_MAX_DUP_BIGRAM} AS repetition_ok,
       (n >= {_QF_MIN_WORDS})
         AND (mean_wl <= {_QF_MAX_MEAN_WL})
         AND (stop_ratio >= {_QF_MIN_STOPWORD})
         AND (1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)
                / CAST(len(bg) AS DOUBLE) <= {_QF_MAX_DUP_BIGRAM}) AS keep
FROM m
ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# Vocabulary coverage — the tokenizer-construction primitive: rank
# corpus token types by frequency and report each top-N type's
# cumulative share of all token occurrences (the curve that decides
# vocab size). Two-phase distributable: per-partition partial counts
# combine in one hash shuffle; only the top-N survivors (tiny) sort
# for the running share. Counts are exact integers; the single double
# division per row is identical scalar IEEE in both engines.
_VOCAB_TOP_N = 50


def vocab_coverage_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    load_views(spark, sf_dir)
    tok = (
        spark.table("documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    # top-N FIRST via orderBy+limit (Spark plans TakeOrdered — a
    # distributed per-partition heap, never a global sort of the full
    # vocabulary); the running sum then windows over only N rows, and
    # it is self-contained because every higher-ranked row is inside
    # the top-N by construction.
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(_VOCAB_TOP_N)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    ranked = top.withColumn("rank", F.row_number().over(w)).withColumn(
        "cum_n",
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "token",
            F.col("n").cast("long").alias("n"),
            (F.col("cum_n").cast("double") / F.col("t").cast("double"))
            .alias("cum_share"),
        )
        .orderBy("rank")
    )


register_split(
    "vocab_coverage_topn",
    vocab_coverage_topn,
    f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token
), ranked AS (
  SELECT token, n,
         row_number() OVER (ORDER BY n DESC, token) AS rank,
         sum(n) OVER (ORDER BY n DESC, token
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_n
  FROM counts
)
SELECT CAST(rank AS INT) AS rank, token, CAST(n AS BIGINT) AS n,
       CAST(cum_n AS DOUBLE)
         / CAST((SELECT sum(n) FROM counts) AS DOUBLE) AS cum_share
FROM ranked WHERE rank <= {_VOCAB_TOP_N}
ORDER BY rank
""",
)


# ---------------------------------------------------------------------------
# Zipf slope of the token-frequency distribution — the standard
# corpus-health diagnostic a pretraining pipeline tracks (a healthy
# natural-language corpus sits near slope -1; template/boilerplate
# corpora flatten). slope = covar_pop(log rank, log freq) /
# var_pop(log rank) over the top-100 terms; ranking is made
# deterministic by (freq DESC, token ASC), per-row log() is the same
# IEEE double in both engines, and the 100-term sums use the DSUM
# fixed-point idiom so accumulation order cannot move the hash.
def zipf_slope_tokens(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(_ZIPF_SQL)


_ZIPF_SQL = f"""
WITH tok AS (
  SELECT explode(split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token
), ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE))
           AS lr,
         ln(CAST(n AS DOUBLE)) AS lf
  FROM counts
  ORDER BY n DESC, token
  LIMIT 100
), sums AS (
  SELECT count(*) AS k,
         {_DSUM('lr', 's_lr')},
         {_DSUM('lf', 's_lf')},
         {_DSUM('lr * lf', 's_lrlf')},
         {_DSUM('lr * lr', 's_lrlr')}
  FROM ranked
)
SELECT CAST(k AS BIGINT) AS n_terms,
       CAST(floor((s_lrlf - s_lr * s_lf / k)
                  / (s_lrlr - s_lr * s_lr / k) * 10000.0 + 0.5) AS BIGINT)
         AS slope_e4
FROM sums
"""

_ZIPF_ORACLE = _ZIPF_SQL.replace(
    "explode(split(text, ' '))", "unnest(string_split(text, ' '))"
)

register_split("zipf_slope_tokens", zipf_slope_tokens, _ZIPF_ORACLE)


# ---------------------------------------------------------------------------
# Content-defined chunking — boundaries from a rolling token hash
# (the FastCDC/rsync idea at token granularity: a boundary wherever
# the hash of the current token ≡ 0 mod 2^B). Unlike fixed-width
# chunking, insertions only shift boundaries locally, so chunk-level
# dedup survives edits. The hash is an explicit 31-polynomial over
# codepoints — bit-identical in Spark and DuckDB, no engine hash()
# involved. Output: per-doc chunk count + mean chunk length (exact
# integer arithmetic).
_CDC_MOD = 16


def content_defined_chunks(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(
        f"""
WITH tok AS (
  SELECT doc_id, filter(split(text, ' '), x -> x <> '') AS toks
  FROM documents
), hashed AS (
  SELECT doc_id, size(toks) AS n_toks,
         size(filter(transform(toks,
              t -> aggregate(split(t, ''),
                             0L, (acc, c) -> (acc * 31 + ascii(c))
                                             % 1000000007L)),
              h -> h % {_CDC_MOD} = 0)) AS n_bounds
  FROM tok
)
SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
       CAST(n_bounds + 1 AS BIGINT) AS n_chunks,
       CAST(n_toks DIV (n_bounds + 1) AS BIGINT) AS mean_chunk_len
FROM hashed ORDER BY doc_id LIMIT 300
"""
    )


register_split(
    "content_defined_chunks",
    content_defined_chunks,
    f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), hashed AS (
  SELECT doc_id, len(toks) AS n_toks,
         len(list_filter(list_transform(toks,
              t -> list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split_regex(t, ''),
                                      c -> CAST(ord(c) AS BIGINT))),
                     (acc, c) -> (acc * 31 + c) % 1000000007)),
              h -> h % {_CDC_MOD} = 0)) AS n_bounds
  FROM tok
)
SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
       CAST(n_bounds + 1 AS BIGINT) AS n_chunks,
       CAST(n_toks // (n_bounds + 1) AS BIGINT) AS mean_chunk_len
FROM hashed ORDER BY doc_id LIMIT 300
""",
)


# ---------------------------------------------------------------------------
# Sentence segmentation stats — the per-document shape features a
# quality filter consumes (sentence count, mean sentence length,
# longest run). Split on [.!?]+, tokens on whitespace; everything is
# exact integer arithmetic over the same regex semantics.
def sentence_stats(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(
        """
WITH sent AS (
  SELECT doc_id,
         filter(transform(split(text, '[.!?]+'), s -> trim(s)),
                s -> s <> '') AS sentences
  FROM documents
), stats AS (
  SELECT doc_id, size(sentences) AS n_sentences,
         transform(sentences,
                   s -> size(filter(split(s, ' '), w -> w <> '')))
           AS lens
  FROM sent
)
SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(aggregate(lens, 0, (a, x) -> a + x) AS BIGINT) AS n_words,
       CAST(coalesce(array_max(lens), 0) AS BIGINT) AS max_sentence_len
FROM stats ORDER BY doc_id LIMIT 300
"""
    )


register_split(
    "sentence_stats",
    sentence_stats,
    """
WITH sent AS (
  SELECT doc_id,
         list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                                    s -> trim(s)),
                     s -> s <> '') AS sentences
  FROM documents
), stats AS (
  SELECT doc_id, len(sentences) AS n_sentences,
         list_transform(sentences,
             s -> len(list_filter(string_split(s, ' '), w -> w <> '')))
           AS lens
  FROM sent
)
SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(coalesce(list_sum(lens), 0) AS BIGINT) AS n_words,
       CAST(coalesce(list_max(lens), 0) AS BIGINT) AS max_sentence_len
FROM stats ORDER BY doc_id LIMIT 300
""",
)


# ---------------------------------------------------------------------------
# Lexical diversity — type-token ratio per document plus the corpus
# hapax share (tokens occurring exactly once), the standard
# boilerplate/synthetic-text detectors. All-integer output (TTR in
# basis points via integer division) so the comparison is exact.
def lexical_diversity_stats(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(
        """
WITH tok AS (
  SELECT doc_id, filter(split(text, ' '), x -> x <> '') AS toks
  FROM documents
), per_doc AS (
  SELECT doc_id,
         size(toks) AS n_tokens,
         size(array_distinct(toks)) AS n_types
  FROM tok
), corpus AS (
  SELECT count(*) AS n_hapax FROM (
    SELECT token FROM (
      SELECT explode(toks) AS token FROM tok
    ) GROUP BY token HAVING count(*) = 1
  )
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(n_types * 10000 DIV n_tokens AS BIGINT) AS ttr_bp,
       (SELECT CAST(n_hapax AS BIGINT) FROM corpus) AS corpus_hapax
FROM per_doc ORDER BY doc_id LIMIT 300
"""
    )


register_split(
    "lexical_diversity_stats",
    lexical_diversity_stats,
    """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), per_doc AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_types
  FROM tok
), corpus AS (
  SELECT count(*) AS n_hapax FROM (
    SELECT token FROM (
      SELECT unnest(toks) AS token FROM tok
    ) GROUP BY token HAVING count(*) = 1
  )
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(n_types * 10000 // n_tokens AS BIGINT) AS ttr_bp,
       (SELECT CAST(n_hapax AS BIGINT) FROM corpus) AS corpus_hapax
FROM per_doc ORDER BY doc_id LIMIT 300
""",
)


# ---------------------------------------------------------------------------
# TF-IDF top terms per document — the classic retrieval weighting,
# distributed as two hash aggregations (term counts, document
# frequencies) and one window. Every score is ONE IEEE multiply of
# cross-engine-identical factors (integer tf × ln(N/df)), so ranking
# with a term tiebreak is exact.
def tfidf_topk_terms(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(
        """
WITH tok AS (
  SELECT doc_id, explode(filter(split(text, ' '), x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM tok
), scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE)
                                    / CAST(df.df AS DOUBLE)) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rk
  FROM scored
)
SELECT doc_id, CAST(rk AS INT) AS rk, term,
       CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS score_e6
FROM ranked WHERE rk <= 3 AND doc_id < 200
ORDER BY doc_id, rk
"""
    )


register_split(
    "tfidf_topk_terms",
    tfidf_topk_terms,
    """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM tok
), scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE)
                                    / CAST(df.df AS DOUBLE)) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rk
  FROM scored
)
SELECT doc_id, CAST(rk AS INT) AS rk, term,
       CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS score_e6
FROM ranked WHERE rk <= 3 AND doc_id < 200
ORDER BY doc_id, rk
""",
)


# ---------------------------------------------------------------------------
# Trigram novelty — the share of a document's distinct 3-grams that
# appear in NO other document: the per-doc originality signal a
# dedup/quality pass uses to separate boilerplate from fresh content.
# One shuffle on the trigram, exact integer output.
def trigram_novelty_rate(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(
        """
WITH tok AS (
  SELECT doc_id, filter(split(text, ' '), x -> x <> '') AS toks
  FROM documents
), tri AS (
  SELECT DISTINCT doc_id,
         concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g
  FROM tok
  LATERAL VIEW explode(sequence(0, size(toks) - 3)) t AS i
  WHERE size(toks) >= 3
), owners AS (
  SELECT g, count(DISTINCT doc_id) AS n_docs FROM tri GROUP BY g
)
SELECT tri.doc_id,
       count(*) AS n_trigrams,
       CAST(sum(CASE WHEN owners.n_docs = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel
FROM tri JOIN owners ON tri.g = owners.g
GROUP BY tri.doc_id
ORDER BY tri.doc_id
LIMIT 300
"""
    )


register_split(
    "trigram_novelty_rate",
    trigram_novelty_rate,
    """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), tri AS (
  SELECT DISTINCT doc_id,
         concat_ws(' ', toks[i.i+1], toks[i.i+2], toks[i.i+3]) AS g
  FROM tok, (SELECT unnest(range(0, (SELECT CAST(max(len(toks)) AS BIGINT) FROM tok))) AS i) i
  WHERE len(toks) >= 3 AND i.i <= len(toks) - 3
), owners AS (
  SELECT g, count(DISTINCT doc_id) AS n_docs FROM tri GROUP BY g
)
SELECT tri.doc_id,
       count(*) AS n_trigrams,
       CAST(sum(CASE WHEN owners.n_docs = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel
FROM tri JOIN owners ON tri.g = owners.g
GROUP BY tri.doc_id
ORDER BY tri.doc_id
LIMIT 300
""",
)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 — the MOSS
# algorithm): per document, hash every 5-gram, then keep the MINIMUM
# hash of each sliding window of 4 grams. Guarantees any match of
# length >= w+k-1 shares a fingerprint while storing ~2/(w+1) of the
# grams — the local-fingerprint dedup the reference's users run via
# extensions. Hashes are explicit 31-polynomials over token
# polynomials (mod 1e9+7) so both engines produce identical values;
# the whole kernel is JVM-side higher-order functions (no Python).
def winnowing_fingerprints(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(
        """
WITH tok AS (
  SELECT doc_id, filter(split(text, ' '), x -> x <> '') AS toks
  FROM documents
), p AS (
  SELECT doc_id,
         transform(toks,
           t -> aggregate(split(t, ''), 0L,
                          (acc, c) -> (acc * 31 + ascii(c))
                                      % 1000000007L)) AS ph
  FROM tok WHERE size(toks) >= 8
), g AS (
  SELECT doc_id,
         transform(sequence(0, size(ph) - 5),
           i -> aggregate(slice(ph, i + 1, 5), 0L,
                          (acc, x) -> (acc * 31 + x) % 1000000007L))
           AS grams
  FROM p
), fp AS (
  SELECT doc_id,
         array_distinct(transform(sequence(0, size(grams) - 4),
             i -> array_min(slice(grams, i + 1, 4)))) AS fps
  FROM g
)
SELECT doc_id,
       CAST(size(fps) AS BIGINT) AS n_fingerprints,
       CAST(aggregate(fps, 0L, (a, x) -> (a + x) % 1000000007L)
            AS BIGINT) AS fp_checksum
FROM fp ORDER BY doc_id LIMIT 300
"""
    )


register_split(
    "winnowing_fingerprints",
    winnowing_fingerprints,
    """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), p AS (
  SELECT doc_id,
         list_transform(toks,
           t -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split_regex(t, ''),
                                   c -> CAST(ord(c) AS BIGINT))),
                  (acc, c) -> (acc * 31 + c) % 1000000007)) AS ph
  FROM tok WHERE len(toks) >= 8
), g AS (
  SELECT doc_id,
         list_transform(range(0, len(ph) - 4),
           i -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT), ph[i+1:i+5]),
                  (acc, x) -> (acc * 31 + x) % 1000000007)) AS grams
  FROM p
), fp AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, len(grams) - 3),
             i -> list_min(grams[i+1:i+4]))) AS fps
  FROM g
)
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), fps),
                        (a, x) -> (a + x) % 1000000007) AS BIGINT)
         AS fp_checksum
FROM fp ORDER BY doc_id LIMIT 300
""",
)


# ---------------------------------------------------------------------------
# K-gram coverage curve — cumulative NEW distinct 5-grams as the
# corpus grows in doc_id order: the diminishing-returns curve a data
# curator reads before buying more of a source. Each gram is charged
# to its FIRST document (one groupBy-min), then a running sum over
# doc buckets — no quadratic rescanning.
def kgram_coverage_curve(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(
        """
WITH tok AS (
  SELECT doc_id, filter(split(text, ' '), x -> x <> '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, concat_ws(' ', slice(toks, i + 1, 5)) AS g
  FROM tok LATERAL VIEW explode(sequence(0, size(toks) - 5)) t AS i
  WHERE size(toks) >= 5
), firsts AS (
  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
), per_bucket AS (
  SELECT CAST(first_doc DIV 50 AS BIGINT) AS bucket,
         count(*) AS new_grams
  FROM firsts GROUP BY first_doc DIV 50
)
SELECT bucket, new_grams,
       CAST(sum(new_grams) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_grams
FROM per_bucket ORDER BY bucket
"""
    )


register_split(
    "kgram_coverage_curve",
    kgram_coverage_curve,
    """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, concat_ws(' ', toks[i.i+1], toks[i.i+2], toks[i.i+3],
                           toks[i.i+4], toks[i.i+5]) AS g
  FROM tok, (SELECT unnest(range(0, (SELECT CAST(max(len(toks)) AS BIGINT) FROM tok))) AS i) i
  WHERE len(toks) >= 5 AND i.i <= len(toks) - 5
), firsts AS (
  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
), per_bucket AS (
  SELECT CAST(first_doc // 50 AS BIGINT) AS bucket,
         count(*) AS new_grams
  FROM firsts GROUP BY first_doc // 50
)
SELECT bucket, new_grams,
       CAST(sum(new_grams) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_grams
FROM per_bucket ORDER BY bucket
""",
)


# ---------------------------------------------------------------------------
# Deterministic A/B split over USERS with per-arm metrics — the
# experiment-assignment idiom: the unit of randomization is the user
# (hash-based, re-run-stable), every event inherits its user's arm.
def ab_split_events(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(
        f"""
WITH arms AS (
  SELECT user_id,
         CASE WHEN {hash64_sql("CAST(user_id AS STRING)")} % 2 = 0
              THEN 'A' ELSE 'B' END AS arm
  FROM (SELECT DISTINCT user_id FROM events)
)
SELECT a.arm, count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e JOIN arms a ON e.user_id = a.user_id
GROUP BY a.arm ORDER BY a.arm
"""
    )


register_split(
    "ab_split_events",
    ab_split_events,
    f"""
WITH arms AS (
  SELECT user_id,
         CASE WHEN {hash64_duck("CAST(user_id AS VARCHAR)")} % 2 = 0
              THEN 'A' ELSE 'B' END AS arm
  FROM (SELECT DISTINCT user_id FROM events)
)
SELECT a.arm, count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e JOIN arms a ON e.user_id = a.user_id
GROUP BY a.arm ORDER BY a.arm
""",
)


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling — the domain-reweighting step of
# a training-data pipeline (sample each domain ∝ share^alpha so
# low-resource domains are up-weighted; alpha=1 keeps the natural mix,
# alpha=0 is uniform). Deterministic: docs rank within their domain by
# md5(doc_id) — a reproducible shuffle both engines compute
# identically — and each domain takes its quota head.
#
# Scale shape: one groupBy for counts, quotas broadcast back, one
# window partitioned BY DOMAIN for the rank (each domain sorts
# independently — wide, not a global sort), one broadcast semi-join.
# alpha is fixed to 0.5 (sqrt) in the registered form: sqrt is
# correctly-rounded IEEE so both engines agree bit-for-bit, while
# pow(x, a) is libm-dependent (README §Correctness).
#
# Registered r8; tests/test_r8_candidates.py also proves DuckDB
# parity directly at 3 SFs.

def temperature_mixture_sample(
    spark: SparkSession, sf_dir: str, total: int = 200
) -> DataFrame:
    from pyspark.sql import Window

    load_views(spark, sf_dir)
    docs = spark.table("documents")
    per = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    z = per.agg(
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("z")
    )
    quota = per.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.least(
            F.col("n_docs"),
            F.round(
                F.lit(float(total))
                * F.sqrt(F.col("n_docs").cast("double"))
                / F.col("z")
            ).cast("long"),
        ).alias("quota"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    sampled = (
        docs.select("source", "doc_id")
        .withColumn("rk", rk)
        .join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("quota"))
    )
    return (
        sampled.groupBy("source")
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.first("quota").alias("quota"),
            F.count("*").cast("long").alias("n_sampled"),
            F.sum("doc_id").cast("long").alias("docid_sum"),
        )
        .orderBy("source")
    )


TEMPERATURE_MIX_ORACLE = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
), z AS (
  SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS z FROM per
), quota AS (
  SELECT source, n_docs,
         least(n_docs, CAST(round(200.0 * sqrt(CAST(n_docs AS DOUBLE)) / z.z)
                            AS BIGINT)) AS quota
  FROM per, z
), ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
)
SELECT q.source, q.n_docs, q.quota,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(r.doc_id) AS BIGINT) AS docid_sum
FROM ranked r JOIN quota q ON r.source = q.source
WHERE r.rk <= q.quota
GROUP BY q.source, q.n_docs, q.quota
ORDER BY q.source
"""

register_split(
    "temperature_mixture_sample",
    temperature_mixture_sample,
    TEMPERATURE_MIX_ORACLE,
)


# ---------------------------------------------------------------------------
# Per-source token-distribution drift vs the whole corpus — the mix
# QA a pretraining pipeline runs before changing source weights. Two
# distances over the top-500 corpus vocabulary plus a residual bucket
# (the production shape: the vocab bound keeps the grid |sources|×V,
# never |sources|×|vocab|): total variation from EXACT integer
# arithmetic (|n·N − nc·ns| summed as DECIMAL(38,0) — order-free and
# bit-portable), and Hellinger² from per-row sqrt (correctly-rounded
# IEEE in both engines; sums via the DSUM fixed-point idiom).
def source_divergence_drift(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(_DRIFT_SQL)


from citus_spark.queries import DSUM as _DSUM2

_DRIFT_SQL = f"""
WITH tok AS (
  SELECT source, explode(split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT source, token, count(*) AS n FROM tok WHERE token <> ''
  GROUP BY source, token
), src_tot AS (
  SELECT source, sum(n) AS ns FROM counts GROUP BY source
), corpus AS (
  SELECT token, sum(n) AS nc FROM counts GROUP BY token
), corpus_tot AS (
  SELECT sum(nc) AS big_n FROM corpus
), top AS (
  SELECT token, nc FROM corpus ORDER BY nc DESC, token LIMIT 500
), grid AS (
  SELECT s.source, s.ns, ct.big_n, t.nc, coalesce(c.n, 0) AS n
  FROM src_tot s CROSS JOIN corpus_tot ct CROSS JOIN top t
  LEFT JOIN counts c ON c.source = s.source AND c.token = t.token
), per AS (
  SELECT source, ns, big_n,
         sum(abs(CAST(n AS DECIMAL(38,0)) * big_n
                 - CAST(nc AS DECIMAL(38,0)) * ns)) AS tv_num_top,
         {_DSUM2(
             "sqrt((CAST(n AS DOUBLE) / CAST(ns AS DOUBLE))"
             " * (CAST(nc AS DOUBLE) / CAST(big_n AS DOUBLE)))"
             " * 1000000.0",
             "bc_top_e6",
         )},
         sum(n) AS head_n, sum(nc) AS head_nc
  FROM grid GROUP BY source, ns, big_n
)
SELECT source, CAST(ns AS BIGINT) AS ns,
       CAST(floor(
         CAST(tv_num_top
              + abs(CAST(ns - head_n AS DECIMAL(38,0)) * big_n
                    - CAST(big_n - head_nc AS DECIMAL(38,0)) * ns)
              AS DOUBLE)
         / (CAST(ns AS DOUBLE) * CAST(big_n AS DOUBLE)) * 500000.0
         + 0.5) AS BIGINT) AS tv_e6,
       CAST(floor(
         (1.0 - least(1.0,
            bc_top_e6 / 1000000.0
            + sqrt((CAST(ns - head_n AS DOUBLE) / CAST(ns AS DOUBLE))
                   * (CAST(big_n - head_nc AS DOUBLE)
                      / CAST(big_n AS DOUBLE)))))
         * 1000000.0 + 0.5) AS BIGINT) AS hellinger2_e6
FROM per
ORDER BY source
"""

register_split(
    "source_divergence_drift",
    source_divergence_drift,
    _DRIFT_SQL.replace(
        "explode(split(text, ' '))", "unnest(string_split(text, ' '))"
    ),
)


# ---------------------------------------------------------------------------
# Tail mass outside the top-K vocabulary, per language — the vocab-
# sizing diagnostic (how much of the token stream would map to <unk>
# with a K-term vocab). Pure integer arithmetic end to end: the ratio
# is scaled integer division, so the result is exact and portable at
# any corpus size (BIGINT ceiling permitting; the e6 scale keeps
# ns·10⁶ within range to ~9·10¹² tokens per language).
def rare_token_tail_mass(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(_TAIL_MASS_SQL)


_TAIL_MASS_SQL = """
WITH tok AS (
  SELECT lang, explode(split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT lang, token, count(*) AS n FROM tok WHERE token <> ''
  GROUP BY lang, token
), lang_tot AS (
  SELECT lang, sum(n) AS ns FROM counts GROUP BY lang
), corpus AS (
  SELECT token, sum(n) AS nc FROM counts GROUP BY token
), top AS (
  SELECT token FROM corpus ORDER BY nc DESC, token LIMIT 500
), head AS (
  SELECT c.lang, sum(c.n) AS head_n
  FROM counts c JOIN top t ON c.token = t.token
  GROUP BY c.lang
)
SELECT l.lang, CAST(l.ns AS BIGINT) AS ns,
       CAST(coalesce(h.head_n, 0) AS BIGINT) AS head_n,
       CAST(((l.ns - coalesce(h.head_n, 0)) * 1000000) DIV l.ns
            AS BIGINT) AS tail_e6
FROM lang_tot l LEFT JOIN head h ON l.lang = h.lang
ORDER BY l.lang
"""

register_split(
    "rare_token_tail_mass",
    rare_token_tail_mass,
    _TAIL_MASS_SQL.replace(
        "explode(split(text, ' '))", "unnest(string_split(text, ' '))"
    ).replace(" DIV ", " // "),
)


# ---------------------------------------------------------------------------
# Within-document sentence dedup — boilerplate stripping (repeated
# headers/footers/CTA lines inside one document), the intra-doc
# counterpart of the corpus-level passage dedup. Keeps each sentence's
# FIRST occurrence in document order and fingerprints the cleaned
# text; one shuffle on doc_id, no cross-document traffic — a pure
# per-partition map at scale when documents are the partition unit.
def sentence_dedup_within_doc(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(_SENT_DEDUP_SQL)


_SENT_DEDUP_SQL = r"""
WITH s AS (
  SELECT doc_id, posexplode(split(text, '\\. ')) AS (pos, sent)
  FROM documents
), first_pos AS (
  SELECT doc_id, sent, min(pos) AS fp
  FROM s WHERE sent <> '' GROUP BY doc_id, sent
), stats AS (
  SELECT doc_id, count(*) AS n_sent
  FROM s WHERE sent <> '' GROUP BY doc_id
), clean AS (
  SELECT doc_id, count(*) AS n_unique,
         md5(array_join(
           transform(array_sort(collect_list(struct(fp, sent))),
                     x -> x.sent),
           '. ')) AS clean_md5
  FROM first_pos GROUP BY doc_id
)
SELECT st.doc_id, CAST(st.n_sent AS BIGINT) AS n_sent,
       CAST(c.n_unique AS BIGINT) AS n_unique,
       CAST(st.n_sent - c.n_unique AS BIGINT) AS n_dups,
       c.clean_md5
FROM stats st JOIN clean c ON st.doc_id = c.doc_id
ORDER BY st.doc_id
"""

_SENT_DEDUP_ORACLE = """
WITH s AS (
  SELECT doc_id, unnest(range(1, len(sents) + 1)) AS pos,
         unnest(sents) AS sent
  FROM (SELECT doc_id, string_split(text, '. ') AS sents
        FROM documents)
), first_pos AS (
  SELECT doc_id, sent, min(pos) AS fp
  FROM s WHERE sent <> '' GROUP BY doc_id, sent
), stats AS (
  SELECT doc_id, count(*) AS n_sent
  FROM s WHERE sent <> '' GROUP BY doc_id
), clean AS (
  SELECT doc_id, count(*) AS n_unique,
         md5(string_agg(sent, '. ' ORDER BY fp)) AS clean_md5
  FROM first_pos GROUP BY doc_id
)
SELECT st.doc_id, CAST(st.n_sent AS BIGINT) AS n_sent,
       CAST(c.n_unique AS BIGINT) AS n_unique,
       CAST(st.n_sent - c.n_unique AS BIGINT) AS n_dups,
       c.clean_md5
FROM stats st JOIN clean c ON st.doc_id = c.doc_id
ORDER BY st.doc_id
"""

register_split(
    "sentence_dedup_within_doc",
    sentence_dedup_within_doc,
    _SENT_DEDUP_ORACLE,
)


# ---------------------------------------------------------------------------
# Curriculum length buckets — quartile the corpus by document length
# within each language (curriculum schedules feed short-to-long), with
# per-bucket extents and character share. ntile over (n_chars, doc_id)
# is a total order, so bucket assignment is deterministic in both
# engines; the window partitions by lang, so at scale it is one
# shuffle on a low-cardinality key with per-partition sorts — no
# global sort.
register_shared_sql(
    "curriculum_length_buckets",
    """
WITH b AS (
  SELECT lang, doc_id, n_chars,
         ntile(4) OVER (PARTITION BY lang
                        ORDER BY n_chars, doc_id) AS bucket
  FROM documents
)
SELECT lang, CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM b GROUP BY lang, bucket
ORDER BY lang, bucket
""",
)


# ---------------------------------------------------------------------------
# Bigram collocation mining — association lift (the PMI argument
# P(w1w2)/(P(w1)P(w2)) before the log, which is monotone in PMI, so
# the ranking is PMI's) over lead()-derived bigrams. Scoring is pure
# integer arithmetic (count products with scaled integer division) —
# exact and portable. The e6 scale bounds the corpus to ~1e12 bigram
# occurrences before BIGINT overflow; a production ranking at that
# size drops to doubles (ordering, not reporting).
def collocation_lift(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(_COLLOC_SQL)


_COLLOC_SQL = r"""
WITH tok AS (
  SELECT doc_id, pos, sent AS tok
  FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (pos, sent)
        FROM documents)
  WHERE sent <> ''
), big AS (
  SELECT tok AS w1,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
), bcounts AS (
  SELECT w1, w2, count(*) AS n FROM big WHERE w2 IS NOT NULL
  GROUP BY w1, w2
), uni AS (
  SELECT tok AS w, count(*) AS u FROM tok GROUP BY tok
), tot AS (
  SELECT sum(n) AS nb FROM bcounts
)
SELECT b.w1, b.w2, CAST(b.n AS BIGINT) AS n,
       CAST((b.n * t.nb * 1000000) DIV (u1.u * u2.u) AS BIGINT)
         AS lift_e6
FROM bcounts b
JOIN uni u1 ON b.w1 = u1.w
JOIN uni u2 ON b.w2 = u2.w
CROSS JOIN tot t
WHERE b.n >= 5
ORDER BY lift_e6 DESC, b.w1, b.w2
LIMIT 50
"""

_COLLOC_ORACLE = """
WITH tok AS (
  SELECT doc_id, pos, sent AS tok FROM (
    SELECT doc_id, unnest(range(1, len(sents) + 1)) AS pos,
           unnest(sents) AS sent
    FROM (SELECT doc_id, string_split(text, ' ') AS sents
          FROM documents)
  )
  WHERE sent <> ''
), big AS (
  SELECT tok AS w1,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
), bcounts AS (
  SELECT w1, w2, count(*) AS n FROM big WHERE w2 IS NOT NULL
  GROUP BY w1, w2
), uni AS (
  SELECT tok AS w, count(*) AS u FROM tok GROUP BY tok
), tot AS (
  SELECT sum(n) AS nb FROM bcounts
)
SELECT b.w1, b.w2, CAST(b.n AS BIGINT) AS n,
       CAST((b.n * t.nb * 1000000) // (u1.u * u2.u) AS BIGINT)
         AS lift_e6
FROM bcounts b
JOIN uni u1 ON b.w1 = u1.w
JOIN uni u2 ON b.w2 = u2.w
CROSS JOIN tot t
WHERE b.n >= 5
ORDER BY lift_e6 DESC, b.w1, b.w2
LIMIT 50
"""

register_split("collocation_lift", collocation_lift, _COLLOC_ORACLE)


# ---------------------------------------------------------------------------
# Pairwise source vocabulary overlap — token-set Jaccard between
# every source pair (which crawls/registers duplicate each other is a
# first-week question on any new corpus). Distinct-token sets join on
# the token key (one hash shuffle, never all-pairs row comparisons);
# the ratio is scaled integer division — exact.
def source_jaccard_overlap(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(_SRC_JACCARD_SQL)


_SRC_JACCARD_SQL = """
WITH tok AS (
  SELECT source, explode(split(text, ' ')) AS token FROM documents
), sets AS (
  SELECT DISTINCT source, token FROM tok WHERE token <> ''
), sizes AS (
  SELECT source, count(*) AS c FROM sets GROUP BY source
), inter AS (
  SELECT a.source AS s1, b.source AS s2, count(*) AS i
  FROM sets a JOIN sets b ON a.token = b.token AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.s1, i.s2, CAST(i.i AS BIGINT) AS common_tokens,
       CAST((i.i * 1000000) DIV (z1.c + z2.c - i.i) AS BIGINT)
         AS jaccard_e6
FROM inter i
JOIN sizes z1 ON i.s1 = z1.source
JOIN sizes z2 ON i.s2 = z2.source
ORDER BY i.s1, i.s2
"""

register_split(
    "source_jaccard_overlap",
    source_jaccard_overlap,
    _SRC_JACCARD_SQL.replace(
        "explode(split(text, ' '))", "unnest(string_split(text, ' '))"
    ).replace(" DIV ", " // "),
)


# ---------------------------------------------------------------------------
# Token-distribution Shannon entropy per language — the diversity
# number next to the Zipf slope in any corpus health report (low
# entropy = template/boilerplate-heavy). Per-row -(p·ln p) is the
# same IEEE double in both engines (division, log, multiply — the
# zipf_slope precedent); the cross-token sum uses DSUM so reduction
# order cannot move the hash.
def token_entropy_by_lang(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(_ENTROPY_SQL)


_ENTROPY_SQL = f"""
WITH tok AS (
  SELECT lang, explode(split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT lang, token, count(*) AS n FROM tok WHERE token <> ''
  GROUP BY lang, token
), lang_tot AS (
  SELECT lang, sum(n) AS ns FROM counts GROUP BY lang
), terms AS (
  SELECT c.lang, l.ns,
         -(CAST(c.n AS DOUBLE) / CAST(l.ns AS DOUBLE))
           * ln(CAST(c.n AS DOUBLE) / CAST(l.ns AS DOUBLE))
           * 1000000.0 AS h_term_e6
  FROM counts c JOIN lang_tot l ON c.lang = l.lang
), sums AS (
  SELECT lang, max(ns) AS ns, count(*) AS vocab,
         {_DSUM2('h_term_e6', 's_h_e6')}
  FROM terms GROUP BY lang
)
SELECT lang, CAST(ns AS BIGINT) AS ns, CAST(vocab AS BIGINT) AS vocab,
       CAST(floor(s_h_e6 / 100.0 + 0.5) AS BIGINT) AS entropy_e4
FROM sums
ORDER BY lang
"""

register_split(
    "token_entropy_by_lang",
    token_entropy_by_lang,
    _ENTROPY_SQL.replace(
        "explode(split(text, ' '))", "unnest(string_split(text, ' '))"
    ),
)


# --- JSONL shard export round-trip (training-data handoff) ------------------
# Drives sources/ingest.copy_to_jsonl_shards (hash-routed .json shard
# files) and reads the export back: the aggregate per lang must equal
# what DuckDB derives from the source table — any row lost, duplicated
# or value-mangled by the export/parse cycle breaks the hash. The
# shard count is part of the check (4 part files requested).
def jsonl_shard_roundtrip(spark, sf_dir):
    import hashlib
    import os
    import tempfile

    from pyspark.sql import functions as F

    from citus_spark.sources.ingest import copy_to_jsonl_shards

    load_views(spark, sf_dir)
    # content-stable path (one dir per corpus, overwritten on every
    # run — no temp-dir accumulation across gate/bench repetitions)
    sig = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    out = os.path.join(
        tempfile.gettempdir(), f"citus_spark_jsonl_{sig}"
    )
    docs = spark.table("documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    copy_to_jsonl_shards(docs, out, n_shards=4, shard_col="doc_id")
    parts = len(
        [f for f in os.listdir(out) if f.startswith("part-")]
    )
    back = spark.read.json(out)
    # the writer may skip a part file for an empty hash bucket, so
    # the oracle-stated contract is a bound, not an exact count
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("chars"),
            F.countDistinct("doc_id").cast("long").alias("ids"),
        )
        .withColumn(
            "shards_ok", (F.lit(parts) >= 1) & (F.lit(parts) <= 4)
        )
        .orderBy("lang")
    )


register_split(
    "jsonl_shard_roundtrip",
    jsonl_shard_roundtrip,
    """
SELECT lang, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS chars,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS ids,
       TRUE AS shards_ok
FROM documents
GROUP BY lang ORDER BY lang
""",
)


# --- small-file compaction planning ------------------------------------------
# The bin-pack assignment compact_table executes (sources/ingest.py),
# expressed declaratively: cumulative bytes in doc_id order, files cut
# at 64 KiB boundaries. All-integer arithmetic (65536 is a power of
# two, so the double division is exact) → hash-exact across engines.
# The windowed form's unpartitioned running sum single-partitions the
# table; above the corpus cutover the SAME cumulative offsets come
# from the two-phase distributed prefix sum (the exclusive offset IS
# the SQL's `cum - bytes`), exactly like packing_efficiency below.
_BINPACK_SQL = """
WITH sized AS (
  SELECT doc_id, n_chars AS bytes,
         sum(n_chars) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM documents
)
SELECT CAST(floor((cum - bytes) / 65536.0) AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(bytes) AS BIGINT) AS sz,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM sized
GROUP BY 1
ORDER BY 1
"""


def compaction_binpack_plan(spark, sf_dir):
    from citus_spark.queries import corpus_above_cutover

    load_views(spark, sf_dir)
    if not corpus_above_cutover(sf_dir):
        return spark.sql(_BINPACK_SQL)
    from citus_spark.operators.prefix_sum import with_global_offset

    sized = with_global_offset(
        spark.table("documents").selectExpr(
            "doc_id", "n_chars AS bytes"
        ),
        "doc_id",
        "bytes",
        out_col="_off",
    )
    return (
        sized.selectExpr(
            "CAST(floor(_off / 65536.0) AS BIGINT) AS shard",
            "bytes",
            "doc_id",
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("bytes").cast("long").alias("sz"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .orderBy("shard")
    )


register_split(
    "compaction_binpack_plan", compaction_binpack_plan, _BINPACK_SQL
)


# ---------------------------------------------------------------------------
# Packing efficiency — the curator-facing summary of the sequence_pack
# layout: how many fixed-length training sequences the corpus fills,
# the padding wasted in the final partial chunk, and how many
# documents straddle a chunk boundary (each straddle = one attention
# mask split). The Spark side derives offsets through the two-phase
# distributed prefix sum (operators/prefix_sum.with_global_offset) —
# never a single-partition global window — so the same code path is
# the 100 TB path; the oracle re-derives the offsets with DuckDB's
# window sum.
def packing_efficiency(spark, sf_dir):
    load_views(spark, sf_dir)
    from citus_spark.operators.prefix_sum import with_global_offset

    docs = spark.table("documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    d = with_global_offset(docs, "doc_id", "n_tokens", out_col="tok_offset")
    L = _SEQ_LEN
    first = F.floor(F.col("tok_offset") / L)
    last = F.floor((F.col("tok_offset") + F.col("n_tokens") - 1) / L)
    agg = d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum((first != last).cast("long")).cast("long").alias(
            "spanning_docs"
        ),
    )
    return agg.select(
        "n_docs",
        "total_tokens",
        "spanning_docs",
        F.ceil(F.col("total_tokens") / L).cast("long").alias("n_chunks"),
        (
            F.ceil(F.col("total_tokens") / L).cast("long") * L
            - F.col("total_tokens")
        ).cast("long").alias("waste_tokens"),
    )


register_split(
    "packing_efficiency",
    packing_efficiency,
    f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS tok_offset
  FROM t
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN CAST(floor(tok_offset / {_SEQ_LEN}.0) AS BIGINT)
                      <> CAST(floor((tok_offset + n_tokens - 1)
                              / {_SEQ_LEN}.0) AS BIGINT)
                THEN 1 ELSE 0 END) AS BIGINT) AS spanning_docs,
       CAST(ceil(sum(n_tokens) / {_SEQ_LEN}.0) AS BIGINT) AS n_chunks,
       CAST(CAST(ceil(sum(n_tokens) / {_SEQ_LEN}.0) AS BIGINT)
            * {_SEQ_LEN} - sum(n_tokens) AS BIGINT) AS waste_tokens
FROM o
""",
)
