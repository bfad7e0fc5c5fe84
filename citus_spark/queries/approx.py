"""Approximate aggregates, sampling, TopN operator entries, and the
PostgreSQL scalar-function surface.

Reference mapping:
- approx count distinct ↔ hll extension (worker hll_add_agg +
  coordinator hll_union_agg, multi_logical_optimizer.c:1711-1760,
  GUC citus.count_distinct_error_rate). Spark: native HLL++
  `approx_count_distinct(col, rsd)`. Sketch values differ per
  implementation → rows-only driver check; the pytest suite asserts
  the estimate is within rsd of exact.
- percentiles ↔ tdigest extension (10 distributed agg variants,
  planner/tdigest_extension.c). Spark: `percentile_approx`
  (rows-only check) and exact `percentile` (oracle-checked below —
  both engines use linear interpolation).
- TABLESAMPLE ↔ MultiTable.tablesample (multi_logical_planner.h:95).
- topn entries drive citus_spark.operators.topn (↔ topn extension).
- scalar function surface ↔ §2.2: the reference runs PostgreSQL's
  scalar library inside shard SQL; here the same surface is Spark
  SQL built-ins, oracle-checked for PG-compatible semantics
  (concat ||, string ops, math, conditionals).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citus_spark.operators.topn import topn
from citus_spark.queries import (
    DSUM,
    load_views,
    register_shared_sql,
    register_split,
)

# ---------------------------------------------------------------------------
# Approximate aggregates — oracle-checked via the BOOLEAN-CONTRACT
# pattern (see tdigest_rank_error_bounds): the estimate itself is
# implementation-specific, but its error bound is not. Spark outputs
# the group key + the EXACT value (which DuckDB recomputes) + a
# boolean asserting the estimate sits inside the sketch's published
# bound; the oracle states the same contract with constants. A sketch
# regression flips a boolean and hash-mismatches.


def approx_count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    # rsd=0.02 → 3σ ≈ 6% relative; +2 absolute slack for tiny groups
    ok = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact))
        <= 0.06 * F.col(exact) + F.lit(2)
    )
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("_ap"),
            F.approx_count_distinct("l_suppkey", 0.02).alias("_as"),
            F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
            F.countDistinct("l_suppkey").cast("long").alias("exact_supps"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_supps",
            ok("_ap", "exact_parts").alias("parts_ok"),
            ok("_as", "exact_supps").alias("supps_ok"),
        )
        .orderBy("l_returnflag")
    )


register_split(
    "approx_count_distinct_parts",
    approx_count_distinct_parts,
    """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
       TRUE AS parts_ok, TRUE AS supps_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


def percentile_approx_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    orders = spark.table("orders")
    est = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("q")
    )
    joined = orders.select("o_orderpriority", "o_totalprice").join(
        F.broadcast(est), "o_orderpriority"
    )
    rank_of = lambda i: F.avg(  # noqa: E731
        (F.col("o_totalprice") <= F.col("q")[i]).cast("double")
    )
    # accuracy=10000 → rank error ≤ 1e-4; 0.01 leaves two orders of
    # magnitude headroom plus small-group granularity
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            (F.abs(rank_of(0) - 0.5) <= 0.01).alias("p50_ok"),
            (F.abs(rank_of(1) - 0.9) <= 0.01).alias("p90_ok"),
            (F.abs(rank_of(2) - 0.99) <= 0.01).alias("p99_ok"),
        )
        .orderBy("o_orderpriority")
    )


register_split(
    "percentile_approx_prices",
    percentile_approx_prices,
    """
SELECT o_orderpriority,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)


def tablesample_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    # seeded Bernoulli sample — deterministic within Spark, not across
    # engines, so the oracle checks the boolean CONTRACT: the sampled
    # row count sits within 5σ of Binomial(N, 0.1) (~5.8e-7 false-
    # positive), and every sampled row is a real lineitem row
    # (semi-join back equals the sample size).
    li = spark.table("lineitem")
    s = li.sample(0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    from pyspark.sql import functions as F

    n_sample = s.count()
    n_total = li.count()
    import math

    sigma = math.sqrt(n_total * 0.1 * 0.9)
    all_real = (
        s.join(li, ["l_orderkey", "l_linenumber", "l_quantity"], "left_semi")
        .count()
        == n_sample
    )
    return spark.createDataFrame(
        [
            (
                n_total,
                abs(n_sample - 0.1 * n_total) <= 5 * sigma,
                bool(all_real),
            )
        ],
        "n_total bigint, count_in_5_sigma boolean, rows_are_real boolean",
    )


register_split(
    "tablesample_scan",
    tablesample_scan,
    """
SELECT CAST(count(*) AS BIGINT) AS n_total,
       TRUE AS count_in_5_sigma, TRUE AS rows_are_real
FROM lineitem
""",
)


# Exact percentile — oracle-checked: both engines interpolate
# continuously over the sorted values.
register_shared_sql(
    "percentile_exact",
    """
SELECT o_orderpriority,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
       percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)


# Discrete percentile (ordered-set aggregate percentile_disc, the
# other PG WITHIN GROUP form the reference must distribute — it
# pulls these to the coordinator or routes them through tdigest,
# planner/tdigest_extension.c). Both engines implement the PostgreSQL
# rule (smallest value whose cume_dist ≥ p — probed: p=0.9 over 5
# rows returns the 5th value, not the lower-interpolation 4th), and
# the result is a VALUE FROM THE DATA, never interpolated arithmetic,
# so the comparison is bit-exact by construction.
register_shared_sql(
    "percentile_disc_priority",
    """
SELECT o_orderpriority,
       percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
       percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)


# ---------------------------------------------------------------------------
# Approximate LIMIT (↔ citus.limit_clause_row_fetch_count,
# shared_library_init.c:1853; multi_limit_clause_approximate.sql):
# per-partition row-fetch pre-truncation before the final grouped
# top-k merge. Two runs in one entry: the exactness-guaranteed
# configuration (row_fetch large enough that every group's true top-k
# survives → hash-matched against DuckDB row_number), and a genuinely
# truncating row_fetch=20 run whose reference-documented contract —
# ≤k rows per group, and the global best row always survives (it is
# in some partition's top-20) — folds into a boolean column the
# oracle states as TRUE. A contract break flips the boolean and
# hash-mismatches.
def approx_limit_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.approx_limit import approx_grouped_topk

    load_views(spark, sf_dir)
    li = spark.table("lineitem")
    groups = ["l_returnflag", "l_linestatus"]
    tie = ["l_orderkey", "l_linenumber"]
    exact_mode = approx_grouped_topk(
        li, groups, "l_extendedprice", k=3, row_fetch=1_000_000,
        tiebreak=tie,
    ).select(
        *groups,
        F.col("rank").cast("int").alias("rank"),
        "l_orderkey", "l_linenumber",
        F.col("l_extendedprice").alias("price"),
    )
    approx = approx_grouped_topk(
        li, groups, "l_extendedprice", k=3, row_fetch=20, tiebreak=tie
    )
    contract = (
        approx.agg(
            F.max("l_extendedprice").alias("_amax"),
            F.count("*").alias("_acnt"),
        )
        .crossJoin(
            li.agg(
                F.max("l_extendedprice").alias("_emax"),
                F.countDistinct(*groups).alias("_ngroups"),
            )
        )
        .select(
            (
                (F.col("_amax") == F.col("_emax"))
                & (F.col("_acnt") <= F.lit(3) * F.col("_ngroups"))
            ).alias("approx_contract_ok")
        )
    )
    return exact_mode.crossJoin(F.broadcast(contract)).orderBy(
        *groups, "rank"
    )


register_split(
    "approx_limit_grouped_topk",
    approx_limit_grouped_topk,
    """
SELECT l_returnflag, l_linestatus, rank, l_orderkey, l_linenumber,
       price, TRUE AS approx_contract_ok
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(row_number() OVER (
             PARTITION BY l_returnflag, l_linestatus
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         ) AS INT) AS rank,
         l_orderkey, l_linenumber, l_extendedprice AS price
  FROM lineitem
) t
WHERE rank <= 3
ORDER BY l_returnflag, l_linestatus, rank
""",
)


# ---------------------------------------------------------------------------
# TopN operator entries (↔ topn extension)
def topn_operator(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return topn(
        spark.table("events"), ["event_type"], "user_id", k=3
    ).orderBy("event_type", "rank")


register_split(
    "topn_operator",
    topn_operator,
    """
SELECT event_type, user_id, cnt, rank FROM (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY count(*) DESC, user_id) AS INT) AS rank
  FROM events GROUP BY event_type, user_id
) t WHERE rank <= 3
ORDER BY event_type, rank
""",
)


# ---------------------------------------------------------------------------
# Scalar function surface (shared SQL, oracle-checked). round() on
# arbitrary doubles is excluded: Spark rounds the shortest decimal
# repr, DuckDB the exact binary value — a documented semantic gap.
register_shared_sql(
    "scalar_string_functions",
    """
SELECT c_custkey,
       upper(c_name) AS uname,
       lower(c_mktsegment) AS lseg,
       substr(c_name, 1, 8) AS prefix,
       c_name || ':' || c_mktsegment AS joined,
       replace(c_name, 'Customer', 'Cust') AS replaced,
       trim('  ' || c_name || ' ') AS trimmed,
       CAST(length(c_name) AS BIGINT) AS name_len,
       CAST(position('#' IN c_name) AS BIGINT) AS hash_pos
FROM customer
ORDER BY c_custkey
LIMIT 100
""",
)

# NB: transcendentals (ln/exp/pow) are excluded from the oracle check —
# libm implementations differ in the last ulp between engines (observed:
# ln off by 1e-13). sqrt/abs/floor/ceil/% are IEEE-exact everywhere.
register_shared_sql(
    "scalar_math_functions",
    """
SELECT o_orderkey,
       abs(o_totalprice - 250000.0) AS dist_from_mid,
       CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k_floor,
       CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS price_k_ceil,
       sqrt(o_totalprice) AS price_sqrt,
       CAST(o_orderkey % 10 AS DOUBLE) * CAST(o_orderkey % 10 AS DOUBLE) AS key_sq,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod
FROM orders
WHERE o_totalprice > 0
ORDER BY o_orderkey
LIMIT 100
""",
)

register_shared_sql(
    "scalar_conditionals",
    """
SELECT s_suppkey,
       coalesce(nullif(s_name, ''), 'unknown') AS name_or_default,
       greatest(s_acctbal, 0.0) AS bal_floor0,
       least(s_acctbal, 5000.0) AS bal_cap,
       CASE WHEN s_acctbal < 0 THEN 'debt'
            WHEN s_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_bucket
FROM supplier
ORDER BY s_suppkey
""",
)


# bit/bool aggregate surface (↔ AggregateType enum bit_and/bit_or/
# bool_and/bool_or/every, multi_logical_optimizer.h:62-102)
register_shared_sql(
    "bit_bool_aggregates",
    """
SELECT l_returnflag,
       CAST(bit_and(l_linenumber) AS BIGINT) AS lines_and,
       CAST(bit_or(l_linenumber) AS BIGINT) AS lines_or,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.09) AS any_high_discount,
       min(l_linestatus) AS min_status,
       max(l_linestatus) AS max_status
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)

# RIGHT OUTER JOIN (the reference supports it in both pushdown and
# join-order paths, multi_logical_planner.c:985)
register_shared_sql(
    "right_outer_join",
    """
SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
)


# Regexp surface (↔ PG regexp_* delegated to shard SQL). Split impl:
# Spark's regexp_replace is global while DuckDB's needs the 'g' flag,
# and the boolean-match spellings differ (RLIKE vs regexp_matches).
# Patterns stay within the common POSIX-class subset (identical in
# Java regex and RE2).
def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
SELECT doc_id,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       regexp_extract(text, '([0-9]+)', 1) AS first_number,
       length(regexp_replace(text, '[aeiou]', '')) AS novowel_len,
       text RLIKE '[0-9]' AS has_digit,
       CAST(length(text) - length(regexp_replace(text, ' ', ''))
            AS BIGINT) AS n_spaces
FROM documents
ORDER BY doc_id
LIMIT 200
"""
    )


register_split(
    "regexp_functions",
    regexp_functions,
    """
SELECT doc_id,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       regexp_extract(text, '([0-9]+)', 1) AS first_number,
       length(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len,
       regexp_matches(text, '[0-9]') AS has_digit,
       CAST(length(text) - length(regexp_replace(text, ' ', '', 'g'))
            AS BIGINT) AS n_spaces
FROM documents
ORDER BY doc_id
LIMIT 200
""",
)


# Array function surface (↔ PG array operators in shard SQL). Split
# impl: Spark spells these split/size/element_at/array_*, DuckDB
# string_split/len/list_*.
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
SELECT doc_id,
       CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
       element_at(split(text, ' '), 1) AS first_token,
       array_contains(split(text, ' '), 'the') AS has_the,
       CAST(size(array_distinct(split(text, ' '))) AS BIGINT)
         AS n_distinct,
       array_join(slice(sort_array(array_distinct(split(text, ' '))),
                        1, 5), ',') AS first5_sorted
FROM documents
ORDER BY doc_id
LIMIT 200
"""
    )


register_split(
    "array_functions",
    array_functions,
    """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       string_split(text, ' ')[1] AS first_token,
       list_contains(string_split(text, ' '), 'the') AS has_the,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         AS n_distinct,
       array_to_string(list_slice(list_sort(
           list_distinct(string_split(text, ' '))), 1, 5), ',')
         AS first5_sorted
FROM documents
ORDER BY doc_id
LIMIT 200
""",
)


# Vectorized scalar UDF (↔ §2.10 user scalar UDFs — PL/pgSQL functions
# run inside shard SQL; here a pandas_udf runs inside the scan stage).
# Pure per-row arithmetic → bit-exact oracle.
def pandas_udf_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    load_views(spark, sf_dir)

    @F.pandas_udf("double")
    def score(value: pd.Series, k: pd.Series) -> pd.Series:
        # vectorized: runs on Arrow batches, one python call per batch
        return value * 2.0 + k * 0.5

    ev = spark.table("events")
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        ev.select("event_id", score(F.col("value"), k).alias("score"))
        .filter(F.col("score") > 50.0)
        .orderBy("event_id")
    )


register_split(
    "pandas_udf_scoring",
    pandas_udf_scoring,
    """
SELECT event_id,
       value * 2.0 + CAST(json_extract_string(props, '$.k') AS DOUBLE) * 0.5
         AS score
FROM events
WHERE value * 2.0 + CAST(json_extract_string(props, '$.k') AS DOUBLE) * 0.5 > 50.0
ORDER BY event_id
""",
)


# Custom distributed UDAF entry (operators/udaf.py): exact median via
# partial/combine/final. Median of doubles is a single interpolation of
# sorted exact values → oracle-exact vs duckdb's quantile_cont.
def custom_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.udaf import distributed_agg, median_spec

    load_views(spark, sf_dir)
    src = spark.table("events").select("event_type", F.col("value").alias("v"))
    out = distributed_agg(src, ["event_type"], median_spec(["event_type"], "v"))
    return out.orderBy("event_type")


register_split(
    "custom_udaf_median",
    custom_udaf_median,
    """
SELECT event_type,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS median
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)


# Re-aggregatable sketch entries — boolean-contract oracles (merge
# algebra additionally property-tested in tests/test_hll.py and
# tests/test_quantile_sketch.py)
def hll_ndv_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.hll import approx_ndv

    load_views(spark, sf_dir)
    li = spark.table("lineitem")
    est = approx_ndv(li, ["l_returnflag"], "l_partkey")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_ndv")
    )
    # P=11 registers → rsd ≈ 2.3%; 0.1 relative + 2 absolute ≈ 4σ
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_ndv",
            (
                F.abs(F.col("approx_ndv") - F.col("exact_ndv"))
                <= 0.1 * F.col("exact_ndv") + F.lit(2)
            ).alias("ndv_ok"),
        )
        .orderBy("l_returnflag")
    )


register_split(
    "hll_ndv_by_flag",
    hll_ndv_by_flag,
    """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_ndv,
       TRUE AS ndv_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


def sketch_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.quantile_sketch import approx_quantiles

    load_views(spark, sf_dir)
    orders = spark.table("orders")
    est = approx_quantiles(
        orders, ["o_orderpriority"], "o_totalprice", "o_orderkey"
    )
    joined = orders.select("o_orderpriority", "o_totalprice").join(
        F.broadcast(est), "o_orderpriority"
    )
    rank_of = lambda c: F.avg(  # noqa: E731
        (F.col("o_totalprice") <= F.col(c)).cast("double")
    )
    # KMV K=2048 → rank error ~1/sqrt(K) ≈ 2.2%; bound at 3σ ≈ 0.07
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            (F.abs(rank_of("p50") - 0.5) <= 0.07).alias("p50_ok"),
            (F.abs(rank_of("p90") - 0.9) <= 0.07).alias("p90_ok"),
            (F.abs(rank_of("p99") - 0.99) <= 0.07).alias("p99_ok"),
        )
        .orderBy("o_orderpriority")
    )


register_split(
    "sketch_quantiles_by_priority",
    sketch_quantiles_by_priority,
    """
SELECT o_orderpriority,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)


# t-digest accuracy contract as an ORACLE-CHECKABLE entry: the digest
# estimates are implementation-defined, but the *rank error* they must
# satisfy is not. Spark computes the digest p50/p90/p99/p999 per group,
# measures each estimate's true rank against the raw data, and outputs
# booleans asserting the k1-scale error bounds (tails far tighter than
# the KMV sketch's 0.022). The oracle states the same contract as
# constants — any digest regression flips a boolean and hash-mismatches.
def tdigest_rank_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.tdigest import approx_quantiles_tdigest

    load_views(spark, sf_dir)
    li = spark.table("lineitem")
    est = approx_quantiles_tdigest(
        li, ["l_returnflag"], "l_extendedprice",
        quantiles=(0.5, 0.9, 0.99, 0.999),
    )
    joined = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(est), "l_returnflag"
    )
    rank_of = lambda p: F.avg(  # noqa: E731
        (F.col("l_extendedprice") <= F.col(p)).cast("double")
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            (F.abs(rank_of("p50") - 0.5) <= 0.01).alias("p50_ok"),
            (F.abs(rank_of("p90") - 0.9) <= 0.01).alias("p90_ok"),
            (F.abs(rank_of("p99") - 0.99) <= 0.003).alias("p99_ok"),
            (F.abs(rank_of("p999") - 0.999) <= 0.001).alias("p999_ok"),
        )
        .orderBy("l_returnflag")
    )


register_split(
    "tdigest_rank_error_bounds",
    tdigest_rank_error_bounds,
    """
SELECT l_returnflag,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok, TRUE AS p999_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


# JSON extraction (dialects differ: get_json_object vs
# json_extract_string)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    ev = spark.table("events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_id", k.alias("k"))
        .groupBy()
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("long").alias("k_total"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
    )


register_split(
    "json_extract_props",
    json_extract_props,
    """
SELECT CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS k_total,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(max(k) AS BIGINT) AS k_max
FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
""",
)


# Weighted discrete percentile — cumulative-weight selection (the
# sampling-theory form: smallest value whose cumulative weight share
# reaches p). Pure integer/window arithmetic on unique keys, so the
# selected rows match exactly.
def weighted_percentile_disc(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(_WPD_SQL)


_WPD_SQL = """
WITH w AS (
  SELECT o_totalprice AS v, o_orderkey AS k,
         CAST(o_orderkey % 7 + 1 AS BIGINT) AS wt
  FROM orders WHERE o_orderkey < 8000
), c AS (
  SELECT v, k, wt,
         sum(wt) OVER (ORDER BY v, k
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(wt) OVER () AS total
  FROM w
)
SELECT p, min(v) AS value_at_p FROM (
  SELECT v, cum, total, p
  FROM c CROSS JOIN (SELECT explode(array(25, 50, 90)) AS p)
  WHERE cum * 100 >= p * total
)
GROUP BY p ORDER BY p
"""

register_split(
    "weighted_percentile_disc",
    weighted_percentile_disc,
    _WPD_SQL.replace(
        "CROSS JOIN (SELECT explode(array(25, 50, 90)) AS p)",
        "CROSS JOIN (SELECT unnest([25, 50, 90]) AS p)",
    ),
)


# Interpolated (continuous) percentile — percentile_cont semantics:
# both engines compute the same (1-f)*lo + f*hi on the same two
# neighbors, one IEEE expression, value-exact.
register_shared_sql(
    "percentile_cont_interpolated",
    """
SELECT o_orderstatus,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
         AS p50,
       percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)
         AS p90
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
