"""Distributed JSON aggregation — json_agg / json_object_agg.

The reference distributes PostgreSQL's json aggregates by shipping
per-shard partial json arrays and concatenating them on the
coordinator with a dedicated combine function, `jsonb_cat_agg`
(reference src/include/distributed/multi_logical_optimizer.h:27,72-73
and the worker/master split in multi_logical_optimizer.c). Spark's
native equivalent of that split is `collect_list` (partial per
partition, concatenated at the final aggregate) followed by a single
JVM-side `to_json` — the same partial/final decomposition with the
serialization moved after the merge, which also lets us canonicalize
element order (the reference's json_agg output order is
partition-arrival-dependent; ours sorts the collected structs before
serializing, so output is deterministic at any partition count).

Payload fields are strings/bigints only: Spark's and DuckDB's compact
JSON serializers are byte-identical for those types, so the driver's
value-hash comparison is exact. Dialects diverge on ordered
aggregates (PG-style `agg(x ORDER BY y)` vs `sort_array`) so these
are split registrations.
"""

from pyspark.sql import DataFrame, SparkSession

from citus_spark.queries import load_views, register_split


# json_agg: per returnflag, a JSON array of {l_linestatus, n} rows.
# The inner count aggregate runs distributed (partial/final); the
# array is assembled from the tiny grouped result.
def json_agg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
WITH per AS (
  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag,
       to_json(sort_array(collect_list(struct(l_linestatus, n))))
         AS statuses_json
FROM per
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
    )


register_split(
    "json_agg_by_type",
    json_agg_by_type,
    """
WITH per AS (
  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag,
       to_json(list(struct_pack(l_linestatus := l_linestatus, n := n)
                    ORDER BY l_linestatus)) AS statuses_json
FROM per
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


# json_object_agg: per order-priority, a JSON object mapping
# orderstatus -> order count (↔ json_object_agg / jsonb_object_agg).
def json_object_agg_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
WITH per AS (
  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
  FROM orders
  GROUP BY o_orderpriority, o_orderstatus
)
SELECT o_orderpriority,
       to_json(map_from_entries(
         sort_array(collect_list(struct(o_orderstatus, n)))))
         AS status_counts_json
FROM per
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
    )


register_split(
    "json_object_agg_counts",
    json_object_agg_counts,
    """
WITH per AS (
  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
  FROM orders
  GROUP BY o_orderpriority, o_orderstatus
)
SELECT o_orderpriority,
       to_json(map_from_entries(
         list(struct_pack(k := o_orderstatus, v := n)
              ORDER BY o_orderstatus))) AS status_counts_json
FROM per
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
