"""CH-benCHmark slice — the reference's mixed-OLAP regression workload.

The reference runs 22 CH-benCHmark queries over TPC-C tables
(reference src/test/regress/sql/chbenchmark_all_queries.sql, tables
created in ch_benchmarks_create_load.sql) precisely because they
exercise join shapes TPC-H does not — notably dual-repartition joins
on non-distribution keys (ch_bench_subquery_repartition.sql).

The driver fixture set has no TPC-C tables, so each query derives
them deterministically from the fixture relations with pure column
arithmetic (the same technique as the derived partsupp in tpch.py):

  order_line — lineitem re-keyed into the TPC-C (warehouse, district,
               order, line) coordinate system;
  stock      — part × 10 warehouses with keyed-hash quantities;
  item       — part renamed.

Both engines compute identical derived rows, so the driver's
value-hash check is exact. ch_stock_level is the headline shape: it
joins order_line to stock on (item, warehouse) — neither side's
natural key — which at cluster scale is Citus's DUAL_PARTITION_JOIN
(reference src/include/distributed/multi_join_order.h:38): both sides
repartition on the join key. Spark plans the identical dual-exchange
SortMergeJoin; the fixture-scale plan is asserted in
tests/test_plan_quality.py.
"""

from citus_spark.queries import DAVG, DSUM, register_shared_sql

_CH_CTE = """
order_line AS (
  SELECT l_suppkey % 10 AS ol_w_id,
         l_linenumber % 10 AS ol_d_id,
         l_orderkey AS ol_o_id,
         l_linenumber AS ol_number,
         l_partkey AS ol_i_id,
         l_suppkey % 10 AS ol_supply_w_id,
         l_shipdate AS ol_delivery_d,
         l_quantity AS ol_quantity,
         l_extendedprice AS ol_amount
  FROM lineitem
),
wh AS (SELECT 0 AS w UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL
       SELECT 3 UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL
       SELECT 6 UNION ALL SELECT 7 UNION ALL SELECT 8 UNION ALL
       SELECT 9),
stock AS (
  SELECT p_partkey AS s_i_id,
         w AS s_w_id,
         CAST((p_partkey * 17 + w * 7) % 91 + 10 AS BIGINT) AS s_quantity
  FROM part CROSS JOIN wh
),
item AS (
  SELECT p_partkey AS i_id, p_retailprice AS i_price, p_type AS i_data,
         p_name AS i_name
  FROM part
)"""

# CH Q1 — order-line pricing summary by line number
# (↔ chbenchmark_all_queries.sql Q1).
register_shared_sql(
    "ch_q1",
    f"""
WITH {_CH_CTE}
SELECT ol_number,
  {DSUM("ol_quantity", "sum_qty")},
  {DSUM("ol_amount", "sum_amount")},
  {DAVG("ol_quantity", "count(*)", "avg_qty")},
  {DAVG("ol_amount", "count(*)", "avg_amount")},
  count(*) AS count_order
FROM order_line
WHERE ol_delivery_d > date '1997-01-01'
GROUP BY ol_number
ORDER BY ol_number
""",
)

# CH Q6 — revenue in a quantity band (pure filter-scan agg).
register_shared_sql(
    "ch_q6",
    f"""
SELECT {DSUM("ol_amount", "revenue")}
FROM (SELECT l_shipdate AS ol_delivery_d, l_quantity AS ol_quantity,
             l_extendedprice AS ol_amount
      FROM lineitem) order_line
WHERE ol_delivery_d >= date '1996-01-01'
  AND ol_delivery_d < date '1998-01-01'
  AND ol_quantity BETWEEN 10 AND 40
""",
)

# CH Q12 — order-priority service levels over the order⋈order_line
# join (CASE split ↔ chbenchmark Q12's carrier buckets).
register_shared_sql(
    "ch_q12",
    f"""
WITH {_CH_CTE}
SELECT o_orderpriority,
  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT)
    AS low_line_count
FROM orders
JOIN order_line ON ol_o_id = o_orderkey
WHERE ol_delivery_d >= o_orderdate
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# CH Q14 — promotion revenue share over the item join.
register_shared_sql(
    "ch_q14",
    f"""
WITH {_CH_CTE}
SELECT
  100.00 * CAST(sum(CAST(CASE WHEN i_data = 'PROMO' THEN ol_amount
                    ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(sum(CAST(ol_amount AS DECIMAL(18,6))) AS DOUBLE)
    AS promo_revenue
FROM order_line
JOIN item ON ol_i_id = i_id
WHERE ol_delivery_d >= date '1997-09-01'
  AND ol_delivery_d < date '1997-12-01'
""",
)

# CH Q19 — disjunctive multi-clause predicate over item⋈order_line.
register_shared_sql(
    "ch_q19",
    f"""
WITH {_CH_CTE}
SELECT {DSUM("ol_amount", "revenue")}
FROM order_line
JOIN item ON ol_i_id = i_id
WHERE (i_data = 'SMALL' AND ol_quantity BETWEEN 1 AND 15
       AND ol_w_id IN (0, 1, 2, 3, 4))
   OR (i_data = 'MEDIUM' AND ol_quantity BETWEEN 10 AND 25
       AND ol_w_id IN (2, 3, 4, 5, 6))
   OR (i_data = 'LARGE' AND ol_quantity BETWEEN 20 AND 35
       AND ol_w_id IN (4, 5, 6, 7, 8))
""",
)

# Stock-level — the dual-repartition join: order_line⋈stock on
# (item, warehouse), neither side's natural key
# (↔ DUAL_PARTITION_JOIN, multi_join_order.h:38;
# ch_bench_subquery_repartition.sql). count(DISTINCT) over the join.
register_shared_sql(
    "ch_stock_level",
    """
WITH order_line AS (
  SELECT l_partkey AS ol_i_id, l_suppkey % 10 AS ol_supply_w_id,
         l_shipdate AS ol_delivery_d
  FROM lineitem
),
wh AS (SELECT 0 AS w UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL
       SELECT 3 UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL
       SELECT 6 UNION ALL SELECT 7 UNION ALL SELECT 8 UNION ALL
       SELECT 9),
stock AS (
  SELECT p_partkey AS s_i_id, w AS s_w_id,
         CAST((p_partkey * 17 + w * 7) % 91 + 10 AS BIGINT) AS s_quantity
  FROM part CROSS JOIN wh
)
SELECT s_w_id, CAST(count(DISTINCT s_i_id) AS BIGINT) AS low_stock
FROM order_line
JOIN stock ON ol_i_id = s_i_id AND ol_supply_w_id = s_w_id
WHERE s_quantity < 25
  AND ol_delivery_d > date '1997-06-01'
GROUP BY s_w_id
ORDER BY s_w_id
""",
)
