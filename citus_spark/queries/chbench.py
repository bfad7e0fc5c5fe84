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

# ---------------------------------------------------------------------------
# Extended slice: the TPC-C composite-key join shapes. With the
# block at the end of this file the full 22-query CH suite is ported
# (↔ chbenchmark_all_queries.sql Q1–Q22).
#
# TPC-C coordinates (warehouse, district) are derived from the
# customer key on BOTH the order and order-line side (via the
# orders join), so every composite-key equi-join
# (c_w_id=o_w_id AND c_d_id=o_d_id AND c_id=o_c_id, and
# ol_w_id=o_w_id AND ol_d_id=o_d_id AND ol_o_id=o_id) matches
# exactly as TPC-C intends while exercising multi-column shuffle
# keys. The stock⋈supplier link keeps the benchmark's
# mod(s_w_id*s_i_id, |supplier|) formula
# (chbenchmark_all_queries.sql:223).
_CH_CTE2 = """
sc AS (SELECT CAST(count(*) AS BIGINT) AS s FROM supplier),
oorder AS (
  SELECT o_orderkey AS o_id,
         o_custkey % 10 AS o_w_id,
         CAST(floor((o_custkey % 100) / 10.0) AS BIGINT) AS o_d_id,
         o_custkey AS o_c_id,
         o_orderdate AS o_entry_d,
         o_orderkey % 15 + 1 AS o_carrier_id,
         o_orderkey % 7 + 1 AS o_ol_cnt,
         o_orderstatus
  FROM orders
),
cust AS (
  SELECT c_custkey AS c_id,
         c_custkey % 10 AS c_w_id,
         CAST(floor((c_custkey % 100) / 10.0) AS BIGINT) AS c_d_id,
         c_name AS c_last,
         c_mktsegment AS c_state,
         c_nationkey, c_acctbal
  FROM customer
),
order_line2 AS (
  SELECT o_custkey % 10 AS ol_w_id,
         CAST(floor((o_custkey % 100) / 10.0) AS BIGINT) AS ol_d_id,
         l_orderkey AS ol_o_id,
         l_linenumber AS ol_number,
         l_partkey AS ol_i_id,
         l_suppkey % 10 AS ol_supply_w_id,
         l_shipdate AS ol_delivery_d,
         l_quantity AS ol_quantity,
         l_extendedprice AS ol_amount
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
wh2 AS (SELECT 0 AS w UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL
        SELECT 3 UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL
        SELECT 6 UNION ALL SELECT 7 UNION ALL SELECT 8 UNION ALL
        SELECT 9),
stock2 AS (
  SELECT p_partkey AS s_i_id,
         w AS s_w_id,
         CAST((p_partkey * 17 + w * 7) % 91 + 10 AS BIGINT) AS s_quantity,
         CAST((p_partkey * 3 + w) % 50 AS BIGINT) AS s_order_cnt,
         (w * p_partkey) % s AS s_su_suppkey
  FROM part CROSS JOIN wh2 CROSS JOIN sc
),
item2 AS (
  SELECT p_partkey AS i_id, p_retailprice AS i_price, p_type AS i_data,
         p_name AS i_name
  FROM part
)"""

# CH Q3 — unshipped-order revenue over the customer⋈order⋈order_line
# composite-key chain (new_order proxied by o_orderstatus='O', the
# undelivered orders — same selectivity role).
register_shared_sql(
    "ch_q3",
    f"""
WITH {_CH_CTE2}
SELECT ol_o_id, ol_w_id, ol_d_id,
  {DSUM("ol_amount", "revenue")},
  o_entry_d
FROM cust
JOIN oorder ON c_id = o_c_id AND c_w_id = o_w_id AND c_d_id = o_d_id
JOIN order_line2 ON ol_w_id = o_w_id AND ol_d_id = o_d_id
  AND ol_o_id = o_id
WHERE c_state LIKE 'B%'
  AND o_orderstatus = 'O'
  AND o_entry_d > date '1996-01-01'
GROUP BY ol_o_id, ol_w_id, ol_d_id, o_entry_d
ORDER BY revenue DESC, o_entry_d, ol_o_id
LIMIT 100
""",
)

# CH Q4 — order counts by line-count bucket, gated by a correlated
# EXISTS with an inequality correlation (ol_delivery_d >= o_entry_d).
register_shared_sql(
    "ch_q4",
    f"""
WITH {_CH_CTE2}
SELECT o_ol_cnt, count(*) AS order_count
FROM oorder
WHERE o_entry_d >= date '1996-01-01'
  AND o_entry_d < date '1998-01-01'
  AND EXISTS (SELECT 1 FROM order_line2
              WHERE o_id = ol_o_id AND o_w_id = ol_w_id
                AND o_d_id = ol_d_id AND ol_delivery_d >= o_entry_d)
GROUP BY o_ol_cnt
ORDER BY o_ol_cnt
""",
)

# CH Q5 — revenue by supplier nation over the 7-relation join
# (customer ⋈ order ⋈ order_line ⋈ stock ⋈ supplier ⋈ nation ⋈
# region). Mirrors the reference's adaptation: the
# customer-nation = supplier-nation filter is skipped
# (chbenchmark_all_queries.sql:311-315).
register_shared_sql(
    "ch_q5",
    f"""
WITH {_CH_CTE2}
SELECT n_name, {DSUM("ol_amount", "revenue")}
FROM cust
JOIN oorder ON c_id = o_c_id AND c_w_id = o_w_id AND c_d_id = o_d_id
JOIN order_line2 ON ol_o_id = o_id AND ol_w_id = o_w_id
  AND ol_d_id = o_d_id
JOIN stock2 ON ol_w_id = s_w_id AND ol_i_id = s_i_id
JOIN supplier ON s_su_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_entry_d >= date '1996-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)

# CH Q7 — bilateral trade volume between two nations by year
# (supplier nation × customer nation pairs, symmetric OR predicate).
register_shared_sql(
    "ch_q7",
    f"""
WITH {_CH_CTE2}
SELECT CAST(s_nationkey AS BIGINT) AS supp_nation,
       CAST(c_nationkey AS BIGINT) AS cust_nation,
       CAST(extract(year FROM o_entry_d) AS BIGINT) AS l_year,
       {DSUM("ol_amount", "revenue")}
FROM supplier
JOIN stock2 ON s_su_suppkey = s_suppkey
JOIN order_line2 ON ol_supply_w_id = s_w_id AND ol_i_id = s_i_id
JOIN oorder ON ol_w_id = o_w_id AND ol_d_id = o_d_id AND ol_o_id = o_id
JOIN cust ON c_id = o_c_id AND c_w_id = o_w_id AND c_d_id = o_d_id
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_9')
    OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_7'))
  AND ol_delivery_d BETWEEN date '1996-01-01' AND date '1998-01-01'
GROUP BY s_nationkey, c_nationkey, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)

# CH Q10 — top customers by revenue with nation lookup and the
# shipping-lag inequality (o_entry_d <= ol_delivery_d).
register_shared_sql(
    "ch_q10",
    f"""
WITH {_CH_CTE2}
SELECT c_id, c_last, {DSUM("ol_amount", "revenue")}, c_state, n_name
FROM cust
JOIN oorder ON c_id = o_c_id AND c_w_id = o_w_id AND c_d_id = o_d_id
JOIN order_line2 ON ol_w_id = o_w_id AND ol_d_id = o_d_id
  AND ol_o_id = o_id
JOIN nation ON n_nationkey = c_nationkey
WHERE o_entry_d >= date '1996-01-01'
  AND o_entry_d <= ol_delivery_d
GROUP BY c_id, c_last, c_state, n_name
ORDER BY revenue DESC, c_id
LIMIT 100
""",
)

# CH Q11 — important stock by supplier nation, HAVING against an
# uncorrelated scalar subquery (the same shape the reference plans
# as a recursively-planned subquery + coordinator HAVING,
# README.md:667-694). The benchmark's fraction-of-total threshold
# (×0.005) is degenerate on this fixture's uniform stock (max group
# share 0.003): the threshold is mean-relative instead so the result
# is non-empty at every scale factor.
register_shared_sql(
    "ch_q11",
    f"""
WITH {_CH_CTE2}
SELECT s_i_id, CAST(sum(s_order_cnt) AS BIGINT) AS ordercount
FROM stock2
JOIN supplier ON s_su_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
GROUP BY s_i_id
HAVING sum(s_order_cnt) >
  (SELECT 1.6 * sum(s_order_cnt) / count(DISTINCT s_i_id)
   FROM stock2
   JOIN supplier ON s_su_suppkey = s_suppkey
   JOIN nation ON s_nationkey = n_nationkey
   WHERE n_name = 'NATION_3')
ORDER BY ordercount DESC, s_i_id
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


# ---------------------------------------------------------------------------
# Completing the 22-query suite. LIKE patterns are remapped onto the
# fixture's p_type vocabulary (ECONOMY/LARGE/MEDIUM/PROMO/SMALL/
# STANDARD) with comparable selectivity; the supplier-comment "bad
# supplier" set in Q16 is proxied by a name pattern (the fixture
# supplier has no comment column); thresholds are chosen non-empty at
# every scale factor. Determinism per the repo rules: DSUM/decimal
# sums, total-order LIMITs.

# CH Q2 — min-quantity stock supplier lookup per item over the
# Europe-filtered supplier subquery (↔ chbenchmark Q2; supplier
# address/phone/comment columns don't exist in the fixture and are
# dropped from the projection).
register_shared_sql(
    "ch_q2",
    f"""
WITH {_CH_CTE2},
m AS (
  SELECT s_i_id AS m_i_id, min(s_quantity) AS m_s_quantity
  FROM stock2
  JOIN supplier ON s_su_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name LIKE 'EUROP%'
  GROUP BY s_i_id
)
SELECT s_suppkey AS su_suppkey, s_name AS su_name, n_name, i_id, i_name
FROM item2
JOIN stock2 ON i_id = s_i_id
JOIN supplier ON s_su_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN m ON i_id = m_i_id AND s_quantity = m_s_quantity
WHERE i_data LIKE '%D%'
  AND r_name LIKE 'EUROP%'
ORDER BY n_name, su_name, i_id
LIMIT 100
""",
)

# CH Q8 — market share of one supplier nation inside a customer
# region by year (double-nation join + conditional revenue ratio).
register_shared_sql(
    "ch_q8",
    f"""
WITH {_CH_CTE2}
SELECT CAST(extract(year FROM o_entry_d) AS BIGINT) AS l_year,
  CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_3' THEN ol_amount
                ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
    / CAST(sum(CAST(ol_amount AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM item2
JOIN stock2 ON i_id = s_i_id
JOIN order_line2 ON ol_i_id = s_i_id AND ol_supply_w_id = s_w_id
JOIN supplier ON s_su_suppkey = s_suppkey
JOIN oorder ON ol_w_id = o_w_id AND ol_d_id = o_d_id AND ol_o_id = o_id
JOIN cust ON c_id = o_c_id AND c_w_id = o_w_id AND c_d_id = o_d_id
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE ol_i_id < 1000
  AND r_name = 'EUROPE'
  AND o_entry_d BETWEEN date '1995-01-01' AND date '1998-01-01'
  AND i_data LIKE '%O%'
GROUP BY extract(year FROM o_entry_d)
ORDER BY l_year
""",
)

# CH Q9 — profit by supplier nation and year.
register_shared_sql(
    "ch_q9",
    f"""
WITH {_CH_CTE2}
SELECT n_name, CAST(extract(year FROM o_entry_d) AS BIGINT) AS l_year,
  {DSUM("ol_amount", "sum_profit")}
FROM item2
JOIN stock2 ON i_id = s_i_id
JOIN order_line2 ON ol_i_id = s_i_id AND ol_supply_w_id = s_w_id
JOIN supplier ON s_su_suppkey = s_suppkey
JOIN oorder ON ol_w_id = o_w_id AND ol_d_id = o_d_id AND ol_o_id = o_id
JOIN nation ON s_nationkey = n_nationkey
WHERE i_data LIKE '%M%'
GROUP BY n_name, extract(year FROM o_entry_d)
ORDER BY n_name, l_year DESC
""",
)

# CH Q13 — customer order-count distribution (LEFT OUTER with an
# extra ON-clause filter, then a distribution over the counts).
register_shared_sql(
    "ch_q13",
    f"""
WITH {_CH_CTE2},
c_orders AS (
  SELECT c_id, CAST(count(o_id) AS BIGINT) AS c_count
  FROM cust
  LEFT JOIN oorder ON c_w_id = o_w_id AND c_d_id = o_d_id
    AND c_id = o_c_id AND o_carrier_id > 8
  GROUP BY c_id
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)

# CH Q15 — top-revenue supplier via CTE + max scalar subquery
# (equality against an exact fixed-point total, so the max-match is
# engine-independent).
register_shared_sql(
    "ch_q15",
    f"""
WITH {_CH_CTE2},
revenue AS (
  SELECT s_su_suppkey AS supplier_no,
         {DSUM("ol_amount", "total_revenue")}
  FROM order_line2
  JOIN stock2 ON ol_i_id = s_i_id AND ol_supply_w_id = s_w_id
  WHERE ol_delivery_d >= date '1996-01-01'
  GROUP BY s_su_suppkey
)
SELECT s_suppkey AS su_suppkey, s_name AS su_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)

# CH Q16 — supplier counts per item attribute with a NOT IN
# anti-join ("bad supplier" set proxied by a name pattern).
register_shared_sql(
    "ch_q16",
    f"""
WITH {_CH_CTE2}
SELECT i_name, substr(i_data, 1, 3) AS brand, i_price,
       CAST(count(DISTINCT s_su_suppkey) AS BIGINT) AS supplier_cnt
FROM stock2
JOIN item2 ON i_id = s_i_id
WHERE i_data NOT LIKE 'S%'
  AND s_su_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%')
GROUP BY i_name, substr(i_data, 1, 3), i_price
ORDER BY supplier_cnt DESC, i_name, brand, i_price
LIMIT 200
""",
)

# CH Q17 — small-order revenue over an avg-per-item subquery join
# (the subquery's avg column is carried but unused, as in the
# reference after its dataset adaptation).
register_shared_sql(
    "ch_q17",
    f"""
WITH {_CH_CTE2},
t AS (
  SELECT i_id, avg(ol_quantity) AS a
  FROM item2
  JOIN order_line2 ON ol_i_id = i_id
  WHERE i_data LIKE '%D%'
  GROUP BY i_id
)
SELECT CAST(sum(CAST(ol_amount AS DECIMAL(18,6))) AS DOUBLE) / 2.0
         AS avg_yearly
FROM order_line2
JOIN t ON ol_i_id = t.i_id
""",
)

# CH Q18 — large orders ranked by total amount (HAVING on an exact
# decimal sum).
register_shared_sql(
    "ch_q18",
    f"""
WITH {_CH_CTE2}
SELECT c_last, c_id, o_id, o_entry_d, o_ol_cnt,
       {DSUM("ol_amount", "total_amount")}
FROM cust
JOIN oorder ON c_id = o_c_id AND c_w_id = o_w_id AND c_d_id = o_d_id
JOIN order_line2 ON ol_w_id = o_w_id AND ol_d_id = o_d_id
  AND ol_o_id = o_id
GROUP BY o_id, o_w_id, o_d_id, c_id, c_last, o_entry_d, o_ol_cnt
HAVING sum(CAST(ol_amount AS DECIMAL(18,6))) > 300000
ORDER BY total_amount DESC, o_id
LIMIT 100
""",
)

# CH Q20 — suppliers holding excess stock of promoted items
# (nested IN + HAVING over the stock⋈order_line join). The
# benchmark's `2*s_quantity > sum(ol_quantity)` threshold scales
# with data size (empty beyond tiny SFs); the HAVING compares
# against the scale-free per-line average instead — avg of
# integer-valued doubles is an exact sum / exact count, identical in
# both engines.
register_shared_sql(
    "ch_q20",
    f"""
WITH {_CH_CTE2}
SELECT s_name AS su_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN
      (SELECT s_su_suppkey
       FROM stock2
       JOIN order_line2 ON ol_i_id = s_i_id
       WHERE s_i_id IN (SELECT i_id FROM item2 WHERE i_data LIKE 'PR%')
         AND ol_delivery_d > timestamp '1996-06-01 00:00:00'
       GROUP BY s_i_id, s_w_id, s_quantity, s_su_suppkey
       HAVING s_quantity > 1.5 * avg(ol_quantity))
  AND n_name = 'NATION_3'
ORDER BY su_name
""",
)

# CH Q21 — suppliers on each order's LAST delivery line (correlated
# NOT EXISTS with inequality over a self-reference of order_line).
register_shared_sql(
    "ch_q21",
    f"""
WITH {_CH_CTE2}
SELECT s_name AS su_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN stock2 ON s_su_suppkey = s_suppkey
JOIN order_line2 l1 ON l1.ol_w_id = s_w_id AND l1.ol_i_id = s_i_id
JOIN oorder ON l1.ol_o_id = o_id AND l1.ol_w_id = o_w_id
  AND l1.ol_d_id = o_d_id
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.ol_delivery_d > o_entry_d
  AND NOT EXISTS (SELECT 1 FROM order_line2 l2
                  WHERE l2.ol_o_id = l1.ol_o_id
                    AND l2.ol_w_id = l1.ol_w_id
                    AND l2.ol_d_id = l1.ol_d_id
                    AND l2.ol_delivery_d > l1.ol_delivery_d)
  AND n_name = 'NATION_3'
GROUP BY s_name
ORDER BY numwait DESC, su_name
""",
)

# CH Q22 — acquisition-prospect accounting: customers above the
# (exact) mean balance with no RECENT orders (NOT EXISTS on the
# composite key; the phone-prefix filter is proxied by a key digit —
# the fixture has no phone column — and the no-orders test is
# restricted to a recent window, since this fixture's order/customer
# ratio leaves virtually no customer with zero orders ever).
register_shared_sql(
    "ch_q22",
    f"""
WITH {_CH_CTE2}
SELECT substr(c_state, 1, 1) AS country,
       CAST(count(*) AS BIGINT) AS numcust,
       {DSUM("c_acctbal", "totacctbal")}
FROM cust
WHERE c_id % 10 BETWEEN 1 AND 7
  AND c_acctbal >
      (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                / count(*)
       FROM cust
       WHERE c_acctbal > 0.00 AND c_id % 10 BETWEEN 1 AND 7)
  AND NOT EXISTS (SELECT 1 FROM oorder
                  WHERE o_c_id = c_id AND o_w_id = c_w_id
                    AND o_d_id = c_d_id
                    AND o_entry_d >= date '1997-06-01')
GROUP BY substr(c_state, 1, 1)
ORDER BY country
""",
)
