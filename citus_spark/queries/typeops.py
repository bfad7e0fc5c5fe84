"""PG type-system surface oracle entries: CREATE TYPE AS ENUM /
composite, CREATE DOMAIN, CREATE PROCEDURE / CALL, JSON_TABLE.

↔ reference regress: distributed_types.sql (enum + composite DDL,
label ordering via pg_enum.enumsortorder), distributed_domain.sql
(domain constraints enforced on distributed writes),
sql_procedure.sql (LANGUAGE SQL / plpgsql procedures + CALL),
pg17_json.sql (JSON_TABLE row expansion).

Each entry builds scratch state from the fixture tables through the
session's DDL/DML surface and returns a final relation DuckDB
re-derives value-exactly from the same fixtures — the oracle runs
none of the type DDL, it states what the end state must equal.
"""

from __future__ import annotations

from citus_spark.queries import register_split


def _sess(spark, sf_dir):
    from citus_spark.session import register_views

    return register_views(spark, sf_dir)


# --- ENUM ordering ----------------------------------------------------------
# Labels chosen so declaration order ('none' < 'low' < 'medium' <
# 'high' < 'urgent') disagrees with lexical order ('high' < 'low' <
# 'medium' < 'none' < 'urgent') — a lexical-sort regression flips the
# ord column and hash-mismatches. Exercises: CREATE TYPE AS ENUM,
# enum-typed column with auto CHECK, ORDER BY / window ORDER BY /
# range comparison / min-max over declaration order.
def enum_type_ordering(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __en_orders")
    s.sql("DROP TYPE IF EXISTS prio_level")
    s.sql(
        "CREATE TYPE prio_level AS ENUM "
        "('none', 'low', 'medium', 'high', 'urgent')"
    )
    s.sql("CREATE TABLE __en_orders (okey bigint, lvl prio_level)")
    s.sql(
        """
INSERT INTO __en_orders
SELECT o_orderkey,
       CASE o_orderpriority
         WHEN '1-URGENT' THEN 'urgent'
         WHEN '2-HIGH' THEN 'high'
         WHEN '3-MEDIUM' THEN 'medium'
         WHEN '5-LOW' THEN 'low'
         ELSE 'none'
       END
FROM orders WHERE o_orderkey < 8000
"""
    )
    return s.sql(
        """
SELECT g.lvl, g.n, g.ord, x.mn, x.mx, x.hi_n
FROM (
  SELECT lvl, CAST(count(*) AS BIGINT) AS n,
         CAST(row_number() OVER (ORDER BY lvl) AS INT) AS ord
  FROM __en_orders GROUP BY lvl
) g
CROSS JOIN (
  SELECT min(lvl) AS mn, max(lvl) AS mx,
         CAST(count(CASE WHEN lvl >= 'high' THEN 1 END) AS BIGINT)
           AS hi_n
  FROM __en_orders
) x
ORDER BY g.ord
"""
    )


_ENUM_RANK = (
    "CASE lvl WHEN 'none' THEN 1 WHEN 'low' THEN 2 WHEN 'medium' "
    "THEN 3 WHEN 'high' THEN 4 WHEN 'urgent' THEN 5 END"
)

register_split(
    "enum_type_ordering",
    enum_type_ordering,
    f"""
WITH src AS (
  SELECT o_orderkey AS okey,
         CASE o_orderpriority
           WHEN '1-URGENT' THEN 'urgent'
           WHEN '2-HIGH' THEN 'high'
           WHEN '3-MEDIUM' THEN 'medium'
           WHEN '5-LOW' THEN 'low'
           ELSE 'none'
         END AS lvl
  FROM orders WHERE o_orderkey < 8000
), ranked AS (
  SELECT lvl, {_ENUM_RANK} AS rk FROM src
), g AS (
  SELECT lvl, CAST(count(*) AS BIGINT) AS n,
         CAST(row_number() OVER (ORDER BY min(rk)) AS INT) AS ord
  FROM ranked GROUP BY lvl
), x AS (
  SELECT CASE min(rk) WHEN 1 THEN 'none' WHEN 2 THEN 'low' WHEN 3
           THEN 'medium' WHEN 4 THEN 'high' ELSE 'urgent' END AS mn,
         CASE max(rk) WHEN 1 THEN 'none' WHEN 2 THEN 'low' WHEN 3
           THEN 'medium' WHEN 4 THEN 'high' ELSE 'urgent' END AS mx,
         CAST(count(CASE WHEN rk >= 4 THEN 1 END) AS BIGINT) AS hi_n
  FROM ranked
)
SELECT g.lvl, g.n, g.ord, x.mn, x.mx, x.hi_n
FROM g CROSS JOIN x
ORDER BY g.ord
""",
)


# --- composite type ---------------------------------------------------------
# CREATE TYPE AS (..) → struct column; the row-value cast
# (a, b)::type and the (col).field access forms from
# distributed_types.sql:14-15.
def composite_type_fields(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __ct_cust")
    s.sql("DROP TYPE IF EXISTS cust_info")
    s.sql("CREATE TYPE cust_info AS (nation bigint, seg text)")
    s.sql("CREATE TABLE __ct_cust (ck bigint, info cust_info)")
    s.sql(
        "INSERT INTO __ct_cust SELECT c_custkey, "
        "(c_nationkey, c_mktsegment)::cust_info FROM customer "
        "WHERE c_custkey <= 500"
    )
    return s.sql(
        "SELECT ck, (info).nation AS nation, (info).seg AS seg "
        "FROM __ct_cust WHERE (info).nation >= 10 ORDER BY ck"
    )


register_split(
    "composite_type_fields",
    composite_type_fields,
    """
SELECT c_custkey AS ck, c_nationkey AS nation, c_mktsegment AS seg
FROM customer
WHERE c_custkey <= 500 AND c_nationkey >= 10
ORDER BY ck
""",
)


# --- domain -----------------------------------------------------------------
# CREATE DOMAIN with CHECK + DEFAULT; the domain's constraints expand
# onto every column declared with it (distributed_domain.sql:9-22,
# 46-54). The fixture quantities all satisfy the check; the
# default-only insert proves DEFAULT came from the domain.
def domain_checked_ingest(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __dm_items")
    s.sql("DROP DOMAIN IF EXISTS qty_d")
    s.sql(
        "CREATE DOMAIN qty_d AS int DEFAULT 1 "
        "CHECK (VALUE > 0 AND VALUE <= 50)"
    )
    s.sql("CREATE TABLE __dm_items (ik bigint, q qty_d, note text)")
    s.sql(
        "INSERT INTO __dm_items SELECT l_orderkey, "
        "CAST(l_quantity AS int), l_returnflag FROM lineitem "
        "WHERE l_orderkey < 2000"
    )
    s.sql(
        "INSERT INTO __dm_items (ik, note) VALUES (999999, 'default-row')"
    )
    return s.sql(
        "SELECT note, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(q) AS BIGINT) AS sq FROM __dm_items "
        "GROUP BY note ORDER BY note"
    )


register_split(
    "domain_checked_ingest",
    domain_checked_ingest,
    """
WITH src AS (
  SELECT l_returnflag AS note, CAST(l_quantity AS INT) AS q
  FROM lineitem WHERE l_orderkey < 2000
  UNION ALL
  SELECT 'default-row', 1
)
SELECT note, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS sq
FROM src GROUP BY note ORDER BY note
""",
)


# --- CREATE PROCEDURE / CALL ------------------------------------------------
# LANGUAGE SQL procedure: delete-then-insert refresh, re-CALLed with
# new arguments (sql_procedure.sql:19-26 shape). The last CALL per
# segment wins — exactly what the oracle states.
def sql_procedure_call(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __pr_tally")
    s.sql("DROP PROCEDURE IF EXISTS refresh_tally")
    s.sql(
        "CREATE TABLE __pr_tally (seg text, n bigint, "
        "total double precision)"
    )
    s.sql(
        """
CREATE PROCEDURE refresh_tally(seg_filter text, cap double precision)
LANGUAGE SQL AS $$
  DELETE FROM __pr_tally WHERE seg = seg_filter;
  INSERT INTO __pr_tally
  SELECT c_mktsegment, CAST(count(*) AS BIGINT),
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
  FROM customer
  WHERE c_mktsegment = seg_filter AND c_acctbal < cap
  GROUP BY c_mktsegment;
$$
"""
    )
    s.sql("CALL refresh_tally('BUILDING', 5000.0)")
    s.sql("CALL refresh_tally('MACHINERY', 3000.0)")
    s.sql("CALL refresh_tally('BUILDING', 2000.0)")
    return s.sql("SELECT seg, n, total FROM __pr_tally ORDER BY seg")


register_split(
    "sql_procedure_call",
    sql_procedure_call,
    """
WITH calls(seg, cap) AS (
  VALUES ('BUILDING', 2000.0), ('MACHINERY', 3000.0)
)
SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM customer JOIN calls ON c_mktsegment = calls.seg
WHERE c_acctbal < calls.cap
GROUP BY c_mktsegment
ORDER BY seg
""",
)


# --- JSON_TABLE -------------------------------------------------------------
# Documents built from orders (deterministic array order via
# array_sort), exploded back relationally through JSON_TABLE with
# FOR ORDINALITY + PATH columns (pg17_json.sql:52-63 flat shape).
# The oracle never touches JSON — it states the relational identity
# the round-trip must preserve.
def json_table_flat(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __jt_docs")
    s.sql("CREATE TABLE __jt_docs (prio text, js text)")
    s.sql(
        """
INSERT INTO __jt_docs
SELECT o_orderpriority AS prio,
       to_json(array_sort(collect_list(named_struct(
         'k', o_orderkey,
         'p', CAST(o_totalprice AS DECIMAL(18,2)))))) AS js
FROM orders WHERE o_orderkey < 1000
GROUP BY o_orderpriority
"""
    )
    return s.sql(
        """
SELECT d.prio, jt.ord, jt.k, CAST(jt.p AS DOUBLE) AS p
FROM __jt_docs d,
JSON_TABLE (js, '$' COLUMNS (
  ord FOR ORDINALITY,
  k bigint PATH '$.k',
  p numeric(18,2) PATH '$.p')) AS jt
ORDER BY prio, ord
"""
    )


register_split(
    "json_table_flat",
    json_table_flat,
    """
SELECT o_orderpriority AS prio,
       CAST(row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_orderkey) AS INT) AS ord,
       o_orderkey AS k,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p
FROM orders WHERE o_orderkey < 1000
ORDER BY prio, ord
""",
)
