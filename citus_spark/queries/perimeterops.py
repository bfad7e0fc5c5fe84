"""Round-10 perimeter-surface oracle entries: the new enum ordered
operators (BETWEEN / column-vs-column / GREATEST/LEAST), COLLATE
clause acceptance, and trigger no-op isolation.

↔ reference regress: distributed_types.sql (enum order semantics),
distributed_collations.sql (COLLATE pushdown),
citus_table_triggers.sql (trigger gating).

Same contract as typeops: each entry builds scratch state through the
session surface and returns a relation DuckDB re-derives value-
exactly from the fixtures alone — the oracle runs none of the DDL, it
states what the end state must equal.
"""

from __future__ import annotations

from citus_spark.queries import DSUM, register_split


def _sess(spark, sf_dir):
    from citus_spark.session import register_views

    return register_views(spark, sf_dir)


# --- enum BETWEEN / col-vs-col / GREATEST-LEAST ------------------------
# Labels where declaration order disagrees with lexical order (same
# trick as enum_type_ordering): a lexical regression in ANY of the
# four new rewrite forms flips a count and hash-mismatches.
_LVL_CASE = (
    "CASE o_orderpriority WHEN '1-URGENT' THEN 'urgent' "
    "WHEN '2-HIGH' THEN 'high' WHEN '3-MEDIUM' THEN 'medium' "
    "WHEN '5-LOW' THEN 'low' ELSE 'none' END"
)
_LVL2_CASE = (
    "CASE CAST(o_orderkey % 5 AS INT) WHEN 0 THEN 'none' "
    "WHEN 1 THEN 'low' WHEN 2 THEN 'medium' WHEN 3 THEN 'high' "
    "ELSE 'urgent' END"
)
_RANK = (
    "CASE {c} WHEN 'none' THEN 1 WHEN 'low' THEN 2 WHEN 'medium' "
    "THEN 3 WHEN 'high' THEN 4 WHEN 'urgent' THEN 5 END"
)
_BACK = (
    "CASE {r} WHEN 1 THEN 'none' WHEN 2 THEN 'low' WHEN 3 THEN "
    "'medium' WHEN 4 THEN 'high' WHEN 5 THEN 'urgent' END"
)


def enum_range_extremes(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __en_be")
    s.sql("DROP TYPE IF EXISTS prio_be")
    s.sql(
        "CREATE TYPE prio_be AS ENUM "
        "('none', 'low', 'medium', 'high', 'urgent')"
    )
    s.sql("CREATE TABLE __en_be (okey bigint, lvl prio_be, lvl2 prio_be)")
    s.sql(
        f"INSERT INTO __en_be SELECT o_orderkey, {_LVL_CASE}, "
        f"{_LVL2_CASE} FROM orders WHERE o_orderkey < 6000"
    )
    return s.sql(
        """
SELECT
  CAST(sum(CASE WHEN lvl BETWEEN 'low' AND 'high' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_mid,
  CAST(sum(CASE WHEN lvl NOT BETWEEN 'low' AND 'high' THEN 1 ELSE 0
       END) AS BIGINT) AS n_out,
  CAST(sum(CASE WHEN lvl < lvl2 THEN 1 ELSE 0 END) AS BIGINT) AS n_lt,
  CAST(sum(CASE WHEN greatest(lvl, lvl2) = 'urgent' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_gu,
  CAST(sum(CASE WHEN least(lvl, 'medium') = 'medium' THEN 1 ELSE 0
       END) AS BIGINT) AS n_lm,
  min(lvl) AS mn, max(lvl) AS mx
FROM __en_be
"""
    )


register_split(
    "enum_range_extremes",
    enum_range_extremes,
    f"""
WITH src AS (
  SELECT {_LVL_CASE} AS lvl, {_LVL2_CASE} AS lvl2
  FROM orders WHERE o_orderkey < 6000
), r AS (
  SELECT {_RANK.format(c='lvl')} AS rl, {_RANK.format(c='lvl2')} AS r2
  FROM src
)
SELECT
  CAST(sum(CASE WHEN rl BETWEEN 2 AND 4 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_mid,
  CAST(sum(CASE WHEN rl NOT BETWEEN 2 AND 4 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_out,
  CAST(sum(CASE WHEN rl < r2 THEN 1 ELSE 0 END) AS BIGINT) AS n_lt,
  CAST(sum(CASE WHEN (CASE WHEN rl > r2 THEN rl ELSE r2 END) = 5
    THEN 1 ELSE 0 END) AS BIGINT) AS n_gu,
  CAST(sum(CASE WHEN (CASE WHEN rl < 3 THEN rl ELSE 3 END) = 3
    THEN 1 ELSE 0 END) AS BIGINT) AS n_lm,
  {_BACK.format(r='min(rl)')} AS mn,
  {_BACK.format(r='max(rl)')} AS mx
FROM r
""",
)


# --- COLLATE clauses --------------------------------------------------
def collate_binary_order(spark, sf_dir):
    s = _sess(spark, sf_dir)
    s.sql(
        "CREATE COLLATION IF NOT EXISTS de_phone "
        "(provider = icu, locale = 'de-u-co-phonebk')"
    )
    # registered + built-in + quoted-locale COLLATE clauses accepted
    # in WHERE / aggregate / ORDER BY; comparison semantics are
    # binary UTF-8 order, which DuckDB's default collation matches
    return s.sql(
        """
SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
       min(c_name COLLATE "C") AS first_name
FROM customer
WHERE c_name COLLATE de_phone < 'Customer#000000900'
GROUP BY c_mktsegment
ORDER BY c_mktsegment COLLATE "en_US"
"""
    )


register_split(
    "collate_binary_order",
    collate_binary_order,
    """
SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
       min(c_name) AS first_name
FROM customer
WHERE c_name < 'Customer#000000900'
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)


# --- trigger no-op isolation ------------------------------------------
def trigger_noop_isolation(spark, sf_dir):
    """Triggers are recorded, never FIRED: the trigger body zeroes v
    on insert — if any code path executed it, the checksum diverges
    from the oracle's trigger-free derivation. Also exercises the
    full lifecycle (function, create, disable, drop) on a plain
    table, which the reference permits (citus_table_triggers.out:46)."""
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __trg_t")
    s.sql("CREATE TABLE __trg_t (k bigint, v double)")
    s.sql(
        "CREATE FUNCTION __trg_fn() RETURNS trigger AS $$ BEGIN "
        "NEW.v := 0; RETURN NEW; END $$ LANGUAGE plpgsql"
    )
    s.sql(
        "CREATE TRIGGER trg_zero BEFORE INSERT ON __trg_t "
        "FOR EACH ROW EXECUTE FUNCTION __trg_fn()"
    )
    s.sql(
        "INSERT INTO __trg_t SELECT o_orderkey, o_totalprice "
        "FROM orders WHERE o_orderkey < 5000"
    )
    s.sql("ALTER TABLE __trg_t DISABLE TRIGGER trg_zero")
    s.sql("DROP TRIGGER trg_zero ON __trg_t")
    return s.sql(
        f"SELECT CAST(count(*) AS BIGINT) AS n, "
        f"{DSUM('v', 'v_sum')} FROM __trg_t"
    )


register_split(
    "trigger_noop_isolation",
    trigger_noop_isolation,
    f"""
SELECT CAST(count(*) AS BIGINT) AS n, {DSUM('o_totalprice', 'v_sum')}
FROM orders WHERE o_orderkey < 5000
""",
)


# --- r11: parenthesized VACUUM + async-notify no-op isolation ---------
def vacuum_paren_isolation(spark, sf_dir):
    """The PG 16 psql surface closed in r11 (verdict item #7): the
    parenthesized VACUUM option form compacts + analyzes through the
    real utility paths, and LISTEN/NOTIFY/UNLISTEN are recorded
    no-ops — none of it may change the relation's contents, which the
    oracle re-derives from the fixture alone."""
    s = _sess(spark, sf_dir)
    s.sql("DROP TABLE IF EXISTS __vac_t")
    s.sql("CREATE TABLE __vac_t (k bigint, v double)")
    s.sql(
        "INSERT INTO __vac_t SELECT o_orderkey, o_totalprice "
        "FROM orders WHERE o_orderkey < 4000"
    )
    s.sql("LISTEN vac_chan")
    s.sql("NOTIFY vac_chan, 'compact now'")
    s.sql("VACUUM (FULL, ANALYZE) __vac_t")
    s.sql("VACUUM FULL __vac_t")
    s.sql("UNLISTEN *")
    return s.sql(
        f"SELECT CAST(count(*) AS BIGINT) AS n, "
        f"{DSUM('v', 'v_sum')} FROM __vac_t"
    )


register_split(
    "vacuum_paren_isolation",
    vacuum_paren_isolation,
    f"""
SELECT CAST(count(*) AS BIGINT) AS n, {DSUM('o_totalprice', 'v_sum')}
FROM orders WHERE o_orderkey < 4000
""",
)
