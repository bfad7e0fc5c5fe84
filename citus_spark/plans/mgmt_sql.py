"""Textual management-UDF calls — the reference's literal SQL syntax.

↔ reference: the primary user API of Citus IS SQL —
`SELECT create_distributed_table('t', 'col', colocate_with => 'u')`
(commands/create_distributed_table.c:222), `create_reference_table`,
`alter_distributed_table`, `undistribute_table`, and the
`citus_tables` metadata view. DistributedSession exposes the same
operations as Python methods; this module routes the SQL spellings to
them so a user can paste reference DDL scripts unchanged.

Supported argument forms: positional string/int literals and the
PostgreSQL named-argument arrow (`name => value`). Anything else
raises with the offending text rather than guessing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_FNS = (
    "create_distributed_table",
    "create_reference_table",
    "alter_distributed_table",
    "undistribute_table",
    "rebalance_table_shards",
    "get_rebalance_table_shards_plan",
    "isolate_tenant_to_new_shard",
    "alter_columnar_table_set",
    "alter_table_set_access_method",
    "citus_stat_statements_reset",
    "create_time_partitions",
    "drop_old_time_partitions",
    "citus_table_size",
    "citus_total_relation_size",
    "citus_relation_size",
    "citus_version",
    "update_distributed_table_colocation",
    "create_distributed_function",
    "citus_schema_distribute",
    "citus_schema_undistribute",
    # node management (↔ multi_cluster_management.sql regress; legacy
    # master_* aliases) — metadata-level on Spark: executors are the
    # workers and the scheduler owns placement, but scripts that
    # register nodes must run unchanged and the node table must be
    # queryable
    "citus_add_node",
    "master_add_node",
    "citus_remove_node",
    "master_remove_node",
    "citus_activate_node",
    "citus_disable_node",
    "citus_update_node",
    "citus_set_coordinator_host",
    "master_create_distributed_table",
    # shard placement / rebalancer jobs / fan-out / introspection
    # (round 6 — citus_spark/cluster.py). ORDER MATTERS inside this
    # alternation: longer names that share a prefix with a shorter one
    # must come first or the regex stops at the prefix and the
    # trailing text breaks the match.
    "get_shard_id_for_distribution_column",
    "citus_split_shard_by_split_points",
    "citus_create_restore_point",
    "citus_add_rebalance_strategy",
    "citus_set_default_rebalance_strategy",
    "citus_move_shard_placement",
    "master_move_shard_placement",
    "citus_copy_shard_placement",
    "master_copy_shard_placement",
    "citus_drain_node",
    "master_drain_node",
    "citus_set_node_property",
    "citus_rebalance_start",
    "citus_rebalance_status",
    "citus_rebalance_stop",
    "citus_rebalance_wait",
    "citus_job_list",
    "citus_job_status",
    "citus_job_wait",
    "citus_job_cancel",
    "run_command_on_workers",
    "run_command_on_all_nodes",
    "run_command_on_coordinator",
    "run_command_on_shards",
    "citus_is_coordinator",
    "citus_backend_gpid",
    "citus_calculate_gpid",
    "citus_coordinator_nodeid",
    "citus_nodename_for_nodeid",
    "citus_nodeport_for_nodeid",
    "citus_server_id",
    "citus_shard_sizes",
    "master_get_table_ddl_events",
    "citus_check_cluster_node_health",
    "citus_check_connection_to_node",
    "create_distributed_table_concurrently",
    "citus_add_local_table_to_metadata",
    "truncate_local_data_after_distributing_table",
    "citus_update_shard_statistics",
    "citus_update_table_statistics",
)

# drop_old_time_partitions is a PROCEDURE in the reference (invoked
# with CALL); the rest are functions (SELECT) — accept either keyword
_CALL = re.compile(
    rf"^\s*(?:SELECT|CALL)\s+({'|'.join(_FNS)})\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# regress idiom: `SELECT 1 FROM citus_add_node(...)` — a scalar
# management function in FROM position (PG treats it as a one-row
# relation). The select list must be trivial (`1`, `*`, or the
# function name) — anything else is not a management statement.
_FROM_CALL = re.compile(
    rf"^\s*SELECT\s+(1|\*|[A-Za-z_]\w*)\s+FROM\s+"
    rf"({'|'.join(_FNS)})\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_CITUS_TABLES = re.compile(r"\bcitus_tables\s*\(\s*\)|\bcitus_tables\b", re.I)


@dataclass
class MgmtCall:
    fn: str
    args: list[str | int]
    kwargs: dict[str, str | int]
    # set for the `SELECT 1 FROM fn(...)` idiom: the trivial select
    # item ("1", "*", or the function name)
    select_item: str | None = None


def _parse_value(text: str):
    text = text.strip()
    # doubled quotes are SQL escapes — load-bearing for the
    # run_command_* functions, whose argument is arbitrary SQL text
    m = re.match(r"^'((?:[^']|'')*)'$", text)
    if m:
        return m.group(1).replace("''", "'")
    # dollar-quoted argument ($$..$$ / $tag$..$tag$) — the regress
    # scripts pass run_command_on_workers bodies this way
    dm = re.match(r"^\$(?P<tag>\w*)\$(?P<body>.*)\$(?P=tag)\$$", text, re.S)
    if dm:
        return dm.group("body").strip()
    if re.match(r"^-?\d+$", text):
        return int(text)
    # PG numeric spellings: .5, 5., 1.25, 1e-3 (strategy thresholds)
    if re.match(r"^-?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?$", text):
        return float(text)
    if text.lower() in ("true", "false"):
        return text.lower() == "true"
    # ARRAY['0','5'] / ARRAY[1,2] literals (split-points, node ids)
    am = re.match(r"^ARRAY\s*\[(.*)\]$", text, re.I | re.S)
    if am:
        from citus_spark.plans.rewrites import _split_top_level

        return [_parse_value(p) for p in _split_top_level(am.group(1))]
    # 'mode'::citus.shard_transfer_mode — drop the enum cast
    cm = re.match(r"^'([^']*)'\s*::\s*citus\.\w+$", text, re.I)
    if cm:
        return cm.group(1)
    raise ValueError(f"management call: cannot parse argument {text!r}")


def _balanced(body: str) -> bool:
    """True when `body` is a plausible single argument list: balanced
    parens outside quotes, never dipping below depth 0. A statement
    like `SELECT citus_table_size('t') + citus_table_size('u')`
    matches the greedy call regex with an unbalanced body — that is
    an EXPRESSION, not a management call, and must fall through."""
    depth = 0
    in_q = False
    i = 0
    while i < len(body):
        c = body[i]
        if in_q:
            if c == "'":
                if i + 1 < len(body) and body[i + 1] == "'":
                    i += 2
                    continue
                in_q = False
        elif c == "'":
            in_q = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return False
        i += 1
    return depth == 0 and not in_q


def parse_mgmt(sql: str) -> MgmtCall | None:
    """Return the management call, or None if `sql` is not one."""
    m = _CALL.match(sql)
    select_item = None
    if not m:
        fm = _FROM_CALL.match(sql)
        if fm and fm.group(1).lower() in ("1", "*", fm.group(2).lower()):
            select_item = fm.group(1)
            m = fm
        else:
            return None
    if select_item is None:
        fn, body = m.group(1).lower(), m.group(2).strip()
    else:
        fn, body = m.group(2).lower(), m.group(3).strip()
    if not _balanced(body):
        return None
    args: list[str | int] = []
    kwargs: dict[str, str | int] = {}
    if body:
        # top-level comma split: commas inside a quoted argument
        # (e.g. create_distributed_function('f(int,int)')) don't split
        from citus_spark.plans.rewrites import _split_top_level

        for part in _split_top_level(body):
            # both PG named-argument spellings: name => val (SQL
            # standard) and name := val (PG-historical; regress
            # scripts use it, e.g. distributed_collations.sql:41).
            # The name must be a bare identifier — a quoted value
            # that happens to contain '=>' stays positional.
            named = re.match(
                r"^\s*([A-Za-z_]\w*)\s*(?:=>|:=)\s*(.+)$", part, re.S
            )
            if named:
                kwargs[named.group(1).lower()] = _parse_value(
                    named.group(2)
                )
            else:
                if kwargs:
                    raise ValueError(
                        "management call: positional argument after named"
                    )
                args.append(_parse_value(part))
    return MgmtCall(
        fn=fn, args=args, kwargs=kwargs, select_item=select_item
    )


_CITUS_SHARDS = re.compile(r"\bcitus_shards\s*\(\s*\)|\bcitus_shards\b", re.I)

# \b between 's' and '_' does not match, so the view pattern cannot
# fire inside citus_stat_statements_reset()
_CITUS_STAT = re.compile(
    r"\bcitus_stat_statements\s*\(\s*\)|\bcitus_stat_statements\b", re.I
)


_CITUS_ACTIVITY = re.compile(
    r"\bcitus_stat_activity\s*\(\s*\)|\bcitus_stat_activity\b", re.I
)

_CITUS_TENANTS = re.compile(
    r"\bcitus_stat_tenants\s*\(\s*\)|\bcitus_stat_tenants\b", re.I
)


def uses_citus_stat_tenants(sql: str) -> bool:
    return bool(_CITUS_TENANTS.search(sql))


def rewrite_citus_stat_tenants(sql: str, view_name: str) -> str:
    """Replace the citus_stat_tenants relation reference with a
    registered view name."""
    return _CITUS_TENANTS.sub(view_name, sql)


def uses_citus_stat_activity(sql: str) -> bool:
    return bool(_CITUS_ACTIVITY.search(sql))


def rewrite_citus_stat_activity(sql: str, view_name: str) -> str:
    """Replace the citus_stat_activity relation reference with a
    registered view name."""
    return _CITUS_ACTIVITY.sub(view_name, sql)


def uses_citus_stat_statements(sql: str) -> bool:
    return bool(_CITUS_STAT.search(sql))


def rewrite_citus_stat_statements(sql: str, view_name: str) -> str:
    """Replace the citus_stat_statements relation reference with a
    registered view name."""
    return _CITUS_STAT.sub(view_name, sql)


def uses_citus_tables(sql: str) -> bool:
    return bool(_CITUS_TABLES.search(sql))


def rewrite_citus_tables(sql: str, view_name: str) -> str:
    """Replace the citus_tables()/citus_tables relation reference with
    a registered view name."""
    return _CITUS_TABLES.sub(view_name, sql)


def uses_citus_shards(sql: str) -> bool:
    return bool(_CITUS_SHARDS.search(sql))


def rewrite_citus_shards(sql: str, view_name: str) -> str:
    """Replace the citus_shards()/citus_shards relation reference with
    a registered view name."""
    return _CITUS_SHARDS.sub(view_name, sql)


_ACTIVE_WORKERS = re.compile(
    r"\b(?:citus|master)_get_active_worker_nodes\s*\(\s*\)", re.I
)


def uses_active_worker_nodes(sql: str) -> bool:
    return bool(_ACTIVE_WORKERS.search(sql))


def rewrite_active_worker_nodes(sql: str, view_name: str) -> str:
    """Replace citus/master_get_active_worker_nodes() with a view."""
    return _ACTIVE_WORKERS.sub(view_name, sql)
