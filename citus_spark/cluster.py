"""Cluster-management surface: shard placement metadata, the
background-rebalance job registry, node/gpid introspection scalars,
per-shard/per-node command fan-out, and DDL reconstruction.

↔ reference surface (all public UDFs from
src/backend/distributed/sql/):

- get_shard_id_for_distribution_column  (shardinterval_utils.c) —
  REAL computation here: the engine's placement function is
  pmod(hash(dist_col), buckets) (the one `_shard_label` uses), so the
  returned shard id is the bucket the value's rows actually live in.
- citus_move_shard_placement / citus_copy_shard_placement /
  citus_drain_node / citus_set_node_property
  (shard_rebalancer.c, node_metadata.c) — placement METADATA: on
  Spark the scheduler assigns bucket partitions to executors per
  query, so pg_dist_placement here is bookkeeping the same way the
  reference's is the source of truth; moves update it atomically.
- citus_rebalance_start/status/stop/wait + citus_job_*
  (background_jobs.c) — the job registry; "rebalance" recomputes the
  round-robin placement map. Local mode has no background daemon, so
  jobs run synchronously and are recorded finished — wait() returning
  immediately is then the honest semantics, not a stub.
- run_command_on_workers / run_command_on_all_nodes /
  run_command_on_coordinator / run_command_on_shards
  (worker_node_manager.c, commands/multi_copy.c fan-out helpers) —
  run_command_on_shards genuinely executes the command once per
  shard against a bucket-scoped view of the relation (%s
  substitution, like the reference).
- citus_is_coordinator / citus_coordinator_nodeid /
  citus_backend_gpid / citus_calculate_gpid / citus_nodename_for_
  nodeid / ... (metadata_utility.c) — gpid = groupId * 10^10 + pid,
  the reference's formula.
- master_get_table_ddl_events (master_metadata_utility.c) — DDL
  reconstruction from the live schema + catalog entry.
"""

from __future__ import annotations

import os
import re
from typing import Any

from pyspark.sql import DataFrame

FIRST_SHARD_ID = 102008
GPID_NODE_MULT = 10_000_000_000  # reference: groupId * 10^10 + pid


# --------------------------------------------------------------- shard ids
def shard_base_ids(sess) -> dict[str, int]:
    """Per-table first shard id, in the SAME allocation order as the
    citus_shards view / _pg_dist_shard catalog (catalog iteration
    order, hash tables consume `buckets` ids, reference tables 1)."""
    base: dict[str, int] = {}
    nxt = FIRST_SHARD_ID
    for t in sess.catalog.tables().values():
        if t.is_hash_distributed:
            base[t.name] = nxt
            nxt += t.buckets
        elif t.is_reference:
            base[t.name] = nxt
            nxt += 1
    return base


def _sql_lit(value: Any) -> str:
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    return "'" + str(value).replace("'", "''") + "'"


def get_shard_id_for_distribution_column(sess, table: str, value) -> int:
    """Shard id of the bucket `value` hashes to — the engine's actual
    placement function (pmod(hash(CAST(v AS <dist-col type>)),
    buckets)), honoring isolated tenants."""
    t = sess.catalog.get(table)
    if t is None or not t.is_hash_distributed:
        raise ValueError(
            f"get_shard_id_for_distribution_column: {table!r} is not a "
            "hash-distributed table"
        )
    iso = getattr(t, "isolated", None) or {}
    if str(value) in iso:
        return int(iso[str(value)])
    coltype = dict(sess.spark.table(table).dtypes)[t.dist_col]
    row = sess.spark.sql(
        f"SELECT hash(CAST({_sql_lit(value)} AS {coltype})) AS h, "
        f"pmod(hash(CAST({_sql_lit(value)} AS {coltype})), "
        f"{t.buckets}) AS b"
    ).collect()[0]
    splits = getattr(t, "splits", None) or {}
    if int(row.b) in splits:
        for sid, lo, hi in splits[int(row.b)]:
            if int(lo) <= int(row.h) <= int(hi):
                return int(sid)
    return shard_base_ids(sess)[table] + int(row.b)


# -------------------------------------------------------------- placements
def _worker_nodes(sess, only_should_have: bool = True) -> list[dict]:
    nodes = [
        n
        for n in (getattr(sess, "_nodes", []) or [])
        if n.get("isactive", True) and n.get("noderole", "primary") == "primary"
        and n.get("groupid", -1) != 0
    ]
    if only_should_have:
        nodes = [n for n in nodes if n.get("shouldhaveshards", True)]
    return sorted(nodes, key=lambda n: n["nodeid"])


def _node_by_addr(sess, name: str, port: int) -> dict:
    for n in getattr(sess, "_nodes", []) or []:
        if n["nodename"] == name and int(n["nodeport"]) == int(port):
            return n
    raise ValueError(f"node {name}:{port} is not in pg_dist_node")


def _explicit_placements(sess) -> dict:
    """Moves/copies/drains persist here, keyed by the STABLE identity
    (table name, shard label) — never by the derived shard id, which
    re-keys when an earlier catalog entry is dropped/undistributed.
    Labels are 'b<k>' for hash buckets, 's<id>' for isolated tenants,
    'r' for a reference table's single shard."""
    if getattr(sess, "_placements", None) is None:
        sess._placements = {}
    return sess._placements


def _shard_labels(t) -> list[tuple[str, int]]:
    """(label, offset-in-id-allocation) pairs for a catalog entry.
    A range-split bucket is REPLACED by its children (the reference
    drops the parent shard row after a split); child and isolated
    shard ids are absolute, flagged by the 's' prefix."""
    if t.is_hash_distributed:
        splits = getattr(t, "splits", None) or {}
        out: list[tuple[str, int]] = []
        for b in range(t.buckets):
            if b in splits:
                out += [(f"s{sid}", int(sid)) for sid, _lo, _hi in splits[b]]
            else:
                out.append((f"b{b}", b))
        out += [
            (f"s{int(s)}", int(s))
            for s in (getattr(t, "isolated", None) or {}).values()
        ]
        return out
    if t.is_reference:
        return [("r", 0)]
    return []


def _shard_key(sess, shardid: int) -> tuple[str, str]:
    """(table, label) identity of a shard id under the CURRENT
    allocation — resolved once at call time; the stored key stays
    valid across later catalog changes."""
    base = shard_base_ids(sess)
    for t in sess.catalog.tables().values():
        if t.name not in base:
            continue
        if t.is_hash_distributed:
            splits = getattr(t, "splits", None) or {}
            if base[t.name] <= int(shardid) < base[t.name] + t.buckets:
                b = int(shardid) - base[t.name]
                if b in splits:
                    # the parent shard id of a split bucket is gone —
                    # the reference drops it when the children land
                    raise ValueError(f"shard {shardid} does not exist")
                return (t.name, f"b{b}")
            iso = getattr(t, "isolated", None) or {}
            if int(shardid) in {int(s) for s in iso.values()}:
                return (t.name, f"s{int(shardid)}")
            for children in splits.values():
                if int(shardid) in {int(s) for s, _lo, _hi in children}:
                    return (t.name, f"s{int(shardid)}")
        elif t.is_reference and int(shardid) == base[t.name]:
            return (t.name, "r")
    raise ValueError(f"shard {shardid} does not exist")


def _placement_map(sess) -> dict[int, list[int]]:
    """shardid → [groupid, ...]. Explicit entries (moves/copies) win;
    every other shard gets the deterministic round-robin default over
    shouldhaveshards workers (groupid 0 = coordinator-only cluster).
    Explicit entries whose table left the catalog are ignored."""
    explicit = _explicit_placements(sess)
    workers = _worker_nodes(sess)
    out: dict[int, list[int]] = {}
    base = shard_base_ids(sess)
    for t in sess.catalog.tables().values():
        if t.name not in base:
            continue
        for label, off in _shard_labels(t):
            sid = int(off) if label.startswith("s") else base[t.name] + off
            key = (t.name, label)
            if key in explicit:
                out[sid] = list(explicit[key])
            elif t.is_reference and workers:
                # reference tables are replicated to every node
                out[sid] = [n["groupid"] for n in workers]
            elif workers:
                # round-robin keyed on the STABLE shard identity
                # (bucket number, or the absolute child/isolated id) —
                # never the list index, which would silently relocate
                # every later shard when an earlier bucket splits
                idx = int(label[1:]) if label[0] in "bs" else 0
                out[sid] = [workers[idx % len(workers)]["groupid"]]
            else:
                out[sid] = [0]
    return out


def pg_dist_placement_df(sess) -> DataFrame:
    rows = []
    pid = 1
    for sid, groups in sorted(_placement_map(sess).items()):
        for g in groups:
            rows.append((pid, int(sid), 1, 0, int(g)))
            pid += 1
    return sess.spark.createDataFrame(
        rows or [(0, 0, 0, 0, 0)],
        "placementid long, shardid long, shardstate int, "
        "shardlength long, groupid int",
    ).filter("placementid != 0")


def citus_move_shard_placement(
    sess, shardid: int, sname: str, sport: int, dname: str, dport: int
) -> None:
    src = _node_by_addr(sess, sname, sport)
    dst = _node_by_addr(sess, dname, dport)
    key = _shard_key(sess, shardid)
    cur = _placement_map(sess)[int(shardid)]
    if src["groupid"] not in cur:
        raise ValueError(
            f"shard {shardid} has no placement on {sname}:{sport}"
        )
    if dst["groupid"] in cur:
        # mirrors the reference's error — a silent dedup would drop a
        # replica (and a same-node move must not no-op quietly)
        raise ValueError(
            f"shard {shardid} already exists on {dname}:{dport}"
        )
    _explicit_placements(sess)[key] = [
        g for g in cur if g != src["groupid"]
    ] + [dst["groupid"]]


def citus_copy_shard_placement(
    sess, shardid: int, sname: str, sport: int, dname: str, dport: int
) -> None:
    _node_by_addr(sess, sname, sport)  # source must exist
    dst = _node_by_addr(sess, dname, dport)
    key = _shard_key(sess, shardid)
    cur = _placement_map(sess)[int(shardid)]
    if dst["groupid"] in cur:
        raise ValueError(
            f"shard {shardid} already has a placement on {dname}:{dport}"
        )
    _explicit_placements(sess)[key] = cur + [dst["groupid"]]


def citus_drain_node(sess, name: str, port: int) -> None:
    """Move every placement OFF the node and mark it
    shouldhaveshards=false. Shards not on the drained node keep their
    exact pre-drain placement (snapshotted as explicit entries before
    the flag flips — otherwise the default round-robin would silently
    re-deal unrelated shards, and re-enabling the property alone would
    undo the drain without a rebalance)."""
    node = _node_by_addr(sess, name, port)
    snapshot = _placement_map(sess)  # BEFORE the flag flips
    node["shouldhaveshards"] = False
    targets = [
        n for n in _worker_nodes(sess) if n["groupid"] != node["groupid"]
    ]
    explicit = _explicit_placements(sess)
    k = 0
    for sid, groups in sorted(snapshot.items()):
        key = _shard_key(sess, sid)
        if node["groupid"] in groups:
            rest = [g for g in groups if g != node["groupid"]]
            if targets:
                cand = targets[k % len(targets)]["groupid"]
                k += 1
                if cand not in rest:
                    rest.append(cand)
            explicit[key] = rest or [0]
        else:
            explicit[key] = list(groups)


def citus_set_node_property(
    sess, name: str, port: int, prop: str, value: bool
) -> None:
    if prop != "shouldhaveshards":
        raise ValueError(
            f"unsupported node property {prop!r} (only shouldhaveshards)"
        )
    _node_by_addr(sess, name, port)["shouldhaveshards"] = bool(value)


# ------------------------------------------------------------ job registry
def _jobs(sess) -> list[dict]:
    if getattr(sess, "_cluster_jobs", None) is None:
        sess._cluster_jobs = []
    return sess._cluster_jobs


def citus_rebalance_start(sess) -> int:
    """Recompute the round-robin placement map over shouldhaveshards
    workers (drop explicit placements), synchronously — local mode has
    no background daemon, so the job is recorded finished."""
    sess._placements = {}
    jobs = _jobs(sess)
    job_id = len(jobs) + 1
    jobs.append(
        {
            "job_id": job_id,
            "state": "finished",
            "job_type": "rebalance",
            "description": "Rebalance all colocation groups",
        }
    )
    return job_id


def citus_rebalance_status(sess) -> DataFrame:
    jobs = [j for j in _jobs(sess) if j["job_type"] == "rebalance"]
    return sess.spark.createDataFrame(
        [
            (j["job_id"], j["state"], j["job_type"], j["description"])
            for j in jobs
        ]
        or [(0, "", "", "")],
        "job_id long, state string, job_type string, description string",
    ).filter("job_id != 0")


def citus_rebalance_stop(sess) -> None:
    if not any(
        j["state"] == "running" for j in _jobs(sess)
        if j["job_type"] == "rebalance"
    ):
        raise ValueError("no ongoing rebalance that can be stopped")


def citus_job_list(sess) -> DataFrame:
    return sess.spark.createDataFrame(
        [
            (j["job_id"], j["state"], j["job_type"], j["description"])
            for j in _jobs(sess)
        ]
        or [(0, "", "", "")],
        "job_id long, state string, job_type string, description string",
    ).filter("job_id != 0")


def citus_job_status(sess, job_id: int) -> dict:
    for j in _jobs(sess):
        if j["job_id"] == int(job_id):
            return j
    raise ValueError(f"job {job_id} does not exist")


def citus_job_wait(sess, job_id: int, desired_status: str | None = None):
    j = citus_job_status(sess, job_id)
    if desired_status and j["state"] != desired_status:
        raise ValueError(
            f"Job reached terminal state {j['state']!r} instead of "
            f"desired state {desired_status!r}"
        )


def citus_job_cancel(sess, job_id: int) -> None:
    j = citus_job_status(sess, job_id)
    if j["state"] == "finished":
        raise ValueError(f"job {job_id} has already finished")
    j["state"] = "cancelled"


# --------------------------------------------------------------- fan-out
def _first_cell(df: DataFrame) -> str:
    rows = df.limit(1).collect()
    if not rows or not len(rows[0]):
        return ""
    v = rows[0][0]
    return "" if v is None else str(v)


def run_command_on_workers(sess, command: str) -> DataFrame:
    """Execute `command` once per active worker node. The executors
    behind those metadata rows share one engine, so each per-node run
    executes against the same catalog (exactly what the reference's
    regress scripts assert when they run SELECT-style commands)."""
    rows = []
    for n in _worker_nodes(sess, only_should_have=False):
        try:
            rows.append(
                (n["nodename"], int(n["nodeport"]), True,
                 _first_cell(sess.sql(command)))
            )
        except Exception as exc:  # mirror the (success, result) contract
            rows.append(
                (n["nodename"], int(n["nodeport"]), False, str(exc)[:200])
            )
    return sess.spark.createDataFrame(
        rows or [("", 0, False, "")],
        "nodename string, nodeport int, success boolean, result string",
    ).filter("nodename != ''")


def _coordinator_addr(sess) -> tuple[str, int]:
    """The one coordinator resolution all fan-out surfaces share:
    an explicit groupid-0 node wins, then citus_set_coordinator_host,
    then the local default."""
    for n in getattr(sess, "_nodes", []) or []:
        if n.get("groupid") == 0:
            return (n["nodename"], int(n["nodeport"]))
    coord = getattr(sess, "_coordinator", None)
    return (coord[0], int(coord[1])) if coord else ("localhost", 5432)


def run_command_on_all_nodes(sess, command: str) -> DataFrame:
    rows = []
    targets = [_coordinator_addr(sess)] + [
        (n["nodename"], int(n["nodeport"]))
        for n in _worker_nodes(sess, only_should_have=False)
    ]
    for name, port in targets:
        try:
            rows.append((name, port, True, _first_cell(sess.sql(command))))
        except Exception as exc:
            rows.append((name, port, False, str(exc)[:200]))
    return sess.spark.createDataFrame(
        rows, "nodename string, nodeport int, success boolean, result string"
    )


def run_command_on_coordinator(sess, command: str) -> DataFrame:
    cname, cport = _coordinator_addr(sess)
    try:
        rows = [(cname, cport, True, _first_cell(sess.sql(command)))]
    except Exception as exc:
        rows = [(cname, cport, False, str(exc)[:200])]
    return sess.spark.createDataFrame(
        rows, "nodename string, nodeport int, success boolean, result string"
    )


# fast-path shape: one plain aggregate over the whole shard view,
# optional WHERE — the exact commands regress scripts fan out
# (SELECT count(*) FROM %s, SELECT sum(x) FROM %s WHERE ...)
_SHARD_AGG = re.compile(
    r"^\s*SELECT\s+(?P<agg>count|sum|min|max|avg)\s*"
    r"\(\s*(?P<arg>\*|[A-Za-z_]\w*)\s*\)\s+FROM\s+%s\s*"
    r"(?:WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.I | re.S,
)


def run_command_on_shards(sess, table: str, command: str) -> DataFrame:
    """Execute `command` once per shard, with %s replaced by a view
    scoped to that shard's rows — REAL per-shard execution (the
    reference substitutes the physical shard relation name the same
    way).

    SCALE: the general path is a serial driver loop — one Spark query
    per shard, O(shards) round trips. Reference-faithful (the UDF's
    contract is per-shard statements of arbitrary SQL) and fine at 32
    buckets, but at thousands of shards the loop serializes. Commands
    matching the common aggregate shape (`SELECT agg(col|*) FROM %s
    [WHERE ...]`) therefore take a FAST PATH: one distributed
    grouped-aggregation over the shard label answers every shard in a
    single job, identical results. Anything else (DML per shard,
    multi-column selects) keeps the faithful loop."""
    from pyspark.sql import functions as F

    from citus_spark.session import _shard_label

    t = sess.catalog.get(table)
    if t is None or not t.is_hash_distributed:
        raise ValueError(
            f"run_command_on_shards: {table!r} is not a distributed table"
        )
    if "%s" not in command:
        raise ValueError("run_command_on_shards: command must contain %s")
    base = shard_base_ids(sess)[table]
    iso = getattr(t, "isolated", None) or {}
    df = sess.spark.table(table)
    label = _shard_label(
        t.dist_col, t.buckets, iso, getattr(t, "splits", None)
    )
    labeled = df.withColumn("__citus_shard", label)
    shard_keys = [
        (int(lb[1:]) if lb.startswith("s") else base + off, lb)
        for lb, off in _shard_labels(t)
    ]
    m = _SHARD_AGG.match(command)
    if m is not None:
        try:
            return _run_agg_on_shards(sess, labeled, shard_keys, m)
        except Exception:
            pass  # fall back to the faithful per-shard loop
    rows = []
    for sid, key in shard_keys:
        view = f"{table}_{sid}"
        labeled.filter(F.col("__citus_shard") == key).drop(
            "__citus_shard"
        ).createOrReplaceTempView(view)
        try:
            # literal token replacement (the reference substitutes the
            # shard relation name the same way) — Python %-formatting
            # would choke on any other % in the command
            rows.append(
                (int(sid), True,
                 _first_cell(sess.sql(command.replace("%s", view))))
            )
        except Exception as exc:
            rows.append((int(sid), False, str(exc)[:200]))
        finally:
            sess.spark.catalog.dropTempView(view)
    return sess.spark.createDataFrame(
        rows, "shardid long, success boolean, result string"
    )


def _run_agg_on_shards(sess, labeled, shard_keys, m) -> DataFrame:
    """One grouped pass for the aggregate fast path. Empty shards get
    the same cell the serial loop's per-shard query would produce
    (count → 0, every other aggregate → NULL → '')."""
    agg, arg = m.group("agg").lower(), m.group("arg")
    body = labeled
    if m.group("where"):
        body = body.filter(m.group("where"))
    from pyspark.sql import functions as F

    col = F.lit(1) if arg == "*" else F.col(arg)
    fn = {
        "count": F.count, "sum": F.sum, "min": F.min,
        "max": F.max, "avg": F.avg,
    }[agg]
    got = {
        r["__citus_shard"]: r["__v"]
        for r in body.groupBy("__citus_shard")
        .agg(fn(col).alias("__v"))
        .collect()
    }
    empty = "0" if agg == "count" else ""
    rows = [
        (
            int(sid), True,
            empty if key not in got or got[key] is None else str(got[key]),
        )
        for sid, key in shard_keys
    ]
    return sess.spark.createDataFrame(
        rows, "shardid long, success boolean, result string"
    )


# ------------------------------------------------------------- scalars
def citus_backend_gpid(sess) -> int:
    return 0 * GPID_NODE_MULT + os.getpid()


def citus_calculate_gpid(sess, nodeid: int, pid: int) -> int:
    for n in getattr(sess, "_nodes", []) or []:
        if int(n["nodeid"]) == int(nodeid):
            return int(n["groupid"]) * GPID_NODE_MULT + int(pid)
    raise ValueError(f"node {nodeid} does not exist")


def citus_nodename_for_nodeid(sess, nodeid: int) -> str | None:
    for n in getattr(sess, "_nodes", []) or []:
        if int(n["nodeid"]) == int(nodeid):
            return n["nodename"]
    return None


def citus_nodeport_for_nodeid(sess, nodeid: int) -> int | None:
    for n in getattr(sess, "_nodes", []) or []:
        if int(n["nodeid"]) == int(nodeid):
            return int(n["nodeport"])
    return None


def citus_coordinator_nodeid(sess) -> int:
    for n in getattr(sess, "_nodes", []) or []:
        if n.get("groupid") == 0:
            return int(n["nodeid"])
    return 0


def citus_server_id(sess) -> str:
    """Stable per-deployment UUID (uuid5 of the Spark application id —
    re-derivable, no RNG)."""
    import uuid

    app = sess.spark.sparkContext.applicationId
    return str(uuid.uuid5(uuid.NAMESPACE_URL, f"citus_spark:{app}"))


# ----------------------------------------------------------- DDL events
def master_get_table_ddl_events(sess, table: str) -> list[str]:
    df = sess.spark.table(table)
    cols = ", ".join(f"{c} {t}" for c, t in df.dtypes)
    out = [f"CREATE TABLE {table} ({cols})"]
    t = sess.catalog.get(table)
    if t is not None and t.is_hash_distributed:
        out.append(
            f"SELECT create_distributed_table('{table}', "
            f"'{t.dist_col}', shard_count => {t.buckets})"
        )
    elif t is not None and t.is_reference:
        out.append(f"SELECT create_reference_table('{table}')")
    return out


def citus_check_cluster_node_health(sess) -> DataFrame:
    nodes = [_coordinator_addr(sess)] + [
        (n["nodename"], int(n["nodeport"]))
        for n in _worker_nodes(sess, only_should_have=False)
    ]
    rows = [
        (a[0], a[1], b[0], b[1], True) for a in nodes for b in nodes
    ]
    return sess.spark.createDataFrame(
        rows,
        "from_nodename string, from_nodeport int, to_nodename string, "
        "to_nodeport int, result boolean",
    )


# ------------------------------------------------------------ shard split
def citus_split_shard_by_split_points(
    sess,
    shard_id: int,
    split_points,
    node_ids=None,
    shard_transfer_mode: str | None = None,
) -> list[int]:
    """↔ reference citus_split_shard_by_split_points
    (operations/citus_split_shard_by_split_points.c:31 →
    shard_split.c SplitShard): split one shard's hash range at
    explicit split points into len(points)+1 children, cascading over
    the WHOLE colocation group (the reference splits
    sourceColocatedShardIntervalList together so colocated joins stay
    shard-local).

    Spark analog: each member table's storage is rewritten
    partitioned by the generalized shard label — rows of the split
    bucket land in the child directory whose sub-range holds their
    int32 hash; every other bucket keeps its ``b<k>`` directory. The
    parent shard id stops existing (citus_shards / pg_dist_shard show
    the children with their sub-ranges), and
    get_shard_id_for_distribution_column resolves to the child. With
    `node_ids`, each child's placement is pinned to that node's group
    (placement metadata — Spark's scheduler owns physical task
    placement, same caveat as citus_move_shard_placement). Returns
    the new shard ids for the shard's own table.

    DOCUMENTED DIVERGENCE from the reference's range model: this
    engine places rows by pmod(hash, buckets), so one bucket's rows
    span the ENTIRE int32 hash domain — not the contiguous interval
    the reference's range-placement gives a shard. Split points are
    therefore judged over the full int32 domain (the child ranges
    published in pg_dist_shard are the REAL routing bounds), and a
    point anywhere in int32 is valid. A script carrying points from a
    reference cluster still partitions correctly — the decision rule
    (hash ≤ point → earlier child) is the reference's — but the row
    balance across children differs because the underlying placement
    function does.

    shard_transfer_mode is accepted for signature parity; both
    reference modes end in the same rewritten layout here.
    """
    table, label = _shard_key(sess, int(shard_id))
    if not label.startswith("b"):
        raise ValueError(
            f"cannot split shard {shard_id}: only hash-range bucket "
            "shards are splittable (isolated-tenant and already-split "
            "child shards are not)"
        )
    t = sess.catalog.get(table)
    b = int(label[1:])
    lo, hi = -(1 << 31), (1 << 31) - 1
    try:
        points = sorted(int(p) for p in split_points)
    except (TypeError, ValueError) as exc:
        raise ValueError(
            f"invalid split points {split_points!r}: must be integers"
        ) from exc
    if not points:
        raise ValueError("citus_split_shard_by_split_points: no split points")
    if len(set(points)) != len(points):
        raise ValueError(f"duplicate split points in {points!r}")
    for p in points:
        if not (lo <= p < hi):
            raise ValueError(
                f"split point {p} is outside the int32 hash range "
                f"[{lo}, {hi})"
            )
    if node_ids is not None and len(node_ids) != len(points) + 1:
        raise ValueError(
            f"{len(points) + 1} node ids are required for "
            f"{len(points)} split points, got {len(node_ids)}"
        )
    bounds = [lo] + [p + 1 for p in points] + [hi + 1]
    # resolve node ids BEFORE any table is rewritten — a bad id must
    # veto the whole statement, never leave the colocation group torn
    node_groups: list[int] | None = None
    if node_ids is not None:
        byid = {
            int(n["nodeid"]): n for n in (getattr(sess, "_nodes", []) or [])
        }
        node_groups = []
        for nid in node_ids:
            node = byid.get(int(nid))
            if node is None:
                raise ValueError(f"node {nid} is not in pg_dist_node")
            node_groups.append(int(node["groupid"]))
    group = [
        g
        for g in sess.catalog.tables().values()
        if g.is_hash_distributed and g.colocation_id == t.colocation_id
    ]
    out_ids: list[int] = []
    import shutil
    import tempfile as _tf

    from pyspark.sql import functions as F

    from citus_spark.session import _shard_label

    for g in group:
        if b in (getattr(g, "splits", None) or {}):
            raise ValueError(
                f"shard of bucket {b} on colocated table {g.name!r} is "
                "already split"
            )
    for g in group:
        sess._isolated_shard_seq = getattr(
            sess, "_isolated_shard_seq", 104000
        ) + len(bounds) - 1
        first = sess._isolated_shard_seq - (len(bounds) - 2)
        children = [
            (first + i, bounds[i], bounds[i + 1] - 1)
            for i in range(len(bounds) - 1)
        ]
        splits = dict(getattr(g, "splits", None) or {})
        splits[b] = children
        df = sess.spark.table(g.name)
        cols = df.columns
        lab = _shard_label(
            g.dist_col, g.buckets, getattr(g, "isolated", None) or {},
            splits,
        )
        dest = os.path.join(
            _tf.gettempdir(),
            f"citus_spark_split_{os.getpid()}_{children[0][0]}_{g.name}",
        )
        (
            df.withColumn("__citus_shard", lab)
            .repartition("__citus_shard")
            .write.partitionBy("__citus_shard")
            .mode("overwrite")
            .parquet(dest)
        )
        raw = sess.spark.read.parquet(dest)
        raw.createOrReplaceTempView(f"__{g.name}_shards")
        raw.select(*cols).createOrReplaceTempView(g.name)
        old_path = g.path
        g.path = dest
        g.splits = splits
        # bound disk use: a PREVIOUS isolate/split rewrite's tempdir is
        # no longer referenced by any view — reclaim it. The table's
        # original storage (fixture parquet, CREATE TABLE dir) stays.
        if old_path and os.path.dirname(old_path) == _tf.gettempdir() and (
            os.path.basename(old_path).startswith(
                ("citus_spark_split_", "citus_spark_isolated_")
            )
        ):
            shutil.rmtree(old_path, ignore_errors=True)
        placements = _explicit_placements(sess)
        parent_key = (g.name, f"b{b}")
        if node_groups is not None:
            for (sid, _l, _h), grp in zip(children, node_groups):
                placements[(g.name, f"s{sid}")] = [grp]
            placements.pop(parent_key, None)
        elif parent_key in placements:
            # reference SplitShard keeps children where the source
            # shard lived — an explicit move survives the split
            for sid, _l, _h in children:
                placements[(g.name, f"s{sid}")] = list(
                    placements[parent_key]
                )
            placements.pop(parent_key, None)
        if g.name == table:
            out_ids = [sid for sid, _l, _h in children]
    sess.stat_statements.record(
        f"SELECT citus_split_shard_by_split_points({shard_id}, ...)",
        None, executor="utility",
    )
    return out_ids


# ---------------------------------------------------- rebalance strategies
# ↔ reference pg_dist_rebalance_strategy + citus_add_rebalance_strategy
# (operations/shard_rebalancer.c): named strategies with cost/capacity
# functions and thresholds. The two built-ins translate directly —
# by_shard_count balances row counts, by_disk_size balances bytes.
# CUSTOM strategies (SQL cost functions evaluated per shard) are
# REGISTERED and listed faithfully but rejected loudly at rebalance
# time: evaluating arbitrary per-shard cost SQL is PG-procedural
# machinery this engine does not fake.
_BUILTIN_STRATEGIES = (
    {
        "name": "by_shard_count",
        "default_strategy": True,
        "shard_cost_function": "citus_shard_cost_1",
        "node_capacity_function": "citus_node_capacity_1",
        "shard_allowed_on_node_function": "citus_shard_allowed_on_node_true",
        "default_threshold": 0.0,
        "minimum_threshold": 0.0,
    },
    {
        "name": "by_disk_size",
        "default_strategy": False,
        "shard_cost_function": "citus_shard_cost_by_disk_size",
        "node_capacity_function": "citus_node_capacity_1",
        "shard_allowed_on_node_function": "citus_shard_allowed_on_node_true",
        "default_threshold": 0.1,
        "minimum_threshold": 0.01,
    },
)


def _strategies(sess) -> list[dict]:
    if getattr(sess, "_rebalance_strategies", None) is None:
        sess._rebalance_strategies = [dict(s) for s in _BUILTIN_STRATEGIES]
    return sess._rebalance_strategies


def citus_add_rebalance_strategy(
    sess,
    name: str,
    shard_cost_function: str,
    node_capacity_function: str,
    shard_allowed_on_node_function: str,
    default_threshold: float,
    minimum_threshold: float = 0.0,
) -> None:
    strategies = _strategies(sess)
    if any(s["name"] == name for s in strategies):
        raise ValueError(f'rebalance strategy "{name}" already exists')
    if float(minimum_threshold) > float(default_threshold):
        # the reference's trigger enforces the same invariant
        raise ValueError(
            "default_threshold cannot be smaller than minimum_threshold"
        )
    strategies.append(
        {
            "name": name,
            "default_strategy": False,
            "shard_cost_function": shard_cost_function,
            "node_capacity_function": node_capacity_function,
            "shard_allowed_on_node_function": shard_allowed_on_node_function,
            "default_threshold": float(default_threshold),
            "minimum_threshold": float(minimum_threshold),
        }
    )


def citus_set_default_rebalance_strategy(sess, name: str) -> None:
    strategies = _strategies(sess)
    if not any(s["name"] == name for s in strategies):
        raise ValueError(f'rebalance strategy "{name}" does not exist')
    for s in strategies:
        s["default_strategy"] = s["name"] == name


def default_rebalance_strategy(sess) -> str:
    return next(
        s["name"] for s in _strategies(sess) if s["default_strategy"]
    )


def resolve_rebalance_strategy(sess, name: str | None) -> str:
    """→ the strategy to run with; custom strategies reject loudly."""
    strategies = _strategies(sess)
    chosen = name or default_rebalance_strategy(sess)
    match = next((s for s in strategies if s["name"] == chosen), None)
    if match is None:
        raise ValueError(f'rebalance strategy "{chosen}" does not exist')
    if chosen not in ("by_shard_count", "by_disk_size"):
        raise NotImplementedError(
            f"custom rebalance strategy {chosen!r} is registered but "
            "not executable — its shard-cost SQL would need PG's "
            "procedural evaluation; use by_shard_count or by_disk_size"
        )
    return chosen


def pg_dist_rebalance_strategy_df(sess) -> DataFrame:
    rows = [
        (
            s["name"],
            bool(s["default_strategy"]),
            s["shard_cost_function"],
            s["node_capacity_function"],
            s["shard_allowed_on_node_function"],
            float(s["default_threshold"]),
            float(s["minimum_threshold"]),
        )
        for s in _strategies(sess)
    ]
    return sess.spark.createDataFrame(
        rows,
        "name string, default_strategy boolean, "
        "shard_cost_function string, node_capacity_function string, "
        "shard_allowed_on_node_function string, "
        "default_threshold double, minimum_threshold double",
    )
