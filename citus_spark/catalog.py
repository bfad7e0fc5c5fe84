"""Distribution-metadata catalog.

Mirrors the reference's metadata tables (pg_dist_partition,
pg_dist_shard, pg_dist_colocation — see reference
src/include/distributed/pg_dist_partition.h:22-57 and
pg_dist_colocation.h:19-24) as a small in-memory/JSON catalog.

On Spark we do not track shard placements (the scheduler owns task
placement) or hash ranges per shard (Spark's HashPartitioning owns the
row→partition map). What we keep is exactly the information Spark
cannot infer on its own:

- which column a table is distributed by (the "distribution column"),
- how many buckets/partitions its storage is laid out in,
- which tables are co-located (same column type + same bucket count ⇒
  joins/groupbys on the distribution column need no exchange),
- which tables are reference tables (replicated ⇒ always broadcast).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path

# Distribution methods — reference pg_dist_partition.h:54-57 defines
# append/hash/range/none; we keep hash (the analytical default), range
# (repartitionByRange layouts), and none (reference/replicated tables).
DIST_HASH = "hash"
DIST_RANGE = "range"
DIST_REFERENCE = "reference"
DIST_NONE = "none"  # single-shard / local tables

DEFAULT_SHARD_COUNT = 32  # ↔ citus.shard_count default 32
# (reference src/backend/distributed/shared_library_init.c:2518)


@dataclass
class TableDist:
    """One row of the catalog (↔ one pg_dist_partition entry)."""

    name: str
    method: str = DIST_NONE
    dist_col: str | None = None
    buckets: int = DEFAULT_SHARD_COUNT
    colocation_id: int = 0
    path: str | None = None  # storage location when materialized
    # columnar storage options (↔ reference columnar.options catalog,
    # columnar/columnar_metadata.c) — set via alter_columnar_table_set
    columnar: dict | None = None
    # time-partitioned layout metadata (↔ the reference's timeseries
    # partition bookkeeping) — set via create_time_partitions:
    # {"path", "ts_col", "granularity"}
    time_partitioning: dict | None = None
    # auto-sequence columns (serial / IDENTITY / DEFAULT nextval):
    # {column: sequence_name} — INSERTs that omit the column draw a
    # block from the named session sequence
    identity: dict | None = None
    # table constraints (↔ pg_constraint rows the reference leaves to
    # PostgreSQL + the distribution rules in foreign_constraint.c):
    # {conname: {"kind": "f"|"u"|"p"|"c", "cols", "reftable",
    #            "refcols", "expr", "valid"}} — see plans/constraints.py
    constraints: dict | None = None
    # column DEFAULT expressions recorded at CREATE TABLE / ADD COLUMN
    # time: {column: sql_expr}. Consumed by FK ON DELETE/UPDATE
    # SET DEFAULT (plans/constraints.py); unset columns default to
    # NULL, PG's default-of-defaults.
    defaults: dict | None = None
    # stored generated columns (PG GENERATED ALWAYS AS (expr) STORED):
    # {column: sql_expr}. Recomputed from the row's base columns on
    # every write path; never directly insertable/updatable.
    generated: dict | None = None
    # isolated tenants (↔ reference isolate_tenant_to_new_shard,
    # operations/shard_split.c): {str(tenant_value): shard_id}. The
    # physical layout gives each isolated tenant its own storage
    # partition; single-tenant queries route to it (partition pruning)
    isolated: dict | None = None
    # range-split buckets (↔ reference citus_split_shard_by_split_
    # points, operations/citus_split_shard_by_split_points.c):
    # {bucket: [(child_shard_id, hash_lo, hash_hi), ...]} — the
    # bucket's uniform int32 hash range subdivided at explicit split
    # points; rows route to the child whose range holds their hash
    splits: dict | None = None
    # PG declarative partitioning (↔ reference multi_partitioning.sql;
    # plans/partition_ddl.py). On a partitioned parent:
    # partition_by = {"method": "range"|"list"|"hash", "col": name}
    # and partitions = {child_table: bound_dict}. On a child:
    # partition_parent = parent table name.
    partition_by: dict | None = None
    partitions: dict | None = None
    partition_parent: str | None = None
    # enum-typed columns (plans/type_sql.py): {column: type_name} —
    # lets ALTER TYPE ADD/RENAME VALUE find the auto CHECK constraints
    # and stored labels that must follow the type
    enum_cols: dict | None = None

    @property
    def is_reference(self) -> bool:
        return self.method == DIST_REFERENCE

    @property
    def is_hash_distributed(self) -> bool:
        return self.method == DIST_HASH


class DistCatalog:
    """In-memory catalog with optional JSON persistence.

    Colocation rule (↔ reference pg_dist_colocation.h: same shardcount +
    same distribution column type ⇒ candidate colocation group): here a
    colocation group is explicit — `colocate_with=` assigns the new
    table the existing table's group id, and we verify bucket counts
    match, which is the property Spark's EnsureRequirements needs to
    elide the exchange.
    """

    def __init__(self) -> None:
        self._tables: dict[str, TableDist] = {}
        self._next_colocation_id = 1

    def register(
        self,
        name: str,
        method: str,
        dist_col: str | None = None,
        buckets: int = DEFAULT_SHARD_COUNT,
        colocate_with: str | None = None,
        path: str | None = None,
    ) -> TableDist:
        if method == DIST_HASH and not dist_col:
            raise ValueError(f"hash-distributed table {name!r} needs a dist_col")
        if colocate_with is not None:
            other = self._tables[colocate_with]
            if other.buckets != buckets:
                raise ValueError(
                    f"cannot colocate {name!r} ({buckets} buckets) with "
                    f"{colocate_with!r} ({other.buckets} buckets)"
                )
            colocation_id = other.colocation_id
        elif method == DIST_HASH:
            colocation_id = self._next_colocation_id
            self._next_colocation_id += 1
        else:
            colocation_id = 0
        entry = TableDist(
            name=name,
            method=method,
            dist_col=dist_col,
            buckets=buckets,
            colocation_id=colocation_id,
            path=path,
        )
        self._tables[name] = entry
        return entry

    def get(self, name: str) -> TableDist | None:
        return self._tables.get(name)

    def unregister(self, name: str) -> None:
        """Retire a table (↔ DROP TABLE on a Citus table removing its
        pg_dist_partition row)."""
        self._tables.pop(name, None)

    def __contains__(self, name: str) -> bool:
        return name in self._tables

    def tables(self) -> dict[str, TableDist]:
        return dict(self._tables)

    def colocated(self, a: str, b: str) -> bool:
        """True iff joins between a and b on their distribution columns
        need no repartition (same colocation group)."""
        ta, tb = self._tables.get(a), self._tables.get(b)
        if ta is None or tb is None:
            return False
        if ta.is_reference or tb.is_reference:
            return True  # reference tables join co-locally with anything
        return (
            ta.is_hash_distributed
            and tb.is_hash_distributed
            and ta.colocation_id == tb.colocation_id
        )

    # --- persistence -------------------------------------------------
    def save(self, path: str | Path) -> None:
        data = {
            "next_colocation_id": self._next_colocation_id,
            "tables": {k: asdict(v) for k, v in self._tables.items()},
        }
        Path(path).write_text(json.dumps(data, indent=2))

    @classmethod
    def load(cls, path: str | Path) -> "DistCatalog":
        cat = cls()
        data = json.loads(Path(path).read_text())
        cat._next_colocation_id = data.get("next_colocation_id", 1)
        for k, v in data.get("tables", {}).items():
            cat._tables[k] = TableDist(**v)
        return cat
