"""Table constraints: FK / UNIQUE / PRIMARY KEY / CHECK / EXCLUDE.

↔ reference src/backend/distributed/commands/foreign_constraint.c
(ErrorIfUnsupportedForeignConstraintExists) and the
multi_alter_table_statements / multi_foreign_key regress suites.

The reference delegates row-level enforcement to PostgreSQL and adds
one layer of its own: DISTRIBUTION rules — which constraint shapes are
expressible on sharded tables at all. We reproduce both layers:

- distribution rules fire at ADD CONSTRAINT time with the reference's
  error shapes (unique keys must cover the distribution column;
  foreign keys are legal only between colocated distributed tables on
  the distribution column at the same ordinal, or from a distributed
  table to a reference table — never FROM a reference/local table TO
  a distributed one);
- data validation runs as distributed Spark jobs (anti-join for FK,
  two-phase groupBy for UNIQUE, a filter count for CHECK) — never a
  driver-side scan, so the same statements hold at cluster scale;
- write-path enforcement re-checks new rows on INSERT, the new image
  on UPDATE, and inbound foreign keys on DELETE/UPDATE-of-key, with
  PG's runtime error messages (distinct from the ALTER-time ones).

Constraint state lives on the catalog entry (TableDist.constraints):
    {name: {"kind": "f"|"u"|"p"|"c"|"x", "cols": [...], "reftable": str,
            "refcols": [...], "expr": str, "ops": [...], "valid": bool}}
EXCLUDE (kind "x", ↔ reference commands/table.c:3430 distribution
rule) stores parallel cols/ops lists; supported element operators are
'=' and '&&' (array overlap), validated by a pair-counting self-join
keyed on the '=' elements (co-located when they include the
distribution column, which the rule mandates on hash tables).
NOT VALID constraints skip existing-row validation (valid=False) but
are still enforced for new writes, exactly like PostgreSQL; VALIDATE
CONSTRAINT runs the deferred scan and flips the flag.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FK_DETAIL = (
    "Foreign keys are supported in two cases, either in between two "
    "colocated tables including partition column in the same ordinal "
    "in the both tables or from distributed to reference tables"
)


def _store(entry) -> dict:
    if entry.constraints is None:
        entry.constraints = {}
    return entry.constraints


def _null_safe_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """FK MATCH SIMPLE: rows with ANY NULL key column always pass."""
    out = df
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def _fk_violations(
    child: DataFrame,
    cols: list[str],
    parent: DataFrame,
    refcols: list[str],
    broadcast_parent: bool,
) -> int:
    keys = parent.select(
        *[F.col(rc).alias(c) for c, rc in zip(cols, refcols)]
    ).dropDuplicates()
    if broadcast_parent:
        keys = F.broadcast(keys)
    return (
        _null_safe_rows(child, cols)
        .select(*cols)
        .join(keys, on=cols, how="left_anti")
        .limit(1)
        .count()
    )


def _unique_violations(df: DataFrame, cols: list[str]) -> int:
    # NULLs never conflict under UNIQUE (PG default NULLS DISTINCT)
    return (
        _null_safe_rows(df, cols)
        .groupBy(*cols)
        .count()
        .filter("count > 1")
        .limit(1)
        .count()
    )


def _exclude_violations(
    df: DataFrame,
    cols: list[str],
    ops: list[str],
    delta: DataFrame | None = None,
) -> int:
    """EXCLUDE (c1 WITH op1, c2 WITH op2, ...): no two distinct rows
    may satisfy EVERY element's operator pairwise. Supported ops:
    '=' (equality) and '&&' (array overlap).

    With `delta` (a subset of df — the rows this statement added or
    changed), only pairs INVOLVING a delta row count: PG's index-based
    enforcement likewise checks each written row against the table,
    so pre-existing conflicts under a NOT VALID constraint never
    block unrelated writes — and the join is |delta| × |df| instead
    of |df|², the write-path cost PG pays too.

    Scale shape: rows that cannot conflict with anything (a NULL in
    an '=' element, or an '&&' array with no non-null member — the
    operator returns NULL/false against every row, SQL 3-valued
    logic, same as PG) are filtered first; the rest join with the
    '=' elements as the equi-key (the distribution rule below
    guarantees the distribution column is one of them on hash tables,
    so the join is co-located) and '&&' as a post-join predicate.
    Every surviving left row pairs with itself on the right, so a
    violation exists iff pair_count > left_count — no row-id needed,
    order-free, and exact under any partitioning."""

    def live(d: DataFrame) -> DataFrame:
        for c, op in zip(cols, ops):
            if op == "=":
                d = d.filter(F.col(c).isNotNull())
            else:
                d = d.filter(F.expr(f"arrays_overlap({c}, {c})"))
        return d.select(*cols)

    lhs = live(delta if delta is not None else df)
    n = lhs.count()
    if n == 0:
        return 0
    left = lhs.alias("__xl")
    right = live(df).alias("__xr")
    cond = None
    for c, op in zip(cols, ops):
        if op == "=":
            pc = F.col(f"__xl.{c}") == F.col(f"__xr.{c}")
        else:
            pc = F.expr(f"arrays_overlap(__xl.{c}, __xr.{c})")
        cond = pc if cond is None else cond & pc
    pairs = left.join(right, cond, "inner").count()
    return 1 if pairs > n else 0


def _distribution_rules_exclude(
    session, table: str, cols: list[str], ops: list[str]
):
    """↔ reference commands/table.c:3430
    (ErrorIfUnsupportedConstraint): a distributed table's EXCLUDE
    constraint must contain the partition column with an equality
    operator — overlapping shards cannot enforce exclusion across
    placements otherwise."""
    entry = session.catalog.get(table)
    if entry is not None and entry.is_hash_distributed:
        eq_cols = [c for c, op in zip(cols, ops) if op == "="]
        if entry.dist_col not in eq_cols:
            raise ValueError(
                f'cannot create constraint on "{table}"\n'
                "DETAIL: Distributed relations cannot have UNIQUE, "
                "EXCLUDE, or PRIMARY KEY constraints that do not "
                "include the partition column (with an equality "
                "operator if EXCLUDE)."
            )


def _check_violations(df: DataFrame, expr: str) -> int:
    # a NULL check result passes (violation == expr IS FALSE)
    return (
        df.filter(F.expr(f"NOT coalesce(({expr}), true)"))
        .limit(1)
        .count()
    )


def _distribution_rules_unique(session, table: str, cols: list[str]):
    entry = session.catalog.get(table)
    if entry is not None and entry.is_hash_distributed:
        if entry.dist_col not in cols:
            raise ValueError(
                f'cannot create constraint on "{table}"\n'
                "DETAIL: Distributed relations cannot have UNIQUE, "
                "EXCLUDE, or PRIMARY KEY constraints that do not "
                "include the partition column (with an equality "
                "operator if EXCLUDE)."
            )


def _distribution_rules_fk(
    session, table: str, cols: list[str], reftable: str, refcols: list[str]
):
    child = session.catalog.get(table)
    parent = session.catalog.get(reftable)
    child_hash = child is not None and child.is_hash_distributed
    parent_hash = parent is not None and parent.is_hash_distributed
    if parent_hash and not child_hash:
        raise ValueError(
            "cannot create foreign key constraint since foreign keys "
            "from reference tables and local tables to distributed "
            "tables are not supported"
        )
    if child_hash and not parent_hash and not (
        parent is not None and parent.is_reference
    ):
        raise ValueError(
            "cannot create foreign key constraint since foreign keys "
            "from distributed tables to local tables are not supported"
        )
    if child_hash and parent_hash:
        colocated = session.catalog.colocated(table, reftable)
        try:
            same_ordinal = cols.index(child.dist_col) == refcols.index(
                parent.dist_col
            )
        except ValueError:
            same_ordinal = False
        if not (colocated and same_ordinal):
            raise ValueError(
                f"cannot create foreign key constraint\nDETAIL: {_FK_DETAIL}"
            )
    if child_hash and parent is not None and parent.is_reference:
        pass  # distributed → reference: always legal


def _resolve_refcols(session, reftable: str, refcols: list[str] | None):
    """Omitted column list → the referenced table's PRIMARY KEY;
    explicit lists must match a recorded UNIQUE/PK (PG's rule)."""
    pentry = session.catalog.get(reftable)
    if pentry is None:
        raise ValueError(f'relation "{reftable}" does not exist')
    cons = pentry.constraints or {}
    if refcols is None:
        pks = [c for c in cons.values() if c["kind"] == "p"]
        if not pks:
            raise ValueError(
                f'there is no unique constraint matching given keys '
                f'for referenced table "{reftable}"'
            )
        return pentry, list(pks[0]["cols"])
    if not any(
        c["kind"] in ("p", "u") and sorted(c["cols"]) == sorted(refcols)
        for c in cons.values()
    ):
        raise ValueError(
            f'there is no unique constraint matching given keys '
            f'for referenced table "{reftable}"'
        )
    return pentry, refcols


def _distribution_rules_fk_actions(
    session, table: str, cols: list[str], on_delete: str, on_update: str
):
    """↔ reference foreign_constraint.c
    ErrorIfUnsupportedForeignConstraintExists: referential actions
    that would rewrite the distribution key of a sharded child are
    rejected — SET NULL / SET DEFAULT on delete, and CASCADE /
    SET NULL / SET DEFAULT on update, when the distribution column is
    in the foreign key column list (the rewritten row would belong on
    a different shard)."""
    child = session.catalog.get(table)
    if child is None or not child.is_hash_distributed:
        return
    if child.dist_col not in cols:
        return
    if on_delete in ("n", "d"):
        raise ValueError(
            "cannot create foreign key constraint\n"
            "DETAIL: SET NULL or SET DEFAULT is not supported in ON "
            "DELETE operation when distribution key is included in "
            "the foreign key column list"
        )
    if on_update in ("c", "n", "d"):
        raise ValueError(
            "cannot create foreign key constraint\n"
            "DETAIL: CASCADE, SET NULL or SET DEFAULT is not supported "
            "in ON UPDATE operation when distribution key is included "
            "in the foreign key column list"
        )


def apply_alter(
    session, entry, table: str, op: tuple, assume_empty: bool = False
) -> str | None:
    """Execute one parsed constraint action; returns a status tag or
    None when `op` is not a constraint action. assume_empty skips the
    existing-row scans (CREATE TABLE inline constraints — the relation
    was just materialized empty); metadata rules still apply."""
    kind = op[0]
    if kind == "add_fk":
        _, conname, cols, reftable, refcols, not_valid = op[:6]
        on_delete, on_update = (op[6], op[7]) if len(op) > 6 else ("a", "a")
        if conname in _store(entry):
            raise ValueError(
                f'constraint "{conname}" for relation "{table}" '
                "already exists"
            )
        missing = [
            c for c in cols if c not in session._live_read(entry).columns
        ]
        if missing:
            raise ValueError(
                f'column "{missing[0]}" referenced in foreign key '
                "constraint does not exist"
            )
        pentry, refcols = _resolve_refcols(session, reftable, refcols)
        if len(cols) != len(refcols):
            raise ValueError(
                "number of referencing and referenced columns for "
                "foreign key disagree"
            )
        _distribution_rules_fk(session, table, cols, reftable, refcols)
        _distribution_rules_fk_actions(
            session, table, cols, on_delete, on_update
        )
        spec = {
            "kind": "f",
            "cols": cols,
            "reftable": reftable,
            "refcols": refcols,
            "valid": not not_valid,
            # PG confdeltype/confupdtype codes: a=NO ACTION,
            # r=RESTRICT, c=CASCADE, n=SET NULL, d=SET DEFAULT
            "on_delete": on_delete,
            "on_update": on_update,
        }
        if not not_valid and not assume_empty:
            n = _fk_violations(
                session._live_read(entry),
                cols,
                session._live_read(pentry),
                refcols,
                broadcast_parent=pentry.is_reference,
            )
            if n:
                raise ValueError(
                    f'insert or update on table "{table}" violates '
                    f'foreign key constraint "{conname}"'
                )
        _store(entry)[conname] = spec
        return "ALTER TABLE"
    if kind == "add_unique":
        _, conname, ckind, cols = op
        if conname in _store(entry):
            raise ValueError(
                f'constraint "{conname}" for relation "{table}" '
                "already exists"
            )
        _distribution_rules_unique(session, table, cols)
        cur = session._live_read(entry)
        missing = [c for c in cols if c not in cur.columns]
        if missing:
            raise ValueError(
                f'column "{missing[0]}" named in key does not exist'
            )
        if not assume_empty:
            if ckind == "p":
                nullable = cur
                for c in cols:
                    nullable = nullable.filter(F.col(c).isNotNull())
                # PG: PK implies NOT NULL on every key column
                if cur.count() != nullable.count():
                    raise ValueError(
                        f'column "{cols[0]}" of relation "{table}" '
                        "contains null values"
                    )
            if _unique_violations(cur, cols):
                raise ValueError(
                    f'could not create unique index "{conname}"'
                )
        _store(entry)[conname] = {"kind": ckind, "cols": cols, "valid": True}
        return "ALTER TABLE"
    if kind == "add_exclude":
        _, conname, method, elems, not_valid = op
        if conname in _store(entry):
            raise ValueError(
                f'constraint "{conname}" for relation "{table}" '
                "already exists"
            )
        cols = [c for c, _o in elems]
        ops = [o for _c, o in elems]
        cur = session._live_read(entry)
        missing = [c for c in cols if c not in cur.columns]
        if missing:
            raise ValueError(
                f'column "{missing[0]}" named in key does not exist'
            )
        for c, o in elems:
            if o == "&&" and not str(cur.schema[c].dataType).startswith(
                "ArrayType"
            ):
                raise ValueError(
                    f'EXCLUDE element "{c} WITH &&" requires an array '
                    f"column; {c} is {cur.schema[c].dataType.simpleString()}"
                )
        _distribution_rules_exclude(session, table, cols, ops)
        if not not_valid and not assume_empty:
            if _exclude_violations(cur, cols, ops):
                raise ValueError(
                    f'could not create exclusion constraint "{conname}"\n'
                    f'DETAIL: Key conflicts exist in relation "{table}"'
                )
        _store(entry)[conname] = {
            "kind": "x",
            "cols": cols,
            "ops": ops,
            "method": method,
            "valid": not not_valid,
        }
        return "ALTER TABLE"
    if kind == "add_check":
        _, conname, expr, not_valid = op
        if conname in _store(entry):
            raise ValueError(
                f'constraint "{conname}" for relation "{table}" '
                "already exists"
            )
        # analyze the expression against the relation even when the
        # scan is skipped — a typo'd column must fail HERE with a
        # clear message, not inside the next INSERT's enforcement
        try:
            session._live_read(entry).filter(
                F.expr(f"NOT coalesce(({expr}), true)")
            )
        except Exception as e:
            raise ValueError(
                f"CHECK expression {expr!r} does not resolve against "
                f'"{table}": {e}'
            ) from e
        if not not_valid and not assume_empty:
            if _check_violations(session._live_read(entry), expr):
                raise ValueError(
                    f'check constraint "{conname}" of relation '
                    f'"{table}" is violated by some row'
                )
        _store(entry)[conname] = {
            "kind": "c",
            "expr": expr,
            "valid": not not_valid,
        }
        return "ALTER TABLE"
    if kind == "drop_constraint":
        _, conname, if_exists = op
        if conname not in (entry.constraints or {}):
            if if_exists:
                return "ALTER TABLE (constraint did not exist, skipping)"
            raise ValueError(
                f'constraint "{conname}" of relation "{table}" '
                "does not exist"
            )
        # a UNIQUE/PK another table's FK points at cannot be dropped
        spec = entry.constraints[conname]
        if spec["kind"] in ("p", "u"):
            for other, oentry in session.catalog.tables().items():
                for oc, ospec in (oentry.constraints or {}).items():
                    if (
                        ospec["kind"] == "f"
                        and ospec["reftable"] == table
                        and sorted(ospec["refcols"]) == sorted(spec["cols"])
                    ):
                        raise ValueError(
                            f'cannot drop constraint {conname} on table '
                            f'{table} because constraint {oc} on table '
                            f"{other} depends on it"
                        )
        del entry.constraints[conname]
        return "ALTER TABLE"
    if kind == "validate_constraint":
        _, conname = op
        spec = (entry.constraints or {}).get(conname)
        if spec is None:
            raise ValueError(
                f'constraint "{conname}" of relation "{table}" '
                "does not exist"
            )
        if not spec["valid"]:
            if spec["kind"] == "f":
                pentry = session.catalog.get(spec["reftable"])
                n = _fk_violations(
                    session._live_read(entry),
                    spec["cols"],
                    session._live_read(pentry),
                    spec["refcols"],
                    broadcast_parent=pentry.is_reference,
                )
                if n:
                    raise ValueError(
                        f'insert or update on table "{table}" violates '
                        f'foreign key constraint "{conname}"'
                    )
            elif spec["kind"] == "c":
                if _check_violations(
                    session._live_read(entry), spec["expr"]
                ):
                    raise ValueError(
                        f'check constraint "{conname}" of relation '
                        f'"{table}" is violated by some row'
                    )
            elif spec["kind"] == "x":
                if _exclude_violations(
                    session._live_read(entry), spec["cols"], spec["ops"]
                ):
                    raise ValueError(
                        f'could not validate exclusion constraint '
                        f'"{conname}"\nDETAIL: Key conflicts exist in '
                        f'relation "{table}"'
                    )
            spec["valid"] = True
        return "ALTER TABLE"
    return None


# --- write-path enforcement -------------------------------------------------


def enforce_insert(
    session, entry, table: str, new_rows: DataFrame,
    arbiter_cols: list[str] | None = None,
) -> None:
    """Re-check every constraint against rows about to be appended.
    CHECK/FK look at the new rows only; UNIQUE needs new-vs-existing
    plus new-vs-new. Under ON CONFLICT (arbiter_cols set) only CHECK
    and PK-not-null run here — PG evaluates those on every candidate
    tuple BEFORE arbiter detection, while FK and unique judgments
    belong to the post-merge state (conflicting rows merge instead of
    inserting), which enforce_full_image on the merged image covers.
    A self-referential FK sees existing ∪ new parents (PG checks at
    end of statement, so a row may reference a sibling from the same
    INSERT). NOT VALID constraints still apply (PG enforces them for
    new writes — only the existing-row scan was deferred)."""
    on_conflict = arbiter_cols is not None
    for conname, spec in (entry.constraints or {}).items():
        if spec["kind"] == "c":
            if _check_violations(new_rows, spec["expr"]):
                raise ValueError(
                    f'new row for relation "{table}" violates check '
                    f'constraint "{conname}"'
                )
        elif spec["kind"] == "f":
            if on_conflict:
                continue  # post-merge image judged by the caller
            pentry = session.catalog.get(spec["reftable"])
            if pentry is None:
                continue
            parent = session._live_read(pentry)
            if spec["reftable"] == table:
                parent = parent.select(*new_rows.columns).unionByName(
                    new_rows
                )
            if _fk_violations(
                new_rows,
                spec["cols"],
                parent,
                spec["refcols"],
                broadcast_parent=pentry.is_reference,
            ):
                raise ValueError(
                    f'insert or update on table "{table}" violates '
                    f'foreign key constraint "{conname}"'
                )
        elif spec["kind"] in ("p", "u"):
            cols = spec["cols"]
            if spec["kind"] == "p":
                nn = _null_safe_rows(new_rows, cols)
                if new_rows.count() != nn.count():
                    raise ValueError(
                        f'null value in column "{cols[0]}" of relation '
                        f'"{table}" violates not-null constraint'
                    )
            if on_conflict:
                continue  # post-merge image judged by the caller
            combined = session._live_read(entry).select(*cols).unionByName(
                new_rows.select(*cols)
            )
            if _unique_violations(combined, cols):
                raise ValueError(
                    f"duplicate key value violates unique constraint "
                    f'"{conname}"'
                )
        elif spec["kind"] == "x":
            if on_conflict:
                continue  # post-merge image judged by the caller
            cols = spec["cols"]
            combined = session._live_read(entry).select(*cols).unionByName(
                new_rows.select(*cols)
            )
            # delta = the inserted rows: only pairs involving them
            # count (pre-existing NOT VALID conflicts never block an
            # unrelated insert, and the join is |new| × |table|)
            if _exclude_violations(
                combined, cols, spec["ops"], delta=new_rows.select(*cols)
            ):
                raise ValueError(
                    "conflicting key value violates exclusion "
                    f'constraint "{conname}"'
                )


def enforce_update(
    session, entry, table: str, new_image: DataFrame, assigned: list[str],
    post_image: DataFrame | None = None,
) -> None:
    """CHECK constraints re-judge the updated image; FK re-checks only
    when an FK column was assigned (a self-referential FK judges
    against the FULL post-update image — PG checks end-of-statement
    state); PK key columns may not become NULL."""
    touched = set(assigned)
    for conname, spec in (entry.constraints or {}).items():
        if spec["kind"] == "c":
            if _check_violations(new_image, spec["expr"]):
                raise ValueError(
                    f'new row for relation "{table}" violates check '
                    f'constraint "{conname}"'
                )
        elif spec["kind"] == "f" and touched & set(spec["cols"]):
            pentry = session.catalog.get(spec["reftable"])
            if pentry is None:
                continue
            parent = (
                post_image
                if spec["reftable"] == table and post_image is not None
                else session._live_read(pentry)
            )
            if _fk_violations(
                new_image,
                spec["cols"],
                parent,
                spec["refcols"],
                broadcast_parent=pentry.is_reference,
            ):
                raise ValueError(
                    f'insert or update on table "{table}" violates '
                    f'foreign key constraint "{conname}"'
                )
        elif spec["kind"] == "p" and touched & set(spec["cols"]):
            nn = _null_safe_rows(new_image, spec["cols"])
            if new_image.count() != nn.count():
                raise ValueError(
                    f'null value in column "{spec["cols"][0]}" of '
                    f'relation "{table}" violates not-null constraint'
                )


def enforce_unique_post_update(
    session, entry, table: str, full_result: DataFrame, assigned: list[str],
    changed: DataFrame | None = None,
) -> None:
    """`changed` = the post-update image of the affected rows (a
    subset of full_result); when given, exclusion checks judge only
    pairs involving a changed row — PG's per-written-row enforcement,
    which keeps pre-existing NOT VALID conflicts from blocking
    unrelated updates."""
    touched = set(assigned)
    for conname, spec in (entry.constraints or {}).items():
        if spec["kind"] in ("p", "u") and touched & set(spec["cols"]):
            if _unique_violations(full_result, spec["cols"]):
                raise ValueError(
                    f"duplicate key value violates unique constraint "
                    f'"{conname}"'
                )
        elif spec["kind"] == "x" and touched & set(spec["cols"]):
            if _exclude_violations(
                full_result, spec["cols"], spec["ops"],
                delta=changed.select(*spec["cols"])
                if changed is not None
                else None,
            ):
                raise ValueError(
                    "conflicting key value violates exclusion "
                    f'constraint "{conname}"'
                )


def _inbound_fks(session, table: str, include_self: bool = True):
    for other, oentry in session.catalog.tables().items():
        if not include_self and other == table:
            continue
        for oc, ospec in (oentry.constraints or {}).items():
            if ospec["kind"] == "f" and ospec["reftable"] == table:
                yield other, oentry, oc, ospec


def enforce_delete(
    session, entry, table: str, remaining: DataFrame
) -> None:
    """RESTRICT / NO ACTION semantics for inbound foreign keys: after
    the delete (or a key-column update), every child row must still
    find its parent among the REMAINING rows. A self-referential FK's
    child side is ALSO the post-statement image (PG checks
    end-of-statement state — the pre-delete table would veto deleting
    a parent and its children together). This is the fast path for
    statements with no cascading actions; when any inbound FK carries
    CASCADE / SET NULL / SET DEFAULT, _dml_finish routes through
    propagate_referential_actions instead."""
    for other, oentry, oc, ospec in _inbound_fks(session, table):
        child = (
            remaining if other == table else session._live_read(oentry)
        )
        if _fk_violations(
            child,
            ospec["cols"],
            remaining,
            ospec["refcols"],
            broadcast_parent=entry.is_reference,
        ):
            raise ValueError(
                f'update or delete on table "{table}" violates foreign '
                f'key constraint "{oc}" on table "{other}"'
            )


# --- referential actions: ON DELETE / ON UPDATE cascades ---------------------
#
# ↔ reference src/backend/distributed/commands/foreign_constraint.c —
# the reference inherits row-level CASCADE / SET NULL / SET DEFAULT
# execution from PostgreSQL and only layers distribution rules on top.
# Here the actions execute as ordered dependent copy-on-write rewrites:
# a statement that shrinks (DELETE) or re-keys (UPDATE) a parent tells
# every dependent child to delete / null / default its orphaned rows,
# recursively through the constraint graph (semi-naive: each wave only
# propagates keys that actually changed, so self-referential CASCADE
# chains converge like the reference's recursive triggers). All
# violation checks and cascade images are computed as distributed
# Spark jobs BEFORE any table is rewritten — validation failures leave
# every table untouched.


def _gone_keys(p_old: DataFrame, p_new: DataFrame, refcols: list[str]):
    """Referenced keys present before the statement but not after."""
    return (
        _null_safe_rows(p_old, refcols).select(*refcols).dropDuplicates()
        .subtract(
            _null_safe_rows(p_new, refcols).select(*refcols).dropDuplicates()
        )
    )


def _fk_fills(centry, child_df: DataFrame, cols: list[str], act: str):
    """SET NULL → typed NULLs; SET DEFAULT → the column DEFAULT
    (recorded at CREATE TABLE / ADD COLUMN time; PG's default-of-
    defaults is NULL)."""
    fills = {}
    defaults = getattr(centry, "defaults", None) or {}
    for c in cols:
        dtype = child_df.schema[c].dataType
        if act == "d" and defaults.get(c) is not None:
            fills[c] = F.expr(defaults[c]).cast(dtype)
        else:
            fills[c] = F.lit(None).cast(dtype)
    return fills


_MARK = "__citus_ref_hit"


def propagate_referential_actions(
    session, root: str, root_old: DataFrame, root_new: DataFrame,
    root_pairs: DataFrame | None,
):
    """Compute the final image of every table changed by referential
    actions when `root` goes from root_old to root_new.

    root_pairs is None for a DELETE-shaped change (rows vanished); for
    an UPDATE-shaped change it is a DataFrame of the affected rows
    with old__<col> / new__<col> for every column (the key remap).

    Returns {table: final_image}. Raises (before anything is written)
    when a NO ACTION / RESTRICT foreign key, a CHECK constraint, a PK
    not-null, or a UNIQUE key is violated by the end-of-statement
    state — PG judges NO ACTION and cascade side effects against the
    final state too."""
    images: dict[str, DataFrame] = {root: root_new}
    fill_touched: dict[str, set] = {}
    queue: list[tuple] = [(root, root_old, root_new, root_pairs)]
    # pop-count backstop, far above any real schema: each pop is one
    # (parent-version) step, so even a 1000-level self-referential
    # CASCADE chain stays under it; a genuine non-converging cycle
    # (possible only through a bug — cascade deletes strictly shrink)
    # hits it instead of looping forever
    pops = 0
    while queue:
        pops += 1
        if pops > 10_000:
            raise ValueError(
                "foreign key cascade did not converge after 10000 "
                "propagation steps — referential action cycle?"
            )
        parent, p_old, p_new, pairs = queue.pop(0)
        for child, centry, conname, spec in list(_inbound_fks(session, parent)):
            C, R = spec["cols"], spec["refcols"]
            act = (
                spec.get("on_delete", "a")
                if pairs is None
                else spec.get("on_update", "a")
            )
            if act in ("a", "r"):
                continue  # judged at end-of-statement below
            child_img = images.get(child)
            if child_img is None:
                child_img = session._live_read(centry)
            if pairs is None:
                gone_c = _gone_keys(p_old, p_new, R).select(
                    *[F.col(r).alias(c) for c, r in zip(C, R)]
                )
                hit = (
                    _null_safe_rows(child_img, C)
                    .select(*C)
                    .join(gone_c, on=C, how="left_semi")
                    .limit(1)
                    .count()
                )
                if not hit:
                    continue
                if act == "c":
                    new_child = child_img.join(gone_c, on=C, how="left_anti")
                    images[child] = new_child
                    queue.append((child, child_img, new_child, None))
                else:  # n / d — null or default the FK columns
                    fills = _fk_fills(centry, child_img, C, act)
                    j = child_img.join(
                        gone_c.withColumn(_MARK, F.lit(1)), on=C, how="left"
                    )
                    orphan = F.col(_MARK).isNotNull()
                    new_child = j.select(
                        *[
                            F.when(orphan, fills[c]).otherwise(F.col(c))
                            .alias(c)
                            if c in fills
                            else F.col(c)
                            for c in child_img.columns
                        ]
                    )
                    pairs_child = j.filter(orphan).select(
                        *[
                            F.col(c).alias(f"old__{c}")
                            for c in child_img.columns
                        ],
                        *[
                            (fills[c] if c in fills else F.col(c)).alias(
                                f"new__{c}"
                            )
                            for c in child_img.columns
                        ],
                    )
                    images[child] = new_child
                    fill_touched.setdefault(child, set()).update(C)
                    queue.append((child, child_img, new_child, pairs_child))
            else:
                # UPDATE-shaped: referenced keys that actually changed
                import functools
                import operator

                neq = functools.reduce(
                    operator.or_,
                    [
                        ~F.col(f"old__{r}").eqNullSafe(F.col(f"new__{r}"))
                        for r in R
                    ],
                )
                remap = pairs.filter(neq)
                for r in R:
                    remap = remap.filter(F.col(f"old__{r}").isNotNull())
                remap_c = remap.select(
                    *[F.col(f"old__{r}").alias(c) for c, r in zip(C, R)],
                    *[
                        F.col(f"new__{r}").alias(f"__citus_new_{c}")
                        for c, r in zip(C, R)
                    ],
                ).dropDuplicates(C).withColumn(_MARK, F.lit(1))
                hit = (
                    _null_safe_rows(child_img, C)
                    .select(*C)
                    .join(remap_c.select(*C), on=C, how="left_semi")
                    .limit(1)
                    .count()
                )
                if not hit:
                    continue
                if act == "c":
                    newval = {c: F.col(f"__citus_new_{c}") for c in C}
                else:
                    newval = _fk_fills(centry, child_img, C, act)
                j = child_img.join(remap_c, on=C, how="left")
                hit_col = F.col(_MARK).isNotNull()
                new_child = j.select(
                    *[
                        F.when(hit_col, newval[c]).otherwise(F.col(c))
                        .alias(c)
                        if c in newval
                        else F.col(c)
                        for c in child_img.columns
                    ]
                )
                pairs_child = j.filter(hit_col).select(
                    *[F.col(c).alias(f"old__{c}") for c in child_img.columns],
                    *[
                        (newval[c] if c in newval else F.col(c)).alias(
                            f"new__{c}"
                        )
                        for c in child_img.columns
                    ],
                )
                images[child] = new_child
                fill_touched.setdefault(child, set()).update(C)
                queue.append((child, child_img, new_child, pairs_child))
    _final_state_checks(session, images, fill_touched)
    return images


def _final_state_checks(session, images: dict, fill_touched: dict) -> None:
    """End-of-statement validation over the final images: every FK
    touching a changed table (NO ACTION / RESTRICT, and cascaded
    writes too — a SET DEFAULT must point at an existing parent), plus
    the row constraints of tables whose columns were rewritten."""
    for child, centry in session.catalog.tables().items():
        for conname, spec in (centry.constraints or {}).items():
            if spec["kind"] != "f":
                continue
            parent_t = spec["reftable"]
            if child not in images and parent_t not in images:
                continue
            pentry = session.catalog.get(parent_t)
            if pentry is None:
                continue
            child_df = images.get(child)
            if child_df is None:
                child_df = session._live_read(centry)
            parent_df = images.get(parent_t)
            if parent_df is None:
                parent_df = session._live_read(pentry)
            if _fk_violations(
                child_df, spec["cols"], parent_df, spec["refcols"],
                broadcast_parent=pentry.is_reference,
            ):
                raise ValueError(
                    f'update or delete on table "{parent_t}" violates '
                    f'foreign key constraint "{conname}" on table '
                    f'"{child}"'
                )
    for t, changed_cols in fill_touched.items():
        entry_t = session.catalog.get(t)
        img = images[t]
        for conname, spec in (entry_t.constraints or {}).items():
            if spec["kind"] == "c":
                if _check_violations(img, spec["expr"]):
                    raise ValueError(
                        f'new row for relation "{t}" violates check '
                        f'constraint "{conname}"'
                    )
            elif spec["kind"] in ("p", "u") and changed_cols & set(
                spec["cols"]
            ):
                if spec["kind"] == "p":
                    nn = _null_safe_rows(img, spec["cols"])
                    if img.count() != nn.count():
                        raise ValueError(
                            f'null value in column "{spec["cols"][0]}" '
                            f'of relation "{t}" violates not-null '
                            "constraint"
                        )
                if _unique_violations(img, spec["cols"]):
                    raise ValueError(
                        f"duplicate key value violates unique "
                        f'constraint "{conname}"'
                    )
            elif spec["kind"] == "x" and changed_cols & set(spec["cols"]):
                if _exclude_violations(img, spec["cols"], spec["ops"]):
                    raise ValueError(
                        "conflicting key value violates exclusion "
                        f'constraint "{conname}"'
                    )


def cascading_actions_exist(session, table: str, shape: str) -> bool:
    """True when any inbound FK of `table` (transitively irrelevant —
    one level decides) carries a CASCADE / SET NULL / SET DEFAULT for
    the given shape ('delete' or 'update')."""
    key = "on_delete" if shape == "delete" else "on_update"
    return any(
        ospec.get(key, "a") in ("c", "n", "d")
        for _t, _e, _c, ospec in _inbound_fks(session, table)
    )


def has_inbound_fks(session, table: str) -> list[str]:
    """Dependencies that block DROP TABLE — a table's own
    self-referential FK drops with it, so it does not count."""
    return [
        f"constraint {oc} on table {other}"
        for other, _e, oc, _s in _inbound_fks(
            session, table, include_self=False
        )
    ]


def enforce_full_image(
    session, entry, table: str, image: DataFrame
) -> None:
    """Judge the complete would-be relation — the bulk-write analog of
    the per-row checks (COPY FROM appends and MERGE rewrites must not
    bypass constraints; PG enforces them on those paths too). A
    self-referential FK's parent side is the image itself."""
    for conname, spec in (entry.constraints or {}).items():
        if spec["kind"] == "c":
            if _check_violations(image, spec["expr"]):
                raise ValueError(
                    f'new row for relation "{table}" violates check '
                    f'constraint "{conname}"'
                )
        elif spec["kind"] == "f":
            pentry = session.catalog.get(spec["reftable"])
            if pentry is None:
                continue
            parent = (
                image
                if spec["reftable"] == table
                else session._live_read(pentry)
            )
            if _fk_violations(
                image, spec["cols"], parent, spec["refcols"],
                broadcast_parent=pentry.is_reference,
            ):
                raise ValueError(
                    f'insert or update on table "{table}" violates '
                    f'foreign key constraint "{conname}"'
                )
        elif spec["kind"] in ("p", "u"):
            if spec["kind"] == "p":
                nn = _null_safe_rows(image, spec["cols"])
                if image.count() != nn.count():
                    raise ValueError(
                        f'null value in column "{spec["cols"][0]}" of '
                        f'relation "{table}" violates not-null '
                        "constraint"
                    )
            if _unique_violations(image, spec["cols"]):
                raise ValueError(
                    f"duplicate key value violates unique constraint "
                    f'"{conname}"'
                )
        elif spec["kind"] == "x":
            if _exclude_violations(image, spec["cols"], spec["ops"]):
                raise ValueError(
                    "conflicting key value violates exclusion "
                    f'constraint "{conname}"'
                )


def rename_reftable(session, old: str, new: str) -> None:
    """ALTER TABLE .. RENAME TO keeps inbound FKs attached (PG renames
    never detach constraints) — rewrite every stored reftable."""
    for _other, _oentry, _oc, ospec in list(_inbound_fks(session, old)):
        ospec["reftable"] = new


def guard_parent_column_change(session, table: str, col: str, renamed_to=None):
    """A column OTHER tables' foreign keys reference cannot be dropped
    (external dependents need CASCADE in PG too); a rename propagates
    into their stored refcols. A self-referential FK is same-table —
    it auto-drops with the column (guard_column_change), so it never
    blocks here."""
    for other, _oentry, oc, ospec in _inbound_fks(
        session, table, include_self=(renamed_to is not None)
    ):
        if col in ospec["refcols"]:
            if renamed_to is None:
                raise ValueError(
                    f'cannot drop column "{col}" of relation "{table}" '
                    f'because constraint "{oc}" on table "{other}" '
                    "depends on it"
                )
            ospec["refcols"] = [
                renamed_to if c == col else c for c in ospec["refcols"]
            ]


def guard_column_change(entry, table: str, col: str, renamed_to=None):
    """DROP COLUMN silently drops same-table dependent constraints —
    PG's behavior: CASCADE is only needed for EXTERNAL dependents
    (inbound FKs, handled by guard_parent_column_change). Same-table
    PK/UNIQUE/CHECK/outbound-FK constraints covering the column are
    removed with it. RENAME COLUMN propagates into stored column lists
    but cannot safely rewrite a textual CHECK expression — reject when
    the column name appears there."""
    if renamed_to is None:
        doomed = [
            conname
            for conname, spec in (entry.constraints or {}).items()
            if col in spec.get("cols", ())
            # refcols name the PARENT's columns — they only refer to
            # THIS table's columns when the FK is self-referential
            or (
                spec.get("reftable") == table
                and col in spec.get("refcols", ())
            )
            or (
                spec["kind"] == "c"
                and re.search(rf"\b{re.escape(col)}\b", spec["expr"])
            )
        ]
        for conname in doomed:
            del entry.constraints[conname]
        return
    for conname, spec in (entry.constraints or {}).items():
        in_cols = col in spec.get("cols", ())
        in_check = spec["kind"] == "c" and re.search(
            rf"\b{re.escape(col)}\b", spec["expr"]
        )
        if in_check:
            raise ValueError(
                f'cannot rename column "{col}" of relation '
                f'"{table}": check constraint "{conname}" '
                "references it textually — drop and re-add the "
                "constraint"
            )
        if in_cols:
            spec["cols"] = [
                renamed_to if c == col else c for c in spec["cols"]
            ]
