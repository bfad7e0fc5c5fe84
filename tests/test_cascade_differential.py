"""Differential testing of the referential-action cascade engine
(plans/constraints.py propagate_referential_actions): random small
schemas — chains, diamonds, self-loops, mixed ON DELETE actions —
exercised with DELETEs and compared against an independent Python
simulator of PostgreSQL's semantics.

The simulator is deliberately naive (set-based fixpoint over dicts) —
a second implementation sharing no code with the engine, so agreement
is evidence, not tautology."""

import random

import pytest

from citus_spark.session import DistributedSession


# --- the independent simulator ----------------------------------------------
def simulate_delete(tables, fks, root, pred):
    """tables: {name: list[dict]}; fks: list of
    (child, child_col, parent, parent_col, on_delete) with on_delete
    in a/c/n. Returns final {name: list[dict]} or raises ValueError
    on a NO ACTION violation — PG judged at end of statement."""
    state = {t: [dict(r) for r in rows] for t, rows in tables.items()}
    state[root] = [r for r in state[root] if not pred(r)]
    # fixpoint: apply cascades until stable
    changed = True
    guard = 0
    while changed:
        changed = False
        guard += 1
        assert guard < 100
        for child, ccol, parent, pcol, act in fks:
            keys = {r[pcol] for r in state[parent] if r[pcol] is not None}
            orphans = [
                r
                for r in state[child]
                if r[ccol] is not None and r[ccol] not in keys
            ]
            if not orphans:
                continue
            if act == "c":
                ids = {id(r) for r in orphans}
                state[child] = [
                    r for r in state[child] if id(r) not in ids
                ]
                changed = True
            elif act == "n":
                for r in orphans:
                    r[ccol] = None
                changed = True
            # 'a' (NO ACTION): judged after the fixpoint
    for child, ccol, parent, pcol, act in fks:
        if act != "a":
            continue
        keys = {r[pcol] for r in state[parent] if r[pcol] is not None}
        for r in state[child]:
            if r[ccol] is not None and r[ccol] not in keys:
                raise ValueError("violates foreign key")
    return state


def _rows(sess, t, cols):
    return sorted(
        tuple(r[c] for c in cols)
        for r in sess.spark.table(t).collect()
    )


def _sim_rows(state, t, cols):
    return sorted(tuple(r[c] for c in cols) for r in state[t])


N_CASES = 6


@pytest.mark.parametrize("seed", range(N_CASES))
def test_random_cascade_graphs(spark, seed):
    rng = random.Random(1000 + seed)
    sess = DistributedSession(spark)
    suffix = f"cd{seed}"
    n_tables = rng.randint(2, 4)
    names = [f"t{suffix}_{i}" for i in range(n_tables)]
    for n in reversed(names):
        sess.sql(f"DROP TABLE IF EXISTS {n}")
    # every table: pk int PRIMARY KEY, ref int (maybe FK), payload int
    for n in names:
        sess.sql(
            f"CREATE TABLE {n} (pk int PRIMARY KEY, ref int, payload int)"
        )
    # FK edges child -> parent for random pairs (parent index <= child
    # index allows self-loops and chains; diamonds arise naturally)
    fks = []
    for i, child in enumerate(names):
        if rng.random() < 0.85:
            parent = names[rng.randint(0, i)]
            act = rng.choice(["a", "c", "n"])
            act_sql = {
                "a": "NO ACTION", "c": "CASCADE", "n": "SET NULL",
            }[act]
            sess.sql(
                f"ALTER TABLE {child} ADD CONSTRAINT fk_{child} "
                f"FOREIGN KEY (ref) REFERENCES {parent} (pk) "
                f"ON DELETE {act_sql}"
            )
            fks.append((child, "ref", parent, "pk", act))
    # data: parents first so FKs validate; refs point at existing pks
    tables = {}
    for i, n in enumerate(names):
        pks = rng.sample(range(1, 30), rng.randint(4, 10))
        parent_edges = [f for f in fks if f[0] == n]
        rows = []
        for pk in pks:
            if parent_edges and rng.random() < 0.8:
                parent = parent_edges[0][2]
                pool = (
                    [r["pk"] for r in tables[parent]]
                    if parent != n
                    else [p for p in pks if p < pk] or [None]
                )
                ref = rng.choice(pool) if pool else None
            else:
                ref = None
            rows.append({"pk": pk, "ref": ref, "payload": pk * 7})
        tables[n] = rows
        values = ", ".join(
            f"({r['pk']}, {r['ref'] if r['ref'] is not None else 'NULL'}, "
            f"{r['payload']})"
            for r in rows
        )
        sess.sql(f"INSERT INTO {n} VALUES {values}")
    # delete a random subset of the ROOT table's rows by predicate
    root = names[0]
    mod = rng.randint(2, 4)
    pred_sql = f"pk % {mod} = 0"

    def pred(r):
        return r["pk"] % mod == 0

    try:
        expected = simulate_delete(tables, fks, root, pred)
        sim_error = None
    except ValueError:
        expected, sim_error = None, True

    if sim_error:
        with pytest.raises(ValueError, match="foreign key"):
            sess.sql(f"DELETE FROM {root} WHERE {pred_sql}")
        # a vetoed statement leaves every table untouched
        for n in names:
            assert _rows(sess, n, ("pk", "ref", "payload")) == sorted(
                (r["pk"], r["ref"], r["payload"]) for r in tables[n]
            ), (seed, n)
    else:
        sess.sql(f"DELETE FROM {root} WHERE {pred_sql}")
        for n in names:
            assert _rows(sess, n, ("pk", "ref", "payload")) == _sim_rows(
                expected, n, ("pk", "ref", "payload")
            ), (seed, n, fks)
    for n in reversed(names):
        try:
            sess.sql(f"DROP TABLE {n}")
        except ValueError:
            pass  # inbound FK ordering; reversed() handles chains


# --- UPDATE-shaped cascades ---------------------------------------------------
def simulate_update(tables, fks, root, pred, newkey):
    """Root UPDATE pk -> newkey(pk) for rows matching pred; ON UPDATE
    actions ripple to children (cascade rewrites refs, set-null nulls
    them, no-action judged at the end)."""
    state = {t: [dict(r) for r in rows] for t, rows in tables.items()}
    remap = {}
    for r in state[root]:
        if pred(r):
            old = r["pk"]
            r["pk"] = newkey(old)
            remap[old] = r["pk"]
    changed = True
    guard = 0
    while changed:
        changed = False
        guard += 1
        assert guard < 100
        for child, ccol, parent, pcol, act in fks:
            keys = {r[pcol] for r in state[parent] if r[pcol] is not None}
            orphans = [
                r
                for r in state[child]
                if r[ccol] is not None and r[ccol] not in keys
            ]
            if not orphans:
                continue
            if act == "c":
                for r in orphans:
                    # follow the remap when the old key was rewritten;
                    # a genuinely vanished key would be a delete-shape.
                    # Only an ACTUAL rewrite counts as progress — a
                    # non-remappable orphan must not spin the fixpoint
                    if r[ccol] in remap:
                        r[ccol] = remap[r[ccol]]
                        changed = True
            elif act == "n":
                for r in orphans:
                    r[ccol] = None
                changed = True
    for child, ccol, parent, pcol, act in fks:
        if act != "a":
            continue
        keys = {r[pcol] for r in state[parent] if r[pcol] is not None}
        for r in state[child]:
            if r[ccol] is not None and r[ccol] not in keys:
                raise ValueError("violates foreign key")
    return state


@pytest.mark.parametrize("seed", range(4))
def test_random_update_cascade_graphs(spark, seed):
    rng = random.Random(7000 + seed)
    sess = DistributedSession(spark)
    suffix = f"cu{seed}"
    parent = f"p{suffix}"
    children = [f"c{suffix}_{i}" for i in range(rng.randint(1, 2))]
    for n in children + [parent]:
        sess.sql(f"DROP TABLE IF EXISTS {n}")
    sess.sql(f"CREATE TABLE {parent} (pk int PRIMARY KEY, payload int)")
    fks = []
    for c in children:
        act = rng.choice(["a", "c", "n"])
        act_sql = {"a": "NO ACTION", "c": "CASCADE", "n": "SET NULL"}[act]
        sess.sql(
            f"CREATE TABLE {c} (pk int PRIMARY KEY, ref int "
            f"REFERENCES {parent} (pk) ON UPDATE {act_sql}, payload int)"
        )
        fks.append((c, "ref", parent, "pk", act))
    tables = {}
    pks = rng.sample(range(1, 25), rng.randint(4, 8))
    tables[parent] = [{"pk": p, "payload": p * 3} for p in pks]
    sess.sql(
        f"INSERT INTO {parent} VALUES "
        + ", ".join(f"({p}, {p * 3})" for p in pks)
    )
    for c in children:
        cpks = rng.sample(range(1, 40), rng.randint(3, 7))
        rows = [
            {
                "pk": cp,
                "ref": rng.choice(pks) if rng.random() < 0.8 else None,
                "payload": cp,
            }
            for cp in cpks
        ]
        tables[c] = rows
        sess.sql(
            f"INSERT INTO {c} VALUES "
            + ", ".join(
                f"({r['pk']}, "
                f"{r['ref'] if r['ref'] is not None else 'NULL'}, "
                f"{r['payload']})"
                for r in rows
            )
        )
    mod = rng.randint(2, 3)
    pred_sql = f"pk % {mod} = 0"

    def pred(r):
        return r["pk"] % mod == 0

    try:
        expected = simulate_update(
            tables, fks, parent, pred, lambda pk: pk + 100
        )
        sim_error = None
    except ValueError:
        expected, sim_error = None, True

    if sim_error:
        with pytest.raises(ValueError, match="foreign key"):
            sess.sql(
                f"UPDATE {parent} SET pk = pk + 100 WHERE {pred_sql}"
            )
        for n in [parent] + children:
            cols = ("pk", "payload") if n == parent else (
                "pk", "ref", "payload"
            )
            assert _rows(sess, n, cols) == sorted(
                tuple(r[c] for c in cols) for r in tables[n]
            ), (seed, n)
    else:
        sess.sql(f"UPDATE {parent} SET pk = pk + 100 WHERE {pred_sql}")
        for n in [parent] + children:
            cols = ("pk", "payload") if n == parent else (
                "pk", "ref", "payload"
            )
            assert _rows(sess, n, cols) == _sim_rows(
                expected, n, cols
            ), (seed, n, fks)
    for n in children + [parent]:
        try:
            sess.sql(f"DROP TABLE {n}")
        except ValueError:
            pass


# --- SET DEFAULT actions ------------------------------------------------------
def simulate_delete_with_default(tables, fks, defaults, root, pred):
    """Like simulate_delete with act 'd': orphans take the column
    DEFAULT; the END check judges EVERY fk (a default pointing at a
    deleted parent must veto, exactly PG)."""
    state = {t: [dict(r) for r in rows] for t, rows in tables.items()}
    state[root] = [r for r in state[root] if not pred(r)]
    changed = True
    guard = 0
    while changed:
        changed = False
        guard += 1
        assert guard < 100
        for child, ccol, parent, pcol, act in fks:
            keys = {r[pcol] for r in state[parent] if r[pcol] is not None}
            orphans = [
                r
                for r in state[child]
                if r[ccol] is not None and r[ccol] not in keys
            ]
            if not orphans:
                continue
            if act == "c":
                ids = {id(r) for r in orphans}
                state[child] = [
                    r for r in state[child] if id(r) not in ids
                ]
                changed = True
            elif act == "n":
                for r in orphans:
                    r[ccol] = None
                changed = True
            elif act == "d":
                dflt = defaults[(child, ccol)]
                for r in orphans:
                    if r[ccol] != dflt:
                        r[ccol] = dflt
                        changed = True
                # a stalled SET DEFAULT (default itself orphaned) just
                # stops progressing on THIS fk — other fks in the same
                # pass must still run; the end check vetoes if the
                # violation survives
    for child, ccol, parent, pcol, act in fks:
        keys = {r[pcol] for r in state[parent] if r[pcol] is not None}
        for r in state[child]:
            if r[ccol] is not None and r[ccol] not in keys:
                raise ValueError("violates foreign key")
    return state


@pytest.mark.parametrize("seed", range(4))
def test_random_set_default_graphs(spark, seed):
    rng = random.Random(4000 + seed)
    sess = DistributedSession(spark)
    parent = f"sdp{seed}"
    child = f"sdc{seed}"
    for n in (child, parent):
        sess.sql(f"DROP TABLE IF EXISTS {n}")
    pks = sorted(rng.sample(range(1, 20), rng.randint(5, 9)))
    default_pk = rng.choice(pks)
    sess.sql(f"CREATE TABLE {parent} (pk int PRIMARY KEY)")
    sess.sql(
        f"CREATE TABLE {child} (cid int, ref int DEFAULT {default_pk} "
        f"REFERENCES {parent} (pk) ON DELETE SET DEFAULT)"
    )
    sess.sql(
        f"INSERT INTO {parent} VALUES "
        + ", ".join(f"({p})" for p in pks)
    )
    crows = [
        {"cid": 100 + i, "ref": rng.choice(pks)}
        for i in range(rng.randint(4, 8))
    ]
    sess.sql(
        f"INSERT INTO {child} VALUES "
        + ", ".join(f"({r['cid']}, {r['ref']})" for r in crows)
    )
    mod = rng.randint(2, 3)

    def pred(r):
        return r["pk"] % mod == 0

    tables = {
        parent: [{"pk": p} for p in pks],
        child: [dict(r) for r in crows],
    }
    fks = [(child, "ref", parent, "pk", "d")]
    defaults = {(child, "ref"): default_pk}
    try:
        expected = simulate_delete_with_default(
            tables, fks, defaults, parent, pred
        )
        sim_error = None
    except ValueError:
        expected, sim_error = None, True

    stmt = f"DELETE FROM {parent} WHERE pk % {mod} = 0"
    if sim_error:
        # the default's own parent row was deleted: whole statement
        # vetoes, nothing written
        with pytest.raises(ValueError, match="foreign key"):
            sess.sql(stmt)
        assert _rows(sess, parent, ("pk",)) == sorted(
            (p,) for p in pks
        ), seed
        assert _rows(sess, child, ("cid", "ref")) == sorted(
            (r["cid"], r["ref"]) for r in crows
        ), seed
    else:
        sess.sql(stmt)
        assert _rows(sess, parent, ("pk",)) == _sim_rows(
            expected, parent, ("pk",)
        ), seed
        assert _rows(sess, child, ("cid", "ref")) == _sim_rows(
            expected, child, ("cid", "ref")
        ), (seed, default_pk)
    for n in (child, parent):
        try:
            sess.sql(f"DROP TABLE {n}")
        except ValueError:
            pass
