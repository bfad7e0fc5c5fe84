"""Differential testing of the generated-column + DEFAULT engine:
random small tables with integer generated expressions and column
defaults, driven through seeded random INSERT / UPDATE / MERGE
statement sequences, compared against an independent Python simulator
of PostgreSQL's semantics (dict rows, shares no code with the
engine — agreement is evidence, not tautology)."""

import random

import pytest

from citus_spark.session import DistributedSession


# expression templates over base columns a, b: (sql_text, py_fn)
_EXPRS = [
    ("a + b", lambda r: _n(r, lambda a, b: a + b)),
    ("a * 2 + b", lambda r: _n(r, lambda a, b: a * 2 + b)),
    ("a - b", lambda r: _n(r, lambda a, b: a - b)),
    (
        # CASE is NOT null-strict: a NULL comparison is "not true",
        # so the ELSE branch fires (first draft of this simulator got
        # that wrong — the engine was right)
        "CASE WHEN a > b THEN a ELSE b END",
        lambda r: (
            r["a"]
            if r["a"] is not None
            and r["b"] is not None
            and r["a"] > r["b"]
            else r["b"]
        ),
    ),
    ("a * b", lambda r: _n(r, lambda a, b: a * b)),
]


def _n(r, f):
    """SQL 3-valued arithmetic: any NULL operand → NULL."""
    if r["a"] is None or r["b"] is None:
        return None
    return f(r["a"], r["b"])


def simulate(events, gen_fn, default_b):
    """events: sequence of ('insert', k, a, b|'DEFAULT') /
    ('update_a', pred_k_mod, delta) / ('merge', [(k, a), ...]).
    Returns final rows as {k: (a, b, g)}."""
    rows = {}
    for ev in events:
        if ev[0] == "insert":
            _t, k, a, b = ev
            bb = default_b if b == "DEFAULT" else b
            r = {"a": a, "b": bb}
            rows[k] = (a, bb, gen_fn(r))
        elif ev[0] == "update_a":
            _t, mod, delta = ev
            for k, (a, b, _g) in list(rows.items()):
                if k % mod == 0 and a is not None:
                    na = a + delta
                    rows[k] = (na, b, gen_fn({"a": na, "b": b}))
        elif ev[0] == "merge":
            for k, a in ev[1]:
                if k in rows:
                    _oa, b, _g = rows[k]
                    rows[k] = (a, b, gen_fn({"a": a, "b": b}))
                else:
                    bb = default_b  # MERGE INSERT fills the DEFAULT
                    rows[k] = (a, bb, gen_fn({"a": a, "b": bb}))
    return rows


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_generated_differential(spark, seed):
    rng = random.Random(seed)
    s = DistributedSession(spark)
    expr_sql, gen_fn = rng.choice(_EXPRS)
    default_b = rng.randrange(1, 9)
    s.sql("DROP TABLE IF EXISTS gdiff_t")
    s.sql(
        f"CREATE TABLE gdiff_t (k int, a int, b int DEFAULT {default_b}, "
        f"g int GENERATED ALWAYS AS ({expr_sql}) STORED)"
    )

    events = []
    next_k = 0
    for _ in range(rng.randrange(4, 8)):
        kind = rng.choice(["insert", "insert", "update_a", "merge"])
        if kind == "insert":
            batch = []
            for _ in range(rng.randrange(1, 5)):
                k = next_k
                next_k += 1
                a = rng.choice([None, rng.randrange(-5, 20)])
                b = rng.choice(["DEFAULT", rng.randrange(-3, 10), None])
                batch.append((k, a, b))
            vals = ", ".join(
                f"({k}, {a if a is not None else 'NULL'}, "
                f"{'DEFAULT' if b == 'DEFAULT' else (b if b is not None else 'NULL')})"
                for k, a, b in batch
            )
            s.sql(f"INSERT INTO gdiff_t (k, a, b) VALUES {vals}")
            events.extend(("insert", k, a, b) for k, a, b in batch)
        elif kind == "update_a":
            mod = rng.randrange(2, 5)
            delta = rng.randrange(1, 7)
            s.sql(
                f"UPDATE gdiff_t SET a = a + {delta} WHERE k % {mod} = 0"
            )
            events.append(("update_a", mod, delta))
        else:  # merge upsert: some existing keys, some new
            pairs = []
            for _ in range(rng.randrange(1, 4)):
                if rng.random() < 0.5 and next_k > 0:
                    pairs.append(
                        (rng.randrange(next_k), rng.randrange(0, 30))
                    )
                else:
                    pairs.append((next_k, rng.randrange(0, 30)))
                    next_k += 1
            # de-dup source keys (PG: a row cannot be affected twice)
            dedup = {}
            for k, a in pairs:
                dedup[k] = a
            pairs = sorted(dedup.items())
            union = " UNION ALL ".join(
                f"SELECT {k} AS k, {a} AS na" for k, a in pairs
            )
            s.sql(
                f"MERGE INTO gdiff_t AS t USING ({union}) AS s "
                "ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET a = s.na "
                "WHEN NOT MATCHED THEN INSERT (k, a) VALUES (s.k, s.na)"
            )
            events.append(("merge", pairs))

    want = simulate(events, gen_fn, default_b)
    got = {
        r.k: (r.a, r.b, r.g)
        for r in spark.table("gdiff_t").collect()
    }
    assert got == want, f"seed={seed} expr={expr_sql}"
    s.sql("DROP TABLE IF EXISTS gdiff_t")
