"""Seeded random query generator — the differential-testing analog of
the reference's query generator (reference
src/test/regress/citus_tests/query_generator/README.md:1-30,
query_gen.py), which runs the same generated queries against Citus
tables and plain PostgreSQL tables and diffs the results. Here the
two engines are our Spark surface and DuckDB over the same parquet.

Every generated query is portable ANSI SQL obeying the repo's
cross-engine correctness rules (citus_spark/queries/__init__.py):
double-typed aggregates use the exact fixed-point DSUM idiom so
results are bit-identical regardless of partition/summation order,
integer aggregates are cast to BIGINT, and bare SELECTs carry a
total ORDER BY before LIMIT so the row multiset is deterministic.

The generator walks a random connected path through the fixture
join graph (the same foreign-key topology the reference's generator
uses on its TPC-H-ish tables), then layers on random filters and
either a group-aggregate head or a projected top-k head.
"""

from __future__ import annotations

import random

from citus_spark.queries import DSUM

# join graph: (left_table, right_table, condition)
EDGES = [
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"),
    ("nation", "region", "n_regionkey = r_regionkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
    ("lineitem", "supplier", "l_suppkey = s_suppkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey"),
]

FILTERS = {
    "lineitem": [
        "l_quantity < 25",
        "l_discount BETWEEN 0.02 AND 0.08",
        "l_shipdate < timestamp '1997-06-01 00:00:00'",
        "l_returnflag = 'R'",
        "l_tax > 0.03",
        "l_linenumber <= 4",
    ],
    "orders": [
        "o_orderstatus = 'F'",
        "o_totalprice > 50000",
        "o_orderdate >= timestamp '1995-01-01 00:00:00'",
        "o_orderpriority LIKE '1%'",
    ],
    "customer": [
        "c_mktsegment = 'BUILDING'",
        "c_acctbal > 1000",
        "c_nationkey < 12",
    ],
    "part": ["p_size < 30", "p_retailprice > 900", "p_type LIKE '%BRASS%'"],
    "supplier": ["s_acctbal > 0", "s_nationkey >= 5"],
    "nation": ["n_nationkey < 20"],
    "region": ["r_regionkey <> 2"],
}

GROUP_COLS = {
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "customer": ["c_mktsegment", "c_nationkey"],
    "part": ["p_brand", "p_size"],
    "supplier": ["s_nationkey"],
    "nation": ["n_name"],
    "region": ["r_name"],
}

# (col, kind): kind 'd' = double (DSUM), 'i' = integer (sum→BIGINT),
# 'o' = orderable (min/max only)
AGG_COLS = {
    "lineitem": [
        ("l_extendedprice", "d"),
        ("l_quantity", "d"),
        ("l_discount", "d"),
        ("l_linenumber", "i"),
        ("l_shipdate", "o"),
    ],
    "orders": [("o_totalprice", "d"), ("o_orderdate", "o"), ("o_orderkey", "i")],
    "customer": [("c_acctbal", "d"), ("c_custkey", "i"), ("c_name", "o")],
    "part": [("p_retailprice", "d"), ("p_size", "i"), ("p_name", "o")],
    "supplier": [("s_acctbal", "d"), ("s_suppkey", "i")],
    "nation": [("n_nationkey", "i"), ("n_name", "o")],
    "region": [("r_regionkey", "i"), ("r_name", "o")],
}

PROJ_COLS = {
    "lineitem": ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
    "orders": ["o_orderkey", "o_orderstatus", "o_totalprice"],
    "customer": ["c_custkey", "c_name", "c_mktsegment"],
    "part": ["p_partkey", "p_brand"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "nation": ["n_nationkey", "n_name"],
    "region": ["r_regionkey", "r_name"],
}


def _random_join_tree(rng: random.Random) -> tuple[list[str], str]:
    """Pick a connected set of 1–4 tables; return (tables, FROM clause).
    30% of joins are LEFT OUTER (the accumulated tree is the preserved
    side), covering null-extension through aggregates and filters."""
    n_tables = rng.choice([1, 2, 2, 3, 3, 4])
    start = rng.choice(list(FILTERS))
    tables = [start]
    joins = []
    while len(tables) < n_tables:
        candidates = [
            (l, r, c)
            for (l, r, c) in EDGES
            if (l in tables) != (r in tables)  # extends the tree
        ]
        if not candidates:
            break
        l, r, c = rng.choice(candidates)
        new = r if l in tables else l
        p = rng.random()
        # 60% inner, 25% left, 10% right, 5% full — outer joins cover
        # null-extension through aggregates/filters on both sides
        if p < 0.60:
            kind = "JOIN"
        elif p < 0.85:
            kind = "LEFT JOIN"
        elif p < 0.95:
            kind = "RIGHT JOIN"
        else:
            kind = "FULL JOIN"
        tables.append(new)
        joins.append((kind, new, c))
    frm = f"FROM {tables[0]}"
    for kind, t, cond in joins:
        frm += f"\n{kind} {t} ON {cond}"
    return tables, frm


def _agg_select(rng: random.Random, tables: list[str]) -> tuple[str, str, str]:
    """Random aggregate head: (select_list, group_by, order_by)."""
    g_table = rng.choice(tables)
    g_cols = rng.sample(
        GROUP_COLS[g_table], k=min(rng.choice([1, 1, 2]), len(GROUP_COLS[g_table]))
    )
    aggs = ["CAST(count(*) AS BIGINT) AS cnt"]
    pool = [x for t in tables for x in AGG_COLS[t]]
    for i in range(rng.choice([1, 2])):
        col, kind = rng.choice(pool)
        if kind == "d":
            op = rng.choice(["sum", "min", "max"])
            if op == "sum":
                aggs.append(DSUM(col, f"a{i}"))
            else:
                aggs.append(f"{op}({col}) AS a{i}")
        elif kind == "i":
            op = rng.choice(["sum", "min", "max", "count"])
            aggs.append(f"CAST({op}({col}) AS BIGINT) AS a{i}")
        else:
            op = rng.choice(["min", "max"])
            aggs.append(f"{op}({col}) AS a{i}")
    if rng.random() < 0.35:
        ft = rng.choice(tables)
        fpred = rng.choice(FILTERS[ft])
        aggs.append(f"CAST(count(*) FILTER (WHERE {fpred}) AS BIGINT) AS cf")
    select = ", ".join(g_cols + aggs)
    group = "GROUP BY " + ", ".join(g_cols)
    if rng.random() < 0.3:
        group += f"\nHAVING count(*) > {rng.choice([1, 5, 20])}"
    return select, group, ""


def _proj_select(rng: random.Random, tables: list[str]) -> tuple[str, str, str]:
    """Random projection head with total order + LIMIT (deterministic
    multiset: ties under ORDER BY all columns are identical rows).
    Explicit NULLS FIRST on every key: outer joins null-extend
    projected columns and the engines' default null ordering differs
    (Spark NULLS FIRST asc, DuckDB NULLS LAST) — under LIMIT that
    would select different rows."""
    cols = []
    for t in tables:
        cols += rng.sample(PROJ_COLS[t], k=min(2, len(PROJ_COLS[t])))
    order = (
        "ORDER BY "
        + ", ".join(f"{c} NULLS FIRST" for c in cols)
        + f"\nLIMIT {rng.choice([20, 50, 100])}"
    )
    return ", ".join(cols), "", order


# window fuzz: the frame's ORDER BY must be TOTAL for engine-
# independent frame contents. This fixture's (l_orderkey,
# l_linenumber) is NOT unique (the generator repeats line numbers),
# so the spec orders by every distinguishing column — remaining ties
# are fully identical rows, whose interchangeable frame values are
# multiset-safe; the outer cut additionally orders by the computed
# window value.
_WIN_FUNCS = [
    "row_number()",
    "rank()",
    "dense_rank()",
    "CAST(count(*) OVER_FRAME AS BIGINT)",
    "min(l_quantity) OVER_FRAME",
    "max(l_extendedprice) OVER_FRAME",
    "lag(l_linenumber, 1) OVER_PLAIN",
    "lead(l_linenumber, 2) OVER_PLAIN",
]
_FRAMES = [
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
]


_TOTAL_ORDER = (
    "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    "l_shipdate"
)


def _window_query(rng: random.Random) -> str:
    part = rng.choice(["l_returnflag", "l_linestatus", "l_suppkey % 8"])
    spec = f"PARTITION BY {part} ORDER BY {_TOTAL_ORDER}"
    fn = rng.choice(_WIN_FUNCS)
    frame = rng.choice(_FRAMES)
    fn = fn.replace("OVER_FRAME", f"OVER ({spec} {frame})").replace(
        "OVER_PLAIN", f"OVER ({spec})"
    )
    if "OVER" not in fn:
        fn = f"{fn} OVER ({spec})"
    pred = rng.choice(FILTERS["lineitem"])
    return f"""SELECT l_orderkey, l_linenumber, {fn} AS w
FROM lineitem
WHERE {pred}
ORDER BY l_orderkey, l_linenumber, w
LIMIT {rng.choice([100, 500])}"""


def _setop_query(rng: random.Random) -> str:
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"]
    )
    t = rng.choice(["lineitem", "orders", "customer"])
    cols = ", ".join(PROJ_COLS[t][:2])
    f1, f2 = rng.sample(FILTERS[t], k=2)
    return f"""SELECT {cols} FROM {t} WHERE {f1}
{op}
SELECT {cols} FROM {t} WHERE {f2}"""


def _subquery_query(rng: random.Random) -> str:
    """Correlated scalar subquery / (NOT) EXISTS heads — the shapes
    the reference plans via recursive planning or pushdown depending
    on the correlation column (README.md:468-478)."""
    cpred = rng.choice(FILTERS["customer"])
    opred = rng.choice(FILTERS["orders"])
    if rng.random() < 0.5:
        return f"""SELECT c_custkey,
  CAST((SELECT count(*) FROM orders
        WHERE o_custkey = c_custkey AND {opred}) AS BIGINT) AS n_orders
FROM customer
WHERE {cpred}
ORDER BY c_custkey
LIMIT 200"""
    q = "EXISTS" if rng.random() < 0.5 else "NOT EXISTS"
    return f"""SELECT c_custkey, c_mktsegment
FROM customer
WHERE {cpred}
  AND {q} (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND {opred})
ORDER BY c_custkey
LIMIT 200"""


def _ch_window_subquery_query(rng: random.Random) -> str:
    """Window-in-subquery over the derived CH (TPC-C) tables — the
    top-k-per-group shape the reference exercises in its CH-benCHmark
    regression (chbenchmark_all_queries.sql) layered with the
    window-pushdown restriction it plans via SafeToPushdownWindowFunction.
    Uses chbench's deterministic derived order_line/stock/item CTE so
    both engines compute identical inputs.

    Determinism rules: order_line's natural key is NOT unique (fixture
    repeats (l_orderkey, l_linenumber)), so the window ORDER BY lists
    every derived column — remaining ties are fully identical rows,
    whose interchangeable row_number values are multiset-safe; stock's
    (s_w_id, s_i_id) IS unique, so rank there is exact."""
    from citus_spark.queries.chbench import _CH_CTE

    k = rng.choice([3, 5, 10])
    if rng.random() < 0.5:
        pred = rng.choice(
            [
                "ol_quantity < 25",
                "ol_delivery_d > timestamp '1996-06-01 00:00:00'",
                "ol_amount > 1000",
                "ol_d_id <= 5",
            ]
        )
        ocols = (
            "ol_amount DESC, ol_o_id, ol_number, ol_d_id, ol_i_id, "
            "ol_supply_w_id, ol_delivery_d, ol_quantity"
        )
        return f"""WITH {_CH_CTE}
SELECT ol_w_id, ol_o_id, ol_number, ol_amount, rk FROM (
  SELECT ol_w_id, ol_o_id, ol_number, ol_amount,
         CAST(row_number() OVER (PARTITION BY ol_w_id
                                 ORDER BY {ocols}) AS INT) AS rk
  FROM order_line
  WHERE {pred}) t
WHERE rk <= {k}
ORDER BY ol_w_id, rk, ol_o_id, ol_number"""
    price = rng.choice([500, 900, 1200])
    return f"""WITH {_CH_CTE}
SELECT s_w_id, s_i_id, s_quantity, rk FROM (
  SELECT s_w_id, s_i_id, s_quantity,
         CAST(rank() OVER (PARTITION BY s_w_id
                           ORDER BY s_quantity DESC, s_i_id) AS INT) AS rk
  FROM stock JOIN item ON i_id = s_i_id
  WHERE i_price > {price}) t
WHERE rk <= {k}
ORDER BY s_w_id, rk, s_i_id"""


def _grouping_sets_query(rng: random.Random) -> str:
    """ROLLUP / CUBE / GROUPING SETS over two keys — null-extended
    group rows exercise cross-engine NULL-group semantics. (The
    reference only supports these after CTE materialization,
    multi_logical_planner.c:915; Spark is native — we exceed it.)"""
    t = rng.choice(["lineitem", "orders", "customer"])
    g1, g2 = (GROUP_COLS[t] + GROUP_COLS[t])[:2]
    form = rng.choice(
        [f"ROLLUP ({g1}, {g2})", f"CUBE ({g1}, {g2})",
         f"GROUPING SETS (({g1}), ({g1}, {g2}), ())"]
    )
    pred = rng.choice(FILTERS[t])
    return f"""SELECT {g1}, {g2}, CAST(count(*) AS BIGINT) AS cnt
FROM {t}
WHERE {pred}
GROUP BY {form}"""


def _ordered_set_query(rng: random.Random) -> str:
    """percentile_disc / percentile_cont WITHIN GROUP — both engines
    implement the PostgreSQL rule (disc: smallest value with
    cume_dist ≥ p, probed; cont: linear interpolation). disc returns
    a value from the data (bit-exact); cont interpolates on doubles,
    so cont is restricted to the 2dp-derived monetary columns where
    the interpolation arithmetic is identical IEEE in both engines."""
    t = rng.choice(["lineitem", "orders", "customer", "part"])
    num = {
        "lineitem": "l_extendedprice",
        "orders": "o_totalprice",
        "customer": "c_acctbal",
        "part": "p_retailprice",
    }[t]
    g = rng.choice(GROUP_COLS[t])
    p = rng.choice(["0.1", "0.25", "0.5", "0.9", "0.99"])
    fn = rng.choice(["percentile_disc", "percentile_cont"])
    pred = rng.choice(FILTERS[t])
    return f"""SELECT {g},
  {fn}({p}) WITHIN GROUP (ORDER BY {num}) AS pv,
  CAST(count(*) AS BIGINT) AS cnt
FROM {t}
WHERE {pred}
GROUP BY {g}
ORDER BY {g} NULLS FIRST"""


def _unpivot_query(rng: random.Random) -> str:
    """SQL-standard UNPIVOT (wide → long) with an aggregate head —
    spelled identically by both engines."""
    t, cols, key, keymax = rng.choice(
        [
            ("lineitem", ["l_quantity", "l_extendedprice", "l_discount"],
             "l_orderkey", 2000),
            ("orders", ["o_totalprice"], "o_orderkey", 4000),
            ("customer", ["c_acctbal"], "c_custkey", 1500),
        ]
    )
    picked = [c for c in cols if rng.random() < 0.7] or cols[:1]
    return f"""SELECT metric,
  CAST(sum(CAST(val AS DECIMAL(18,6))) AS DOUBLE) AS total,
  CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT {', '.join([key] + picked)}
  FROM {t} WHERE {key} < {keymax}
) UNPIVOT (val FOR metric IN ({', '.join(picked)}))
GROUP BY metric
ORDER BY metric"""




# FILTER-pivot head — the crosstab shape (one row per key, one
# aggregate column per category predicate) both engines run as plain
# FILTER aggregates; exercises the partial/final split with multiple
# conditional aggregates over one scan.
_PIVOT_KEYS = {
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "customer": ["c_mktsegment", "c_nationkey"],
}


def _pivot_filter_query(rng: random.Random) -> str:
    t = rng.choice(list(_PIVOT_KEYS))
    key = rng.choice(_PIVOT_KEYS[t])
    preds = rng.sample(FILTERS[t], k=rng.randint(2, min(3, len(FILTERS[t]))))
    cols = [
        f"CAST(count(*) FILTER (WHERE {p}) AS BIGINT) AS f{i}"
        for i, p in enumerate(preds)
    ]
    where = ""
    if rng.random() < 0.4:
        leftover = [p for p in FILTERS[t] if p not in preds]
        if leftover:
            where = "WHERE " + rng.choice(leftover)
    return (
        f"SELECT {key}, CAST(count(*) AS BIGINT) AS n, {', '.join(cols)}\n"
        f"FROM {t} {where}\n"
        f"GROUP BY {key} ORDER BY {key}"
    )


def gen_query(rng: random.Random) -> str:
    shape = rng.random()
    if shape < 0.04:
        return _pivot_filter_query(rng)
    if shape < 0.07:
        return _window_query(rng)
    if shape < 0.12:
        return _ordered_set_query(rng)
    if shape < 0.16:
        return _unpivot_query(rng)
    if shape < 0.23:
        return _setop_query(rng)
    if shape < 0.31:
        return _subquery_query(rng)
    if shape < 0.38:
        return _grouping_sets_query(rng)
    if shape < 0.45:
        return _ch_window_subquery_query(rng)
    tables, frm = _random_join_tree(rng)
    preds = []
    for t in tables:
        for p in FILTERS[t]:
            if rng.random() < 0.3:
                preds.append(p)
    where = ("WHERE " + "\n  AND ".join(preds)) if preds else ""
    head = "SELECT"
    roll = rng.random()
    if roll < 0.65:
        select, group, order = _agg_select(rng, tables)
    else:
        select, group, order = _proj_select(rng, tables)
        if roll > 0.85:
            head = "SELECT DISTINCT"
    return "\n".join(
        s for s in (f"{head} {select}", frm, where, group, order) if s
    )


def gen_suite(seed: int = 42, n: int = 60) -> list[str]:
    rng = random.Random(seed)
    return [gen_query(rng) for _ in range(n)]


if __name__ == "__main__":
    for i, q in enumerate(gen_suite()):
        print(f"-- generated query {i}\n{q};\n")


# ---------------------------------------------------------------------------
# DISTINCT ON fuzz head — exercises the front door's row_number
# rewrite (plans/rewrites.rewrite_distinct_on) against DuckDB's
# NATIVE DISTINCT ON on identical text (↔ reference
# multi_select_distinct.sql's dominant spelling). Determinism: the
# ORDER BY starts with the key (PG's rule) and ends with a unique
# column set, so "first row per key" is total.

_DON_TABLES = {
    "orders": {
        "keys": ["o_custkey", "o_orderpriority", "o_custkey % 7"],
        "cols": ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
                 "o_orderstatus"],
        "unique": ["o_orderkey"],
    },
    "lineitem": {
        "keys": ["l_orderkey", "l_returnflag", "l_suppkey % 5"],
        "cols": ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
                 "l_extendedprice"],
        "unique": ["l_orderkey", "l_linenumber"],
    },
    "customer": {
        "keys": ["c_nationkey", "c_mktsegment"],
        "cols": ["c_custkey", "c_nationkey", "c_acctbal"],
        "unique": ["c_custkey"],
    },
}


def gen_distinct_on_query(rng: random.Random) -> str:
    t = rng.choice(list(_DON_TABLES))
    spec = _DON_TABLES[t]
    key = rng.choice(spec["keys"])
    cols = rng.sample(spec["cols"], k=rng.randint(2, len(spec["cols"])))
    for u in spec["unique"]:
        if u not in cols:
            cols.append(u)
    tiebreak = [
        f"{c} {'DESC' if rng.random() < 0.4 else 'ASC'}"
        for c in cols
        if c != key
    ]
    where = ""
    if rng.random() < 0.5 and t in FILTERS:
        where = "WHERE " + rng.choice(FILTERS[t])
    return (
        f"SELECT DISTINCT ON ({key}) {', '.join(cols)}\n"
        f"FROM {t} {where}\n"
        f"ORDER BY {key}, {', '.join(tiebreak)}"
    )


def gen_distinct_on_suite(seed: int = 7, n: int = 30) -> list[str]:
    rng = random.Random(seed)
    return [gen_distinct_on_query(rng) for _ in range(n)]


# ---------------------------------------------------------------------------
# Quantified-comparison differential fuzz (round 6): PG spellings of
# ANY/SOME/ALL over array literals and subqueries through the session
# front door, vs a DuckDB-dialect translation (DuckDB takes quantified
# subqueries verbatim but not PG '{...}' array-input literals — value
# lists translate to IN / least-greatest bounds).
_QUANT_OPS = ["=", "<>", "<", ">", "<=", ">="]


def gen_quantified_query(rng: random.Random) -> tuple[str, str]:
    col = rng.choice(["o_orderkey", "o_custkey"])
    if rng.random() < 0.5:
        # array-literal form
        vals = sorted(rng.sample(range(0, 1500), k=rng.randint(2, 5)))
        op = rng.choice(_QUANT_OPS)
        quant = rng.choice(["ANY", "ALL"]) if op not in ("=", "<>") else (
            "ANY" if op == "=" else "ALL"
        )
        lit = "{" + ",".join(str(v) for v in vals) + "}"
        cast = "::int[]" if rng.random() < 0.5 else ""
        pg_pred = f"{col} {op} {quant} ('{lit}'{cast})"
        vs = ", ".join(str(v) for v in vals)
        if op == "=":
            duck_pred = f"{col} IN ({vs})"
        elif op == "<>":
            duck_pred = f"{col} NOT IN ({vs})"
        else:
            lo, hi = min(vals), max(vals)
            bound = {
                (">", "ANY"): f"{col} > {lo}",
                (">=", "ANY"): f"{col} >= {lo}",
                ("<", "ANY"): f"{col} < {hi}",
                ("<=", "ANY"): f"{col} <= {hi}",
                (">", "ALL"): f"{col} > {hi}",
                (">=", "ALL"): f"{col} >= {hi}",
                ("<", "ALL"): f"{col} < {lo}",
                ("<=", "ALL"): f"{col} <= {lo}",
            }
            duck_pred = bound[(op, quant)]
    else:
        # subquery form — identical text both engines
        bound = rng.randint(5, 60)
        sub = (
            f"SELECT c_custkey FROM customer WHERE c_custkey < {bound}"
        )
        if rng.random() < 0.5:
            pg_pred = duck_pred = f"o_custkey = ANY ({sub})"
        else:
            pg_pred = duck_pred = f"o_custkey <> ALL ({sub})"
    body = (
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "min(o_orderkey) AS mn, max(o_orderkey) AS mx "
        "FROM orders WHERE "
    )
    return body + pg_pred, body + duck_pred


def gen_quantified_suite(
    seed: int = 13, n: int = 30
) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    return [gen_quantified_query(rng) for _ in range(n)]
