"""Graph analytics over event data (operators/pagerank.py +
operators/components.py family).

The graph: a bipartite user↔item walk from `events` — an edge
between user_id and item node (1000 + props.k) whenever the user
produced an event carrying that prop, both directions so the walk is
ergodic. This is the standard entity-importance projection of an
event log (users weighted by the items they touch and vice versa).

The oracle is a full independent re-derivation: because pagerank()
is exact integer fixed-point (see operators/pagerank.py), DuckDB
unrolls the identical iterations as chained CTEs and matches the
ranks BIT-FOR-BIT — an iterative distributed algorithm with a
value-exact oracle, not a boolean contract.

↔ reference: recursive/iterative query surface (SURVEY §2.3
recursive CTEs; citus docs' graph-traversal examples over
distributed tables).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citus_spark.queries import load_views, register_split

_ITERS = 8
_SCALE = 10**12

_EDGES_SPARK = """
SELECT DISTINCT user_id AS src,
       1000 + CAST(get_json_object(props, '$.k') AS BIGINT) AS dst
FROM events
WHERE get_json_object(props, '$.k') IS NOT NULL
"""

_EDGES_DUCK = """
SELECT DISTINCT user_id AS src,
       1000 + CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
"""


def pagerank_event_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.pagerank import pagerank
    from citus_spark.queries import corpus_above_cutover

    load_views(spark, sf_dir)
    fwd = spark.sql(_EDGES_SPARK)
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # sub-cutover: the rank table (one row per node) broadcasts, so
    # the compact loop removes every per-iteration shuffle; at scale
    # the default shuffling loop returns (ranks cannot broadcast)
    ranks = pagerank(
        edges, iters=_ITERS, compact=not corpus_above_cutover(sf_dir)
    )
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(20)
        .select("node", "rank")
    )


def _pagerank_oracle() -> str:
    # unrolled iterations: aggregation is not allowed in a recursive
    # CTE term (PG/DuckDB restriction), so the oracle chains pr0..prN
    parts = [
        f"""
WITH fwd AS ({_EDGES_DUCK}),
edges AS (
  SELECT src, dst FROM fwd
  UNION ALL
  SELECT dst AS src, src AS dst FROM fwd
),
nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
consts AS (
  SELECT {_SCALE} // COUNT(*) AS init,
         (15 * ({_SCALE} // COUNT(*))) // 100 AS base
  FROM nodes
),
pr0 AS (SELECT node, (SELECT init FROM consts) AS rank FROM nodes)"""
    ]
    for i in range(_ITERS):
        parts.append(f""",
s{i} AS (
  SELECT e.dst AS node, SUM(p.rank // d.outdeg) AS s
  FROM edges e
  JOIN pr{i} p ON p.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
pr{i + 1} AS (
  SELECT n.node,
         COALESCE((SELECT base FROM consts) + (85 * s.s) // 100,
                  (SELECT base FROM consts)) AS rank
  FROM nodes n LEFT JOIN s{i} s ON s.node = n.node
)""")
    parts.append(f"""
SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
FROM pr{_ITERS}
ORDER BY rank DESC, node
LIMIT 20
""")
    return "".join(parts)


register_split(
    "pagerank_event_entities", pagerank_event_entities, _pagerank_oracle()
)


# ---------------------------------------------------------------------------
# BFS hop counts from a source node over the same bipartite walk
# (operators/bfs.py). All-integer state → value-exact against a
# DuckDB recursive CTE whose UNION dedup bounds the walk.
_BFS_HOPS = 6


def bfs_hops_user0(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citus_spark.operators.bfs import bfs_hops

    load_views(spark, sf_dir)
    fwd = spark.sql(_EDGES_SPARK)
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return (
        bfs_hops(edges, [0], max_hops=_BFS_HOPS)
        .orderBy("hops", "node")
        .select("node", "hops")
    )


register_split(
    "bfs_hops_user0",
    bfs_hops_user0,
    f"""
WITH RECURSIVE fwd AS ({_EDGES_DUCK}),
edges AS (
  SELECT src, dst FROM fwd
  UNION ALL
  SELECT dst AS src, src AS dst FROM fwd
),
walk(node, dist) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < {_BFS_HOPS}
)
SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS INT) AS hops
FROM walk
GROUP BY node
ORDER BY hops, node
""",
)


# ---------------------------------------------------------------------------
# Triangle counting over the user co-occurrence projection: users are
# adjacent when they share an item (props.k), restricted to pairs
# sharing >= _COOC_MIN items, then DOULION edge sampling (Tsourakakis
# et al., KDD 2009): each edge survives with probability 1/q via the
# portable hash — DETERMINISTIC, so both engines sample the identical
# subgraph and the oracle is value-exact. The sampled triangle count
# scaled by q^3 is the published unbiased estimator; sampling is what
# keeps the 3-way self-join bounded when the projection densifies
# (the fixture's 100-item space yields a near-complete graph at
# sf0.1 — 1.1M edges — exactly the hazard a 100 TB run hits).
# Triangles count via the oriented edge-edge-edge join (src < dst
# everywhere), the standard distributed formulation.
_COOC_MIN = 3
_EDGE_Q = 16  # keep 1/16 of edges; triangles scale by ~1/q^3

_COOC_BODY = """
pairs0 AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM items a JOIN items b ON a.item = b.item AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
  HAVING count(*) >= {m}
),
pairs AS (
  SELECT u, v FROM pairs0 WHERE {edge_hash} % {q} = 0
)
"""

_TRI_BODY = """,
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles_sampled,
       CAST(count(*) * {q} * {q} * {q} AS BIGINT) AS doulion_estimate,
       CAST(count(DISTINCT a) AS BIGINT) AS n_apex_users
FROM tri
"""

_ITEMS_SPARK = """
items AS (
  SELECT DISTINCT user_id,
         CAST(get_json_object(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE get_json_object(props, '$.k') IS NOT NULL
)
"""

_ITEMS_DUCK = """
items AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL
)
"""

_EDGE_HASH_SPARK = (
    "CAST(conv(substr(md5(CAST(u AS STRING) || ':' || "
    "CAST(v AS STRING)), 1, 15), 16, 10) AS BIGINT)"
)
_EDGE_HASH_DUCK = (
    "CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':' || "
    "CAST(v AS VARCHAR)), 1, 15) AS BIGINT)"
)


def _cooc_sql(items: str, body: str, edge_hash: str) -> str:
    return (
        "WITH "
        + items
        + ","
        + _COOC_BODY.format(m=_COOC_MIN, q=_EDGE_Q, edge_hash=edge_hash)
        + body.format(q=_EDGE_Q)
    )


def triangle_count_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(_cooc_sql(_ITEMS_SPARK, _TRI_BODY, _EDGE_HASH_SPARK))


register_split(
    "triangle_count_cooc",
    triangle_count_cooc,
    _cooc_sql(_ITEMS_DUCK, _TRI_BODY, _EDGE_HASH_DUCK),
)


# Local clustering coefficient over the SAMPLED projection (same
# deterministic subgraph both engines): c(v) = 2·tri(v) /
# (deg(v)·(deg(v)−1)) — the triad-closure measure of the sampled
# graph. tri(v) counts each oriented triangle at all three corners;
# one IEEE division on exact integers → value-exact.
_CLUSTER_BODY = """,
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) e GROUP BY node
),
tri_at AS (
  SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri
  ) x GROUP BY node
)
SELECT d.node, d.d AS degree,
       CAST(coalesce(t.t, 0) AS BIGINT) AS triangles,
       CAST(2.0 * coalesce(t.t, 0) AS DOUBLE)
         / CAST(d.d * (d.d - 1) AS DOUBLE) AS clustering_coef
FROM deg d LEFT JOIN tri_at t ON t.node = d.node
WHERE d.d >= 2
ORDER BY clustering_coef DESC, degree DESC, d.node
LIMIT 40
"""


def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        _cooc_sql(_ITEMS_SPARK, _CLUSTER_BODY, _EDGE_HASH_SPARK)
    )


register_split(
    "clustering_coefficient",
    clustering_coefficient,
    _cooc_sql(_ITEMS_DUCK, _CLUSTER_BODY, _EDGE_HASH_DUCK),
)
