"""Native scale-factor fixture generator (r9 verdict item #6).

Produces the driver fixture schema (TESTDATA.md: region nation
customer supplier part orders lineitem events documents embeddings)
at any scale factor with FRESH independent rows — a dbgen-equivalent,
not a union of key-offset copies of sf0.1. Distributions are profiled
from the sf0.1 fixture (same vocabularies, key ranges scaled by sf,
same categorical frequencies), so the headline queries hit the same
selectivities at every scale.

Determinism without rand(): every value derives from
xxhash64(row_id, salt) — the generation is reproducible, partition-
order-free, and fully distributed (spark.range + column expressions;
no driver-side loops, no collect). At sf=1 this builds ~6M lineitem
rows in ~1 min on local[32]; the same plan shape generates sf=1000
on a cluster.

Usage: python tools/gen_sf.py <sf> <outdir>
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _u(col, salt: int, mod: int = 1_000_000):
    """Deterministic uniform in [0, 1) from (col, salt)."""
    return (F.pmod(F.xxhash64(col.cast("long"), F.lit(salt)), F.lit(mod))
            ).cast("double") / float(mod)


def _pick(col, salt: int, choices: list[str]):
    arr = F.array(*[F.lit(c) for c in choices])
    return F.element_at(
        arr, (F.pmod(F.xxhash64(col.cast("long"), F.lit(salt)),
                     F.lit(len(choices))) + 1).cast("int")
    )


# sf0.1 vocabularies (profiled; see NOTES round-10 log)
_P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
_P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
           "widget"]
_P_TYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
             "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
               "5-LOW"]
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_DOC_WORDS = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
_LANGS = [("en", 10), ("zh", 4), ("es", 4), ("fr", 4), ("de", 3)]


def counts(sf: float) -> dict[str, int]:
    return {
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "events": int(1_000_000 * sf),
        "documents": int(50_000 * sf),
        "embeddings": int(20_000 * sf),
        "users": int(15_000 * sf),
    }


def build_tables(spark: SparkSession, sf: float) -> dict[str, DataFrame]:
    n = counts(sf)
    par = spark.sparkContext.defaultParallelism or 8

    region = spark.createDataFrame(
        [(i, name) for i, name in enumerate(_REGIONS)],
        "r_regionkey int, r_name string",
    )
    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    customer = spark.range(n["customer"]).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (F.pmod(F.xxhash64("id", F.lit(11)), F.lit(25)))
        .cast("int").alias("c_nationkey"),
        F.round(_u(F.col("id"), 12) * 11000.0 - 1000.0, 2)
        .alias("c_acctbal"),
        _pick(F.col("id"), 13, _SEGMENTS).alias("c_mktsegment"),
    )
    supplier = spark.range(n["supplier"]).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        (F.pmod(F.xxhash64("id", F.lit(21)), F.lit(25)))
        .cast("int").alias("s_nationkey"),
        F.round(_u(F.col("id"), 22) * 11000.0 - 1000.0, 2)
        .alias("s_acctbal"),
    )
    part = spark.range(n["part"]).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            _pick(F.col("id"), 31, _P_ADJ), F.lit(" "),
            _pick(F.col("id"), 32, _P_NOUN),
        ).alias("p_name"),
        F.concat(
            F.lit("Brand#"),
            (F.pmod(F.xxhash64("id", F.lit(33)), F.lit(25)) + 1)
            .cast("string"),
        ).alias("p_brand"),
        _pick(F.col("id"), 34, _P_TYPE).alias("p_type"),
        (F.pmod(F.xxhash64("id", F.lit(35)), F.lit(50)) + 1)
        .cast("int").alias("p_size"),
        F.round(F.lit(900.0) + _u(F.col("id"), 36) * 100.0, 2)
        .alias("p_retailprice"),
    )
    orders = spark.range(n["orders"]).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(41)), F.lit(n["customer"]))
        .alias("o_custkey"),
        _pick(F.col("id"), 42, ["F", "O", "P"]).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + _u(F.col("id"), 43) * 499000.0, 2)
        .alias("o_totalprice"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("1995-01-01"), "yyyy-MM-dd")
            + F.pmod(F.xxhash64("id", F.lit(44)), F.lit(2404))
            * 86400
        ).alias("o_orderdate"),
        _pick(F.col("id"), 45, _PRIORITIES).alias("o_orderpriority"),
    )
    # 1-7 lines per order (avg 4) — explode keeps generation
    # distributed; line values derive from (orderkey, linenumber)
    li_key = F.col("o_orderkey") * 8 + F.col("l_linenumber")
    lineitem = (
        orders.select("o_orderkey", "o_orderdate")
        .withColumn(
            "l_linenumber",
            F.explode(F.sequence(
                F.lit(1),
                (F.pmod(F.xxhash64("o_orderkey", F.lit(51)), F.lit(7))
                 + 1).cast("int"),
            )),
        )
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.pmod(F.xxhash64(li_key, F.lit(52)), F.lit(n["part"]))
            .alias("l_partkey"),
            F.pmod(F.xxhash64(li_key, F.lit(53)), F.lit(n["supplier"]))
            .alias("l_suppkey"),
            F.col("l_linenumber").cast("int"),
            (F.pmod(F.xxhash64(li_key, F.lit(54)), F.lit(50)) + 1)
            .cast("double").alias("l_quantity"),
            F.round(F.lit(900.0) + _u(li_key, 55) * 104100.0, 2)
            .alias("l_extendedprice"),
            (F.pmod(F.xxhash64(li_key, F.lit(56)), F.lit(11))
             .cast("double") / 100.0).alias("l_discount"),
            (F.pmod(F.xxhash64(li_key, F.lit(57)), F.lit(9))
             .cast("double") / 100.0).alias("l_tax"),
            _pick(li_key, 58, ["A", "N", "R"]).alias("l_returnflag"),
            _pick(li_key, 59, ["F", "O"]).alias("l_linestatus"),
            F.timestamp_seconds(
                F.unix_timestamp("o_orderdate")
                + (F.pmod(F.xxhash64(li_key, F.lit(60)), F.lit(95)) + 1)
                * 86400
            ).alias("l_shipdate"),
        )
    )
    events = spark.range(n["events"]).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-01"), "yyyy-MM-dd")
            + F.pmod(F.xxhash64("id", F.lit(61)), F.lit(30 * 86400))
            + _u(F.col("id"), 66)
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(62)), F.lit(n["users"]))
        .alias("user_id"),
        _pick(F.col("id"), 63, _EVENT_TYPES).alias("event_type"),
        # right-skewed value like the fixture (min 0, max ~560)
        F.round(F.pow(_u(F.col("id"), 64), 3.0) * 560.0, 2)
        .alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(F.xxhash64("id", F.lit(65)), F.lit(100))
        ).alias("props"),
    )
    # documents: ~50-word texts over the 30-word vocab; ~3% of docs
    # are near-duplicate variants of a base doc (same seed, one word
    # replaced by 'dup') so the minhash/dedup workloads scale linearly
    # in real near-dup pairs, like the fixture's
    lang_pool = [l for l, w in _LANGS for _ in range(w)]
    words_arr = F.array(*[F.lit(w) for w in _DOC_WORDS])
    is_dup = F.pmod(F.xxhash64("id", F.lit(71)), F.lit(33)) == 0
    seed = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    n_words = (F.pmod(F.xxhash64(seed, F.lit(72)), F.lit(90)) + 8)
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words.cast("int")),
            lambda i: F.when(
                is_dup & (i == 3), F.lit("dup")
            ).otherwise(
                F.element_at(
                    words_arr,
                    (F.pmod(F.xxhash64(seed * 1000 + i, F.lit(73)),
                            F.lit(len(_DOC_WORDS))) + 1).cast("int"),
                )
            ),
        ),
        " ",
    )
    documents = spark.range(n["documents"]).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        _pick(seed, 74, lang_pool).alias("lang"),
        F.concat(
            F.lit("src"),
            F.pmod(F.xxhash64(seed, F.lit(75)), F.lit(20)).cast("string"),
        ).alias("source"),
        F.length(text).alias("n_chars"),
    )
    # embeddings: 64-dim floats clustered by label (10 centroids ±0.25,
    # per-point noise ±0.15) — the ANN/IVF workloads need real cluster
    # structure, not white noise
    label = F.pmod(F.xxhash64("id", F.lit(81)), F.lit(10)).cast("int")
    dim = F.sequence(F.lit(0), F.lit(63))
    embedding = F.transform(
        dim,
        lambda d: (
            (_u(label.cast("long") * 64 + d, 82) - 0.5) * 0.5
            + (_u(F.col("id") * 64 + d, 83) - 0.5) * 0.3
        ).cast("float"),
    )
    embeddings = spark.range(n["embeddings"]).select(
        F.col("id").alias("vec_id"),
        embedding.alias("embedding"),
        label.alias("label"),
    )
    return {
        "region": region, "nation": nation, "customer": customer,
        "supplier": supplier, "part": part, "orders": orders,
        "lineitem": lineitem, "events": events, "documents": documents,
        "embeddings": embeddings,
    }


def _gen_signature(sf: float) -> str:
    """Content hash of this generator + sf: editing distributions or
    row counts in this file invalidates cached corpora (review fix —
    a dir-keyed marker silently reused stale parquet after generator
    changes, the exact cross-round comparability hazard the bench
    flags elsewhere)."""
    import hashlib

    src = open(os.path.abspath(__file__), "rb").read()
    return hashlib.sha1(src + f"|{sf:g}".encode()).hexdigest()[:16]


def generate(spark: SparkSession, sf: float, outdir: str) -> str:
    """Write all tables under outdir (skips when the marker matches
    the current generator content + sf)."""
    sig = _gen_signature(sf)
    marker = os.path.join(outdir, "_GEN_OK")
    if os.path.exists(marker) and open(marker).read().strip() == sig:
        return outdir
    os.makedirs(outdir, exist_ok=True)
    par = spark.sparkContext.defaultParallelism or 8
    for name, df in build_tables(spark, sf).items():
        # data-proportional file count (mirrors load_views' fan-out
        # sizing): ~1 file per MiB estimate, capped at core count
        rows = {"region": 5, "nation": 25}.get(name)
        width = par if rows is None else 1
        df.repartition(width).write.mode("overwrite").parquet(
            os.path.join(outdir, f"{name}.parquet")
        )
    with open(marker, "w") as fh:
        fh.write(sig)
    return outdir


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = (
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join("/tmp", f"citus_spark_native_sf{sf:g}")
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from citus_spark.session import get_spark

    spark = get_spark("gen_sf")
    generate(spark, sf, outdir)
    import pyarrow.parquet as pq

    for t in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, t)
        if t.endswith(".parquet"):
            ds = pq.ParquetDataset(p)
            total = sum(
                frag.count_rows() for frag in ds.fragments
            )
            print(t, total)


if __name__ == "__main__":
    main()
