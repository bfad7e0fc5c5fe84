"""isolate_tenant_to_new_shard (↔ reference shard_split.c): the
isolated tenant must get its own storage partition, single-tenant
statements must route to it (partition pruning in the physical plan),
every other query must see unchanged values, and the colocation-group
CASCADE contract must hold."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark, tmp_path):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    df = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    from citus_spark.queries import normalize_events_ts

    df = normalize_events_ts(df)
    path = str(tmp_path / "ev")
    df.write.parquet(path)
    s.create_distributed_table(
        "iso_events", spark.read.parquet(path), "user_id", buckets=8
    )
    s.catalog.get("iso_events").path = path
    return s


def test_isolation_layout_and_routing(sess):
    before = sess.sql(
        "SELECT count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) "
        "AS DOUBLE) AS s FROM iso_events"
    ).collect()[0]
    tenant_rows = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE user_id = 7"
    ).collect()[0].n
    assert tenant_rows > 0

    sid = sess.isolate_tenant_to_new_shard("iso_events", 7)
    assert sid >= 104000

    # values unchanged for non-routed queries
    after = sess.sql(
        "SELECT count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) "
        "AS DOUBLE) AS s FROM iso_events"
    ).collect()[0]
    assert (before.n, before.s) == (after.n, after.s)

    # single-tenant statement routes: partition filter reaches the scan
    routed = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE user_id = 7"
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.split("\n") if "FileScan" in l)
    pf = scan.split("PartitionFilters")[1].split("]")[0]
    assert "__citus_shard" in pf
    assert routed.collect()[0].n == tenant_rows

    # citus_shards reports the isolated shard with the tenant's rows
    shard_row = [
        r for r in sess.citus_shards().collect() if r.shardid == sid
    ]
    assert len(shard_row) == 1
    assert shard_row[0].shard_rows == tenant_rows

    # idempotent re-run keeps the same id
    assert sess.isolate_tenant_to_new_shard("iso_events", 7) == sid


def test_routing_is_conservative(sess):
    sess.isolate_tenant_to_new_shard("iso_events", 7)
    # a disjunction may reach other shards — must NOT route
    n_or = sess.sql(
        "SELECT count(*) AS n FROM iso_events "
        "WHERE user_id = 7 OR user_id = 8"
    ).collect()[0].n
    n_both = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE user_id IN (7, 8)"
    ).collect()[0].n
    assert n_or == n_both
    # a string literal mentioning the predicate must not trigger routing
    n_lit = sess.sql(
        "SELECT count(*) AS n FROM iso_events "
        "WHERE event_type <> 'user_id = 7'"
    ).collect()[0].n
    assert n_lit == sess.sql(
        "SELECT count(*) AS n FROM iso_events"
    ).collect()[0].n


def test_cascade_contract(sess, spark, tmp_path):
    # colocate a second table with iso_events
    df = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "user_id", "event_id"
    )
    p2 = str(tmp_path / "ev2")
    df.write.parquet(p2)
    sess.create_distributed_table(
        "iso_events2",
        spark.read.parquet(p2),
        "user_id",
        buckets=8,
        colocate_with="iso_events",
    )
    sess.catalog.get("iso_events2").path = p2
    with pytest.raises(ValueError, match="colocated"):
        sess.isolate_tenant_to_new_shard("iso_events", 7)
    sid = sess.isolate_tenant_to_new_shard(
        "iso_events", 7, cascade_option="CASCADE"
    )
    assert sid >= 104000
    # the colocated member is isolated too (its own shard id)
    iso2 = sess.catalog.get("iso_events2").isolated
    assert "7" in iso2 and iso2["7"] != sid


def test_sql_spelling(sess):
    out = sess.sql(
        "SELECT isolate_tenant_to_new_shard('iso_events', 7)"
    ).collect()
    assert out[0][0] >= 104000


def test_routing_requires_predicate_ownership(sess, spark, tmp_path):
    """A dist-col equality that restricts a DIFFERENT relation (join
    side, subquery) must not narrow the isolated table's scan."""
    sess.isolate_tenant_to_new_shard("iso_events", 7)
    other = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", "user_id"
    )
    other.createOrReplaceTempView("iso_other")
    total = sess.sql("SELECT count(*) AS n FROM iso_events").collect()[0].n
    # join: the other side's predicate names user_id = 7
    n_join = sess.sql(
        "SELECT count(*) AS n FROM iso_events e "
        "JOIN iso_other o ON e.event_id = o.event_id "
        "WHERE o.user_id = 7"
    ).collect()[0].n
    want_join = spark.sql(
        "SELECT count(*) AS n FROM iso_events e "
        "JOIN iso_other o ON e.event_id = o.event_id "
        "WHERE o.user_id = 7"
    ).collect()[0].n
    assert n_join == want_join
    # subquery restricting the other table
    n_sub = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE event_id IN "
        "(SELECT event_id FROM iso_other WHERE user_id = 7)"
    ).collect()[0].n
    assert 0 < n_sub <= total
    want_sub = spark.sql(
        "SELECT count(*) AS n FROM iso_events WHERE event_id IN "
        "(SELECT event_id FROM iso_other WHERE user_id = 7)"
    ).collect()[0].n
    assert n_sub == want_sub


def test_routing_respects_polarity_and_literal_boundary(sess):
    sess.isolate_tenant_to_new_shard("iso_events", 7)
    total = sess.sql("SELECT count(*) AS n FROM iso_events").collect()[0].n
    t7 = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE user_id = 7"
    ).collect()[0].n
    # negation must NOT route
    n_not = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE NOT user_id = 7"
    ).collect()[0].n
    assert n_not == total - t7
    # CASE over the predicate must NOT route
    row = sess.sql(
        "SELECT count(*) AS n, "
        "sum(CASE WHEN user_id = 7 THEN 1 ELSE 0 END) AS t "
        "FROM iso_events"
    ).collect()[0]
    assert row.n == total and row.t == t7
    # `= 7` must not swallow `= 7.5` (no user has 7.5 → count 0,
    # not the tenant's rows)
    n_frac = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE user_id = 7.5"
    ).collect()[0].n
    assert n_frac == 0


def test_cascade_with_explicit_path_uses_subdirs(sess, spark, tmp_path):
    df = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "user_id", "event_id"
    )
    p2 = str(tmp_path / "ev2")
    df.write.parquet(p2)
    sess.create_distributed_table(
        "iso_events2", spark.read.parquet(p2), "user_id",
        buckets=8, colocate_with="iso_events",
    )
    sess.catalog.get("iso_events2").path = p2
    dest = str(tmp_path / "iso_dest")
    sess.isolate_tenant_to_new_shard(
        "iso_events", 7, cascade_option="CASCADE", path=dest
    )
    # both members keep their own (different-schema) data
    c1 = sess.sql("SELECT * FROM iso_events LIMIT 1").columns
    c2 = sess.sql("SELECT * FROM iso_events2 LIMIT 1").columns
    assert "event_type" in c1 and c2 == ["user_id", "event_id"]
    import glob
    import os

    assert glob.glob(os.path.join(dest, "iso_events_*"))
    assert glob.glob(os.path.join(dest, "iso_events2_*"))
    # a SECOND isolation with the same explicit path must not
    # overwrite the directory the first registration reads
    sess.isolate_tenant_to_new_shard(
        "iso_events", 9, cascade_option="CASCADE", path=dest
    )
    n7 = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE user_id = 7"
    ).collect()[0].n
    assert n7 > 0


def test_routing_rejects_comma_join_and_operator_forms(sess, spark):
    sess.isolate_tenant_to_new_shard("iso_events", 7)
    other = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        F.col("event_id").alias("oid"), F.col("user_id").alias("ouid")
    )
    other.createOrReplaceTempView("iso_other2")
    total = sess.sql("SELECT count(*) AS n FROM iso_events").collect()[0].n
    t7 = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE user_id = 7"
    ).collect()[0].n
    # comma-list join: other side's predicate must not narrow the scan
    n_comma = sess.sql(
        "SELECT count(*) AS n FROM iso_events e, iso_other2 o "
        "WHERE e.event_id = o.oid AND o.ouid = 7"
    ).collect()[0].n
    want = spark.sql(
        "SELECT count(*) AS n FROM iso_events e JOIN iso_other2 o "
        "ON e.event_id = o.oid WHERE o.ouid = 7"
    ).collect()[0].n
    assert n_comma == want
    # ! prefix and IS FALSE invert the equality — must not route
    n_bang = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE ! (user_id = 7)"
    ).collect()[0].n
    assert n_bang == total - t7
    n_isf = sess.sql(
        "SELECT count(*) AS n FROM iso_events WHERE (user_id = 7) IS FALSE"
    ).collect()[0].n
    assert n_isf == total - t7


def test_routing_rejects_struct_qualifier(sess, spark, tmp_path):
    # a table whose dist col name also appears as a struct FIELD:
    # profile.user_id = 7 must not be taken as the dist-col equality
    df = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select(
            "event_id",
            "user_id",
            F.struct((F.col("user_id") + 1).alias("user_id")).alias(
                "profile"
            ),
        )
    )
    p = str(tmp_path / "evs")
    df.write.parquet(p)
    sess.create_distributed_table(
        "iso_struct", spark.read.parquet(p), "user_id", buckets=8
    )
    sess.catalog.get("iso_struct").path = p
    sess.isolate_tenant_to_new_shard("iso_struct", 7)
    n = sess.sql(
        "SELECT count(*) AS n FROM iso_struct WHERE profile.user_id = 7"
    ).collect()[0].n
    want = spark.sql(
        "SELECT count(*) AS n FROM iso_struct WHERE profile.user_id = 7"
    ).collect()[0].n
    assert n == want  # rows with top-level user_id = 6, NOT tenant 7
    # the table-qualified spelling still routes
    routed = sess.sql(
        "SELECT count(*) AS n FROM iso_struct WHERE iso_struct.user_id = 7"
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "__citus_shard" in plan


def test_string_to_table_rejects_exotic_escapes(sess):
    import pytest as _pt

    with _pt.raises(Exception, match="unsupported escape"):
        sess.sql(r"SELECT p FROM string_to_table('axb', '\b') AS t(p)")
