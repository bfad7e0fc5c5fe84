"""Schema-based sharding (↔ reference schema_based_sharding.sql /
Citus 12 tenant-per-schema model): CREATE SCHEMA, schema-qualified
names (mangled to view spellings — Spark temp views carry no dots),
citus_schema_distribute/undistribute, the citus_schemas view, and
DROP SCHEMA CASCADE."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_tenant_schema_lifecycle(sess):
    sess.sql("SET citus.enable_schema_based_sharding TO ON")
    sess.sql("CREATE SCHEMA tenant_a")
    sess.sql("CREATE SCHEMA tenant_b")
    sess.sql("CREATE TABLE tenant_a.users (id int, name text)")
    sess.sql("CREATE TABLE tenant_b.users (id int, name text)")
    sess.sql("INSERT INTO tenant_a.users VALUES (1, 'alice'), (2, 'ann')")
    sess.sql("INSERT INTO tenant_b.users VALUES (1, 'bob')")
    # same-named tables are isolated per schema
    a = sess.sql("SELECT count(*) AS n FROM tenant_a.users").collect()[0].n
    b = sess.sql("SELECT count(*) AS n FROM tenant_b.users").collect()[0].n
    assert (a, b) == (2, 1)
    # cross-schema query
    both = sess.sql(
        "SELECT count(*) AS n FROM (SELECT id FROM tenant_a.users "
        "UNION ALL SELECT id FROM tenant_b.users) t"
    ).collect()[0].n
    assert both == 3
    # each sharded schema has its own colocation group
    rows = sess.sql(
        "SELECT schema_name, colocation_id FROM citus_schemas "
        "ORDER BY schema_name"
    ).collect()
    assert [r.schema_name for r in rows] == ["tenant_a", "tenant_b"]
    assert rows[0].colocation_id != rows[1].colocation_id
    # CASCADE drops the member tables
    with pytest.raises(ValueError, match="not empty"):
        sess.sql("DROP SCHEMA tenant_a")
    sess.sql("DROP SCHEMA tenant_a CASCADE")
    with pytest.raises(Exception):
        sess.sql("SELECT * FROM tenant_a.users").collect()


def test_schema_distribute_undistribute(sess):
    sess.sql("CREATE SCHEMA plain_s")  # sharding GUC off: regular
    assert sess.sql("SELECT count(*) AS n FROM citus_schemas").collect()[
        0
    ].n == 0
    sess.sql("SELECT citus_schema_distribute('plain_s')")
    rows = sess.sql("SELECT schema_name FROM citus_schemas").collect()
    assert [r.schema_name for r in rows] == ["plain_s"]
    sess.sql("SELECT citus_schema_undistribute('plain_s')")
    assert sess.sql("SELECT count(*) AS n FROM citus_schemas").collect()[
        0
    ].n == 0


def test_public_prefix_and_literals(sess):
    sess.sql("CREATE SCHEMA lit_s")
    # public.<t> resolves to the unqualified catalog
    n = sess.sql("SELECT count(*) AS n FROM public.orders").collect()[0].n
    assert n > 0
    # a literal containing a qualified name is untouched
    s = sess.sql("SELECT 'lit_s.users' AS s FROM orders LIMIT 1").collect()
    assert s[0].s == "lit_s.users"


def test_grant_revoke_noops(sess):
    out = sess.sql(
        "GRANT SELECT ON ALL TABLES IN SCHEMA public TO analyst"
    ).collect()[0][0]
    assert "no-op" in out
    out = sess.sql("REVOKE ALL ON orders FROM analyst").collect()[0][0]
    assert "no-op" in out
    out = sess.sql("CREATE ROLE analyst WITH LOGIN").collect()[0][0]
    assert "no-op" in out
