"""Data-modifying CTEs (session._execute_modifying_cte ↔ reference
with_modifying.sql / with_dml.sql regress)."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_delete_returning_feeds_select(sess):
    sess.sql("CREATE TABLE mc1 (k int, v text)")
    sess.sql("INSERT INTO mc1 VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    out = sess.sql(
        "WITH gone AS (DELETE FROM mc1 WHERE k > 2 RETURNING k, v) "
        "SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS s FROM gone"
    ).collect()[0]
    assert out.n == 2 and out.s == 7
    # the delete really happened
    left = sess.sql("SELECT count(*) AS n FROM mc1").collect()[0].n
    assert left == 2


def test_update_returning_into_insert(sess):
    sess.sql("CREATE TABLE mc2 (k int, v int)")
    sess.sql("CREATE TABLE mc2_log (k int, v int)")
    sess.sql("INSERT INTO mc2 VALUES (1, 10), (2, 20)")
    sess.sql(
        "WITH bumped AS (UPDATE mc2 SET v = v + 1 WHERE k = 1 "
        "RETURNING k, v) INSERT INTO mc2_log SELECT k, v FROM bumped"
    )
    log = sess.sql("SELECT k, v FROM mc2_log").collect()
    assert len(log) == 1 and log[0].v == 11
    cur = {r.k: r.v for r in sess.sql("SELECT k, v FROM mc2").collect()}
    assert cur == {1: 11, 2: 20}


def test_mixed_plain_and_modifying_ctes(sess):
    sess.sql("CREATE TABLE mc3 (k int)")
    sess.sql("INSERT INTO mc3 VALUES (1), (2), (3)")
    out = sess.sql(
        "WITH doomed AS (DELETE FROM mc3 WHERE k = 3 RETURNING k), "
        "kept AS (SELECT k FROM mc3) "
        "SELECT (SELECT count(*) FROM doomed) AS n_deleted, "
        "(SELECT count(*) FROM kept) AS n_kept"
    ).collect()[0]
    assert out.n_deleted == 1
    # sequential-execution semantics: the plain CTE reads POST-delete
    assert out.n_kept == 2


def test_insert_returning_cte(sess):
    sess.sql("CREATE TABLE mc4 (k int, tag text)")
    out = sess.sql(
        "WITH ins AS (INSERT INTO mc4 VALUES (7,'x'), (8,'y') "
        "RETURNING k) SELECT CAST(sum(k) AS BIGINT) AS s FROM ins"
    ).collect()[0]
    assert out.s == 15
    assert sess.sql("SELECT count(*) AS n FROM mc4").collect()[0].n == 2


def test_plain_with_untouched(sess):
    # a non-modifying WITH that merely MENTIONS the word "update" in a
    # literal goes down the normal path
    out = sess.sql(
        "WITH t AS (SELECT 'update' AS w) SELECT w FROM t"
    ).collect()
    assert out[0].w == "update"


def test_modifying_cte_sees_earlier_plain_cte(sess):
    sess.sql("CREATE TABLE mc5 (k int)")
    sess.sql("CREATE TABLE mc5_arch (k int)")
    sess.sql("INSERT INTO mc5 VALUES (1), (5), (9)")
    sess.sql(
        "WITH src AS (SELECT k FROM mc5 WHERE k > 4), "
        "moved AS (INSERT INTO mc5_arch SELECT k FROM src RETURNING k) "
        "SELECT count(*) AS n FROM moved"
    )
    got = sorted(r.k for r in sess.sql("SELECT k FROM mc5_arch").collect())
    assert got == [5, 9]
    # CTE names are statement-scoped: no temp-view leak
    import pytest as _pt
    with _pt.raises(Exception):
        sess.spark.sql("SELECT * FROM moved").collect()
