"""JSON_TABLE subset (plans/json_table.py) — flat COLUMNS with PATH /
FOR ORDINALITY over the pg17_json.sql shapes; NESTED/EXISTS reject."""

import pytest

from citus_spark.session import DistributedSession

_DOC1 = (
    '{ "favorites" : ['
    '{ "kind" : "comedy", "score": 7 },'
    '{ "kind" : "horror", "score": 9 } ] }'
)
_DOC2 = '{ "favorites" : [ { "kind" : "drama", "score": 5 } ] }'


@pytest.fixture()
def films(spark):
    s = DistributedSession(spark)
    s.sql("DROP TABLE IF EXISTS jt_films")
    s.sql("CREATE TABLE jt_films (id bigint, js text)")
    s.sql(f"INSERT INTO jt_films VALUES (1, '{_DOC1}'), (2, '{_DOC2}')")
    return s


def test_json_table_basic(films):
    r = films.sql(
        """
SELECT jt_films.id, jt.ord, jt.kind, jt.score FROM
 jt_films,
 JSON_TABLE ( js, '$.favorites[*]' COLUMNS (
   ord FOR ORDINALITY,
   kind text PATH '$.kind',
   score int PATH '$.score')) AS jt
 ORDER BY 1, 2
"""
    ).collect()
    assert [tuple(x) for x in r] == [
        (1, 1, "comedy", 7),
        (1, 2, "horror", 9),
        (2, 1, "drama", 5),
    ]


def test_json_table_default_path_and_where(films):
    r = films.sql(
        """
SELECT jt.kind FROM jt_films,
 JSON_TABLE ( js, '$.favorites[*]' COLUMNS (kind text)) AS jt
 WHERE jt_films.id = 1 ORDER BY 1
"""
    ).collect()
    assert [x.kind for x in r] == ["comedy", "horror"]


def test_json_table_root_array(films):
    films.sql("DROP TABLE IF EXISTS jt_arr")
    films.sql("CREATE TABLE jt_arr (id bigint, js text)")
    films.sql(
        "INSERT INTO jt_arr VALUES (1, '[{\"v\": 10}, {\"v\": 20}]')"
    )
    r = films.sql(
        "SELECT jt.ord, jt.v FROM jt_arr, JSON_TABLE (js, '$' COLUMNS "
        "(ord FOR ORDINALITY, v bigint PATH '$.v')) AS jt ORDER BY 1"
    ).collect()
    assert [tuple(x) for x in r] == [(1, 10), (2, 20)]


def test_json_table_rejects_unsupported(films):
    with pytest.raises(NotImplementedError, match="NESTED"):
        films.sql(
            """
SELECT jt.* FROM jt_films, JSON_TABLE (js, '$.favorites[*]' COLUMNS (
  kind text PATH '$.kind',
  NESTED PATH '$.films[*]' COLUMNS (title text PATH '$.title'))) AS jt
"""
        )
    with pytest.raises(NotImplementedError, match="EXISTS"):
        films.sql(
            "SELECT jt.* FROM jt_films, JSON_TABLE (js, "
            "'$.favorites[*]' COLUMNS (has_kind int EXISTS PATH "
            "'$.kind')) AS jt"
        )
    with pytest.raises(NotImplementedError, match="path"):
        films.sql(
            "SELECT jt.* FROM jt_films, JSON_TABLE (js, "
            "'$.favorites' COLUMNS (kind text)) AS jt"
        )


def test_json_table_in_lateral_subquery(films):
    """pg17_json.sql:66-71: JSON_TABLE inside an explicit LATERAL
    subquery."""
    r = films.sql(
        """
SELECT sub.* FROM jt_films,
  lateral(SELECT * FROM JSON_TABLE (js, '$.favorites[*]' COLUMNS (
    ord FOR ORDINALITY, kind text PATH '$.kind')) AS jt) AS sub
WHERE jt_films.id = 1 ORDER BY 1
"""
    ).collect()
    assert [tuple(x) for x in r] == [(1, "comedy"), (2, "horror")]


def test_json_table_keyword_like_names_allowed(films):
    """Columns/paths that merely CONTAIN rejected keywords are fine
    (review fix: nested_id / exists_flag / '$.plan[*]' were
    rejected)."""
    films.sql("DROP TABLE IF EXISTS jt_kw")
    films.sql("CREATE TABLE jt_kw (js text)")
    films.sql(
        "INSERT INTO jt_kw VALUES ('[{\"nested_id\": 1, "
        "\"exists_flag\": 2}]')"
    )
    r = films.sql(
        "SELECT jt.nested_id, jt.exists_flag FROM jt_kw, "
        "JSON_TABLE (js, '$' COLUMNS (nested_id int, "
        "exists_flag int)) AS jt"
    ).collect()
    assert [tuple(x) for x in r] == [(1, 2)]
    films.sql("DROP TABLE IF EXISTS jt_plan")
    films.sql("CREATE TABLE jt_plan (js text)")
    films.sql("INSERT INTO jt_plan VALUES ('{\"plan\": [{\"v\": 3}]}')")
    r2 = films.sql(
        "SELECT jt.v FROM jt_plan, JSON_TABLE (js, '$.plan[*]' "
        "COLUMNS (v int)) AS jt"
    ).collect()
    assert [x.v for x in r2] == [3]
