"""Textual DDL (plans/ddl_sql.py): the full reference-tutorial opening
sequence runs verbatim — CREATE EXTENSION, CREATE TABLE with PG types
and constraints, create_distributed_table, COPY, INSERT, CREATE
INDEX, DROP TABLE."""

import pytest

from citus_spark.session import DistributedSession


def test_tutorial_opening_sequence(spark, tmp_path):
    s = DistributedSession(spark)
    s.sql("CREATE EXTENSION citus;")
    s.sql(
        """
        CREATE TABLE companies (
          id bigint PRIMARY KEY,
          name text NOT NULL,
          price numeric(12,2) DEFAULT 0,
          score double precision,
          created_at timestamp with time zone,
          active boolean DEFAULT true,
          tags text[],
          meta jsonb
        );
        """
    )
    assert s.catalog.get("companies") is not None
    schema = dict(spark.table("companies").dtypes)
    assert schema["id"] == "bigint"
    assert schema["price"] == "decimal(12,2)"
    assert schema["score"] == "double"
    assert schema["created_at"] == "timestamp"
    assert schema["tags"] == "array<string>"
    assert schema["meta"] == "string"

    s.sql("SELECT create_distributed_table('companies', 'id')")
    s.sql(
        "INSERT INTO companies (id, name, price, active) VALUES "
        "(1, 'acme', 10.5, true), (2, 'globex', 20.0, false)"
    )
    s.sql("CREATE INDEX ON companies (name);")
    got = {r.id: (r.name, float(r.price), r.active)
           for r in spark.table("companies").collect()}
    assert got == {1: ("acme", 10.5, True), 2: ("globex", 20.0, False)}
    # no-op transaction control is accepted
    s.sql("BEGIN;")
    s.sql("COMMIT;")

    s.sql("DROP TABLE companies;")
    assert s.catalog.get("companies") is None
    with pytest.raises(Exception):
        spark.table("companies")
    # IF EXISTS variants
    s.sql("DROP TABLE IF EXISTS companies;")
    s.sql("CREATE TABLE IF NOT EXISTS t2 (k int); ")
    s.sql("CREATE TABLE IF NOT EXISTS t2 (k int); ")  # second = skip
    s.sql("DROP TABLE t2")


def test_create_table_rejects_unknown_type(spark):
    s = DistributedSession(spark)
    with pytest.raises(ValueError, match="unsupported PostgreSQL type"):
        s.sql("CREATE TABLE bad (g geometry)")


def test_table_constraints_skipped(spark):
    s = DistributedSession(spark)
    s.sql(
        """
        CREATE TABLE orders_ddl (
          id bigint,
          cust bigint REFERENCES companies (id),
          total numeric,
          PRIMARY KEY (id),
          UNIQUE (cust, id),
          CHECK (total >= 0)
        )
        """
    )
    assert dict(spark.table("orders_ddl").dtypes) == {
        "id": "bigint", "cust": "bigint", "total": "decimal(38,18)",
    }
    s.sql("DROP TABLE orders_ddl")
