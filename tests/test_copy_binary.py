"""PG binary COPY format (plans/copy_binary.py ↔ reference
multi_copy.c accepting WITH (FORMAT binary); wire format from the
public PostgreSQL COPY docs). Roundtrip against the csv path, NULL
handling, malformed-input rejection, and the front-door spelling."""

import struct

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _sess(spark):
    from citus_spark.session import DistributedSession

    s = DistributedSession(spark)
    s.load_tables(SF_SMALL)
    return s


def test_roundtrip_all_supported_types(spark, tmp_path):
    from citus_spark.plans.copy_binary import (
        read_pgcopy_binary,
        write_pgcopy_binary,
    )

    df = spark.sql(
        """
        SELECT CAST(id AS BIGINT) AS i8, CAST(id AS INT) AS i4,
               CAST(id AS SMALLINT) AS i2,
               CAST(id * 1.5 AS DOUBLE) AS f8,
               CAST(id * 0.5 AS FLOAT) AS f4,
               concat('row-', id, ' ü™') AS s,
               id % 2 = 0 AS b,
               CAST(concat('bin', id) AS BINARY) AS by,
               date_add(DATE'1999-12-30', CAST(id AS INT)) AS d,
               timestamp'2024-06-01 12:34:56.789' + make_interval(0,0,0,0,0,0,id) AS ts,
               CASE WHEN id = 3 THEN NULL ELSE id END AS maybe_null
        FROM range(6)
        """
    )
    out = str(tmp_path / "t.pgcopy")
    n = write_pgcopy_binary(df, out)
    assert n == 6
    back = read_pgcopy_binary(spark, out, df.schema)
    a = sorted(map(repr, (tuple(r) for r in df.collect())))
    b = sorted(map(repr, (tuple(r) for r in back.collect())))
    assert a == b


def test_front_door_roundtrip_vs_csv(spark, tmp_path):
    sess = _sess(spark)
    src = tmp_path / "cust_src"
    spark.table("customer").write.parquet(str(src))
    spark.read.parquet(str(src)).createOrReplaceTempView("cust_bin")
    sess.catalog.register("cust_bin", "hash", "c_custkey", path=str(src))
    n0 = spark.table("cust_bin").count()

    binfile = tmp_path / "cust.pgcopy"
    out = sess.sql(f"COPY cust_bin TO '{binfile}' WITH (FORMAT binary)")
    assert out.collect()[0].copied == n0
    # header bytes are the spec'd signature
    assert binfile.read_bytes()[:11] == b"PGCOPY\n\xff\r\n\x00"

    out = sess.sql(f"COPY cust_bin FROM '{binfile}' WITH (FORMAT binary)")
    assert out.collect()[0].copied == n0
    assert spark.table("cust_bin").count() == 2 * n0
    # the appended copy is value-identical: every key now appears twice
    dup = (
        spark.table("cust_bin").groupBy("c_custkey").count()
        .filter(F.col("count") != 2).count()
    )
    assert dup == 0


def test_malformed_rejected(spark, tmp_path):
    from citus_spark.plans.copy_binary import decode_stream, encode_rows

    schema = spark.sql("SELECT 1 AS a").schema
    good = encode_rows([(1,)], schema)
    with pytest.raises(ValueError, match="signature"):
        decode_stream(b"NOTPGCOPY" + good, schema)
    # field-count mismatch
    bad = bytearray(good)
    off = 11 + 8  # signature + flags/ext
    struct.pack_into("!h", bad, off, 5)
    with pytest.raises(ValueError, match="fields"):
        decode_stream(bytes(bad), schema)
    # unsupported column type rejected loudly
    arr_schema = spark.sql("SELECT array(1,2) AS a").schema
    with pytest.raises(ValueError, match="unsupported column type"):
        encode_rows([([1, 2],)], arr_schema)


def test_with_oids_stream_and_ignorable_flags(spark, tmp_path):
    """Pre-PG12 WITH OIDS dumps carry a per-tuple OID field not
    counted in the field count; bits 0-15 of the header flags are
    backwards-compatible and must be ignored."""
    import struct as st

    from citus_spark.plans.copy_binary import (
        SIGNATURE,
        decode_stream,
        encode_rows,
    )

    schema = spark.sql("SELECT 1 AS a, 'x' AS b").schema
    body = encode_rows([(5, "hi"), (6, "yo")], schema, header=False,
                       trailer=False)
    # inject an OID field (len 4 + oid bytes) before each tuple's cols
    out = bytearray(SIGNATURE + st.pack("!ii", (1 << 16) | 0x7, 0))
    pos = 0
    while pos < len(body):
        (n_fields,) = st.unpack_from("!h", body, pos)
        out += st.pack("!h", n_fields) + st.pack("!ii", 4, 12345)
        pos += 2
        for _ in range(n_fields):
            (ln,) = st.unpack_from("!i", body, pos)
            out += body[pos : pos + 4 + max(0, ln)]
            pos += 4 + max(0, ln)
    out += st.pack("!h", -1)
    rows = decode_stream(bytes(out), schema)
    assert rows == [(5, "hi"), (6, "yo")]
