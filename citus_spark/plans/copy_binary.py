"""PostgreSQL binary COPY format — reader + writer.

↔ reference commands/multi_copy.c: Citus's COPY accepts
`WITH (FORMAT binary)` and speaks the publicly documented PG binary
COPY wire format (PostgreSQL docs, "Binary Format"):

  header   : 11-byte signature  PGCOPY\\n \\377 \\r \\n \\0
             int32 flags (bit 16 = OIDs included, deprecated)
             int32 header-extension length (+ that many bytes)
  tuple    : int16 field count, then per field
             int32 byte length (-1 = NULL) + that many data bytes
  trailer  : int16 = -1

All integers are network byte order. Per-field encodings are the
types' binary send/recv formats: int2/4/8 and float4/8 big-endian,
text/bytea raw bytes, bool one byte, date int32 days since
2000-01-01, timestamp int64 microseconds since 2000-01-01.

Scale posture: the format carries NO record-boundary sync markers, so
a single binary file is inherently unsplittable — exactly like the
reference, where COPY TO/FROM binary streams through one coordinator
connection. The reader therefore parallelizes across FILES (glob →
one task per file via binaryFile + mapInPandas); the writer streams
partition-ordered batches through the driver (the coordinator-stream
analog). For cluster-scale ingest, CSV/JSONL/parquet remain the
splittable paths.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SIGNATURE = b"PGCOPY\n\xff\r\n\x00"
_PG_EPOCH_DATE = date(2000, 1, 1)
_PG_EPOCH_TS = datetime(2000, 1, 1)

_SUPPORTED = (
    T.LongType, T.IntegerType, T.ShortType, T.DoubleType, T.FloatType,
    T.StringType, T.BooleanType, T.BinaryType, T.DateType,
    T.TimestampType, T.TimestampNTZType,
)


def _check_schema(schema: T.StructType) -> None:
    for f in schema.fields:
        if not isinstance(f.dataType, _SUPPORTED):
            raise ValueError(
                f"COPY binary: unsupported column type "
                f"{f.dataType.simpleString()} for {f.name!r} (supported: "
                "int2/4/8, float4/8, text, bool, bytea, date, timestamp)"
            )


def _encode_field(val, dt) -> bytes:
    if val is None:
        return struct.pack("!i", -1)
    if isinstance(dt, T.LongType):
        body = struct.pack("!q", int(val))
    elif isinstance(dt, T.IntegerType):
        body = struct.pack("!i", int(val))
    elif isinstance(dt, T.ShortType):
        body = struct.pack("!h", int(val))
    elif isinstance(dt, T.DoubleType):
        body = struct.pack("!d", float(val))
    elif isinstance(dt, T.FloatType):
        body = struct.pack("!f", float(val))
    elif isinstance(dt, T.BooleanType):
        body = b"\x01" if val else b"\x00"
    elif isinstance(dt, T.BinaryType):
        body = bytes(val)
    elif isinstance(dt, T.StringType):
        body = str(val).encode("utf-8")
    elif isinstance(dt, T.DateType):
        body = struct.pack("!i", (val - _PG_EPOCH_DATE).days)
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        naive = val.replace(tzinfo=None) if val.tzinfo else val
        delta = naive - _PG_EPOCH_TS
        micros = (delta.days * 86400 + delta.seconds) * 1_000_000 + (
            delta.microseconds
        )
        body = struct.pack("!q", micros)
    else:  # pragma: no cover — _check_schema guards
        raise ValueError(f"unsupported type {dt}")
    return struct.pack("!i", len(body)) + body


def _decode_field(body: bytes, dt):
    if isinstance(dt, T.LongType):
        return struct.unpack("!q", body)[0]
    if isinstance(dt, T.IntegerType):
        return struct.unpack("!i", body)[0]
    if isinstance(dt, T.ShortType):
        return struct.unpack("!h", body)[0]
    if isinstance(dt, T.DoubleType):
        return struct.unpack("!d", body)[0]
    if isinstance(dt, T.FloatType):
        return struct.unpack("!f", body)[0]
    if isinstance(dt, T.BooleanType):
        return body != b"\x00"
    if isinstance(dt, T.BinaryType):
        return bytes(body)
    if isinstance(dt, T.StringType):
        return body.decode("utf-8")
    if isinstance(dt, T.DateType):
        return _PG_EPOCH_DATE + timedelta(days=struct.unpack("!i", body)[0])
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return _PG_EPOCH_TS + timedelta(
            microseconds=struct.unpack("!q", body)[0]
        )
    raise ValueError(f"unsupported type {dt}")


def decode_stream(data: bytes, schema: T.StructType) -> list[tuple]:
    """Decode one complete binary COPY stream into row tuples,
    validating signature, field counts, and the trailer — malformed
    input raises (PG COPY rejects, never NULL-fills)."""
    _check_schema(schema)
    if not data.startswith(SIGNATURE):
        raise ValueError("COPY binary: bad signature")
    pos = len(SIGNATURE)
    flags, ext_len = struct.unpack_from("!ii", data, pos)
    pos += 8 + ext_len
    # spec: bits 16-31 are critical (reject unknown), bits 0-15 are
    # backwards-compatible and must be IGNORED; bit 16 = OIDs included
    # (pre-PG12 dumps) — each tuple then leads with an extra OID field
    # that is not a column
    if flags & 0xFFFF0000 & ~(1 << 16):
        raise ValueError(f"COPY binary: unknown header flags {flags:#x}")
    has_oids = bool(flags & (1 << 16))
    n_fields_expected = len(schema.fields)
    rows: list[tuple] = []
    while True:
        (n_fields,) = struct.unpack_from("!h", data, pos)
        pos += 2
        if n_fields == -1:
            break  # trailer
        if has_oids:
            # a normal field, but NOT included in the field count
            (oid_len,) = struct.unpack_from("!i", data, pos)
            pos += 4 + max(0, oid_len)
        if n_fields != n_fields_expected:
            raise ValueError(
                f"COPY binary: tuple has {n_fields} fields, "
                f"target has {n_fields_expected}"
            )
        vals = []
        for f in schema.fields:
            (ln,) = struct.unpack_from("!i", data, pos)
            pos += 4
            if ln == -1:
                vals.append(None)
            else:
                vals.append(_decode_field(data[pos : pos + ln], f.dataType))
                pos += ln
        rows.append(tuple(vals))
    if pos != len(data):
        raise ValueError("COPY binary: trailing bytes after trailer")
    return rows


def encode_rows(rows, schema: T.StructType, *, header: bool = True,
                trailer: bool = True) -> bytes:
    """Encode row tuples as a binary COPY stream (header/trailer
    optional so partition chunks can concatenate)."""
    _check_schema(schema)
    out = bytearray()
    if header:
        out += SIGNATURE
        out += struct.pack("!ii", 0, 0)
    n = len(schema.fields)
    dts = [f.dataType for f in schema.fields]
    for row in rows:
        out += struct.pack("!h", n)
        for val, dt in zip(row, dts):
            out += _encode_field(val, dt)
    if trailer:
        out += struct.pack("!h", -1)
    return bytes(out)


def read_pgcopy_binary(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Distributed read of binary COPY file(s): one task per FILE
    (binaryFile source + mapInPandas — the format is unsplittable
    within a file, see module docstring), decoding against the target
    schema. `path` may be a glob."""
    import pandas as pd

    names = [f.name for f in schema.fields]
    # normalize tz-capable types for pandas transport
    _check_schema(schema)

    def kernel(batches):
        for pdf in batches:
            for _, file_row in pdf.iterrows():
                rows = decode_stream(bytes(file_row["content"]), schema)
                yield pd.DataFrame(rows, columns=names, dtype=object)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(kernel, schema=schema)


def write_pgcopy_binary(df: DataFrame, path: str) -> int:
    """Stream `df` to one binary COPY file through the driver (the
    reference's COPY TO likewise funnels the stream through the
    coordinator connection). Returns the row count."""
    schema = df.schema
    _check_schema(schema)
    n = 0
    with open(path, "wb") as fh:
        fh.write(SIGNATURE + struct.pack("!ii", 0, 0))
        for row in df.toLocalIterator():
            fh.write(encode_rows([tuple(row)], schema,
                                 header=False, trailer=False))
            n += 1
        fh.write(struct.pack("!h", -1))
    return n
