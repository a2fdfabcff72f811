"""HBase byte-encoding codecs as JVM-side column expressions.

The reference decodes cell values with ``Bytes.toString`` / ``Bytes.toInt``
/ ``Bytes.toLong`` — UTF-8 strings and big-endian fixed-width integers
(``ExportHBaseTableToAvro.java:199-209``, ``ExportHBaseTableToParquet.java:
189-199``).  Spark has no ``cast(binary as int)``, so we build the decode
out of ``hex``/``conv``/``shiftleft`` — all whole-stage-codegen'd built-ins;
no Python UDF in the hot path.

Sign handling: ``conv(hex, 16, 10)`` yields the *unsigned* value as a
decimal string.  For 4-byte ints we subtract 2^32 when the sign bit is set;
for 8-byte longs we reassemble from two 4-byte halves with ``shiftleft``,
whose bit-wrap gives exact two's-complement semantics even under ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hbase_tohdfs_spark.model import UnknownDatatypeError


def decode_string(col: Column) -> Column:
    """``Bytes.toString`` — UTF-8 decode (binary -> string cast)."""
    return col.cast("string")


def decode_int(col: Column) -> Column:
    """``Bytes.toInt`` — 4-byte big-endian signed int."""
    unsigned = F.conv(F.hex(col), 16, 10).cast("long")
    signed = F.when(unsigned >= F.lit(1 << 31), unsigned - F.lit(1 << 32)).otherwise(
        unsigned
    )
    # Null-safe: conv(NULL) is NULL and propagates.
    return signed.cast("int")


def decode_long(col: Column) -> Column:
    """``Bytes.toLong`` — 8-byte big-endian signed long.

    Reassembled from two unsigned 32-bit halves; ``shiftleft`` wraps bits,
    which is exactly two's complement (no ANSI overflow error).
    """
    hi = F.conv(F.hex(F.substring(col, 1, 4)), 16, 10).cast("long")
    lo = F.conv(F.hex(F.substring(col, 5, 4)), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def encode_string(col: Column) -> Column:
    """``Bytes.toBytes(String)`` — UTF-8 encode."""
    return col.cast("binary")


def encode_int(col: Column) -> Column:
    """int -> 4-byte big-endian binary (inverse of :func:`decode_int`)."""
    # hex(long) is the full two's-complement 16 hex digits for negatives;
    # keep the low 8 digits = the 4-byte representation.
    h = F.lpad(F.hex(col.cast("long")), 16, "0")
    return F.unhex(F.substring(h, 9, 8))


def encode_long(col: Column) -> Column:
    """long -> 8-byte big-endian binary (inverse of :func:`decode_long`)."""
    return F.unhex(F.lpad(F.hex(col), 16, "0"))


def decode_as(col: Column, dtype: T.DataType) -> Column:
    """Decode a binary cell value per the export-schema field type.

    Mirrors ``putValue`` (``ExportHBaseTableToAvro.java:199-209``):
    string/int/long are decoded, anything else fails fast with the
    reference's `Unknown datatype` semantics.
    """
    if isinstance(dtype, T.StringType):
        return decode_string(col)
    if isinstance(dtype, T.IntegerType):
        return decode_int(col)
    if isinstance(dtype, T.LongType):
        return decode_long(col)
    raise UnknownDatatypeError(f"Unknown datatype {dtype.simpleString().upper()}")


def encode_as(col: Column, dtype: T.DataType) -> Column:
    """Typed value -> HBase byte encoding (generator / ingest side)."""
    if isinstance(dtype, T.StringType):
        return encode_string(col)
    if isinstance(dtype, T.IntegerType):
        return encode_int(col)
    if isinstance(dtype, T.LongType):
        return encode_long(col)
    raise UnknownDatatypeError(f"Unknown datatype {dtype.simpleString().upper()}")
