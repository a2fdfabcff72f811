"""Big-endian codec round-trips, property-tested against struct.pack."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hbase_tohdfs_spark.functions import codec
from hbase_tohdfs_spark.model import UnknownDatatypeError


INT_EDGES = [0, 1, -1, 42, -42, 2**31 - 1, -(2**31), 123456789, -987654321]
LONG_EDGES = [0, 1, -1, 2**63 - 1, -(2**63), 2**40 + 7, -(2**40) - 7, 5, -5]


def test_decode_int_matches_struct_unpack(spark):
    df = spark.createDataFrame(
        [(struct.pack(">i", v),) for v in INT_EDGES], "b: binary"
    )
    got = [r[0] for r in df.select(codec.decode_int(F.col("b"))).collect()]
    assert got == INT_EDGES


def test_decode_long_matches_struct_unpack(spark):
    df = spark.createDataFrame(
        [(struct.pack(">q", v),) for v in LONG_EDGES], "b: binary"
    )
    got = [r[0] for r in df.select(codec.decode_long(F.col("b"))).collect()]
    assert got == LONG_EDGES


def test_encode_decode_roundtrip_int(spark):
    df = spark.createDataFrame([(v,) for v in INT_EDGES], "v: int")
    enc = df.select(codec.encode_int(F.col("v")).alias("b"), "v")
    raw = {r["v"]: bytes(r["b"]) for r in enc.collect()}
    for v in INT_EDGES:
        assert raw[v] == struct.pack(">i", v)
    back = enc.select(codec.decode_int(F.col("b")).alias("v2"), "v")
    assert all(r["v2"] == r["v"] for r in back.collect())


def test_encode_decode_roundtrip_long(spark):
    df = spark.createDataFrame([(v,) for v in LONG_EDGES], "v: long")
    enc = df.select(codec.encode_long(F.col("v")).alias("b"), "v")
    raw = {r["v"]: bytes(r["b"]) for r in enc.collect()}
    for v in LONG_EDGES:
        assert raw[v] == struct.pack(">q", v)
    back = enc.select(codec.decode_long(F.col("b")).alias("v2"), "v")
    assert all(r["v2"] == r["v"] for r in back.collect())


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=32))
@settings(max_examples=10, deadline=None)
def test_long_roundtrip_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v: long")
    back = df.select(
        "v", codec.decode_long(codec.encode_long(F.col("v"))).alias("v2")
    )
    assert all(r["v2"] == r["v"] for r in back.collect())


def test_unknown_datatype_fails_fast(spark):
    from pyspark.sql import types as T

    with pytest.raises(UnknownDatatypeError):
        codec.decode_as(F.col("x"), T.DoubleType())


def test_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "b: binary")
    assert df.select(codec.decode_int(F.col("b"))).collect()[0][0] is None
    assert df.select(codec.decode_long(F.col("b"))).collect()[0][0] is None
