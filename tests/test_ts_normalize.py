"""Regression tests for the round-3 failure mode: events.ts arriving with
a different parquet storage type after testdata regeneration.  The same
wall-clock instants must come out as identical TimestampType values
whether the file stored long nanos, TIMESTAMP_NTZ micros, or TIMESTAMP."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hbase_tohdfs_spark.session import ensure_utc, normalize_event_ts

INSTANTS = [
    dt.datetime(2024, 1, 1, 10, 0, 0, 123456),
    dt.datetime(2024, 6, 30, 23, 59, 59, 999999),
    dt.datetime(1999, 12, 31, 0, 0, 1),
]


def _expected_micros():
    return [
        int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        for t in INSTANTS
    ]


@pytest.fixture(autouse=True)
def _utc(spark):
    ensure_utc(spark)


def _micros(df):
    out = df.select(F.unix_micros("ts").alias("us")).orderBy("us").collect()
    return [r["us"] for r in out]


def test_long_nanos_input(spark):
    rows = [(us * 1000,) for us in _expected_micros()]
    df = spark.createDataFrame(rows, "ts long")
    norm = normalize_event_ts(df)
    assert norm.schema["ts"].dataType.simpleString() == "timestamp"
    assert _micros(norm) == sorted(_expected_micros())


def test_timestamp_ntz_input(spark):
    df = spark.createDataFrame([(t,) for t in INSTANTS], "ts timestamp_ntz")
    norm = normalize_event_ts(df)
    assert norm.schema["ts"].dataType.simpleString() == "timestamp"
    assert _micros(norm) == sorted(_expected_micros())


def test_timestamp_input_passthrough(spark):
    df = spark.createDataFrame([(t,) for t in INSTANTS], "ts timestamp")
    norm = normalize_event_ts(df)
    assert norm is df  # already normalized: no-op, no extra projection
    assert _micros(norm) == sorted(_expected_micros())


def test_all_three_agree_through_parquet(spark, tmp_path):
    """Write the same instants in all three storage types, read each back
    through a plain parquet read + normalize, and require identical
    results — the exact drift the round-3 testdata regeneration caused."""
    from hbase_tohdfs_spark.session import ensure_nanos_as_long

    ensure_nanos_as_long(spark)
    p_long = str(tmp_path / "as_long")
    p_ntz = str(tmp_path / "as_ntz")
    p_ts = str(tmp_path / "as_ts")
    spark.createDataFrame(
        [(us * 1000,) for us in _expected_micros()], "ts long"
    ).write.parquet(p_long)
    spark.createDataFrame([(t,) for t in INSTANTS], "ts timestamp_ntz").write.parquet(
        p_ntz
    )
    spark.createDataFrame([(t,) for t in INSTANTS], "ts timestamp").write.parquet(p_ts)

    outs = [
        _micros(normalize_event_ts(spark.read.parquet(p)))
        for p in (p_long, p_ntz, p_ts)
    ]
    assert outs[0] == outs[1] == outs[2] == sorted(_expected_micros())
