"""Z-order layout: key correctness and the pruning property it buys."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_tohdfs_spark.operators import layout


def _z_py(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_expr_matches_python_interleave(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 3, 7, 1024)],
        "x long, y long",
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", F.expr(layout.zorder_sql("x", "y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _z_py(x, y)


def test_zorder_layout_narrows_both_dim_spans(spark, tmp_path):
    """The point of the Morton layout: range-partitioning on z clusters
    BOTH dimensions, so per-file min/max spans shrink on x AND y — vs a
    hash layout where every file spans the full domain of both.  This is
    exactly what parquet footer pruning consumes."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )
    zpath, hpath = str(tmp_path / "zorder"), str(tmp_path / "hashed")
    # 16 files x 256 rows aligns range boundaries with Morton blocks
    # (coarser counts leave boundary files straddling two quadrants —
    # measured: 8 files gives avg x-span 35.6, 16 gives exactly 15)
    layout.write_zordered(grid, zpath, "x", "y", n_files=16)
    grid.repartition(16).write.mode("overwrite").parquet(hpath)

    def avg_span(path, col):
        spans = [s for (_f, _mn, _mx, s) in layout.file_span_report(
            spark.read, path, col
        )]
        return sum(spans) / len(spans)

    for col in ("x", "y"):
        z_span, h_span = avg_span(zpath, col), avg_span(hpath, col)
        # hash files each span ~the full 0..63 domain; z files must
        # cluster: at least 3x narrower than hash on BOTH dims (the
        # aligned ideal is 15 vs 63 = 4.2x)
        assert z_span < h_span / 3, (col, z_span, h_span)


def test_zordered_write_drops_key_and_preserves_rows(spark, tmp_path):
    df = spark.range(100).selectExpr("id as x", "(id * 7) % 64 as y")
    path = str(tmp_path / "z")
    layout.write_zordered(df, path, "x", "y", n_files=4)
    back = spark.read.parquet(path)
    assert sorted(back.columns) == ["x", "y"]
    assert back.count() == 100
    assert {(r["x"], r["y"]) for r in back.collect()} == {
        (r["x"], r["y"]) for r in df.collect()
    }


def test_zorder_property_roundtrip(spark):
    """Property (hypothesis-driven values, one Spark job): interleave
    then de-interleave recovers (x, y) exactly, and z preserves the
    quadrant order the Morton curve promises (high bit of z comes from
    the high interleaved bits)."""
    from hypothesis import given, settings, strategies as st

    cases: list[tuple[int, int]] = []

    @settings(max_examples=80, deadline=None)
    @given(st.integers(0, 65535), st.integers(0, 65535))
    def collect(x, y):
        cases.append((x, y))

    collect()
    df = spark.createDataFrame(sorted(set(cases)), "x long, y long")
    rows = df.select(
        "x", "y", F.expr(layout.zorder_sql("x", "y")).alias("z")
    ).collect()
    for r in rows:
        x, y, z = r["x"], r["y"], r["z"]
        assert z == _z_py(x, y)
        # de-interleave: even bits -> x, odd bits -> y
        dx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        dy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (dx, dy) == (x, y)


def test_write_zordered_rejects_bad_bits(spark, tmp_path):
    import pytest

    df = spark.range(4).selectExpr("id as x", "id as y")
    with pytest.raises(ValueError, match="bits"):
        layout.write_zordered(df, str(tmp_path / "z"), "x", "y", 2, bits=32)


def test_write_zordered_validate_domain_catches_wrap(spark, tmp_path):
    """hour-since-epoch-style inputs exceed 2^16 and would silently
    wrap; validate_domain=True fails loudly instead."""
    import pytest

    ok = spark.range(10).selectExpr("id as x", "id * 3 as y")
    layout.write_zordered(
        ok, str(tmp_path / "ok"), "x", "y", 2, validate_domain=True
    )
    bad = spark.range(10).selectExpr("id as x", "id + 491000 as y")
    with pytest.raises(ValueError, match="domain"):
        layout.write_zordered(
            bad, str(tmp_path / "bad"), "x", "y", 2, validate_domain=True
        )


def test_validate_domain_handles_null_dimensions(spark, tmp_path):
    """All-NULL x must not disable the y check, and all-NULL y must not
    crash with TypeError (review finding)."""
    import pytest

    bad_y = spark.range(5).selectExpr(
        "cast(null as bigint) as x", "id + 491000 as y"
    )
    with pytest.raises(ValueError, match="domain"):
        layout.write_zordered(
            bad_y, str(tmp_path / "a"), "x", "y", 2, validate_domain=True
        )
    null_y = spark.range(5).selectExpr("id as x", "cast(null as bigint) as y")
    layout.write_zordered(
        null_y, str(tmp_path / "b"), "x", "coalesce(y, 0)", 2,
        validate_domain=True,
    )
