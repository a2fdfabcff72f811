"""Fingerprint closure semantics: what must (and must not) invalidate
a query's green evidence."""

from __future__ import annotations

from hbase_tohdfs_spark import fingerprint as fp
from hbase_tohdfs_spark.queries import REGISTRY


def test_closure_reaches_transitive_operator_functions():
    """A query's fingerprint must cover the operator functions it
    actually executes — transitively, including module-attr uses and
    function-local imports (the two import styles in the registry)."""
    members = {}
    fp._visit(REGISTRY["image_phash"].fn, members, set())
    for needed in (
        "hbase_tohdfs_spark.operators.multimodal.compute_phash",
        "hbase_tohdfs_spark.operators.multimodal.read_image",
        "hbase_tohdfs_spark.formats.bmp.read_bmp24",
        "hbase_tohdfs_spark.formats.png.read_png",
        "hbase_tohdfs_spark.formats.png._paeth",
    ):
        assert needed in members, sorted(members)

    members = {}
    fp._visit(REGISTRY["stream_hll_distinct"].fn, members, set())
    assert (
        "hbase_tohdfs_spark.streaming.pivot_stream.stream_events" in members
    )
    assert "hbase_tohdfs_spark.operators.sketch.hll_cells" in members


def test_fingerprint_sensitive_to_fn_body_and_oracle():
    def qa(spark, sf):
        return spark.range(1)

    def qb(spark, sf):
        return spark.range(2)

    fa = fp.fingerprint_query(qa, "SELECT 1")
    assert fa == fp.fingerprint_query(qa, "SELECT 1")  # deterministic
    assert fa != fp.fingerprint_query(qb, "SELECT 1")  # body matters
    assert fa != fp.fingerprint_query(qa, "SELECT 2")  # oracle matters


def test_fingerprint_insensitive_to_unrelated_registry_entries():
    """tpch_q6 touches only lineitem scans + helper aggregates; its
    closure must NOT include unrelated operator modules, or editing
    dedup.py would spuriously force TPC-H back into the window."""
    members = {}
    fp._visit(REGISTRY["tpch_q6"].fn, members, set())
    assert not any("operators.dedup" in k for k in members), sorted(members)
    assert not any("operators.multimodal" in k for k in members)


def test_canonical_repr_is_order_stable():
    assert fp._canonical_repr({"b", "a"}) == fp._canonical_repr({"a", "b"})
    assert fp._canonical_repr(frozenset((2, 1))) == fp._canonical_repr(
        frozenset((1, 2))
    )
    assert (
        fp._canonical_repr({"k": {"y", "x"}}) == "{'k': {'x', 'y'}}"
    )


def test_registry_fingerprints_cover_every_query():
    fps = fp.registry_fingerprints(REGISTRY)
    assert set(fps) == set(REGISTRY)
    assert all(len(v) == 32 for v in fps.values())


def test_fingerprint_stable_under_runtime_cache_mutation():
    """Module-level mutable containers are runtime caches; filling one
    (as any streaming query does to pivot_stream._SCHEMA_CACHE) must
    not change any fingerprint mid-process — the full-suite failure
    mode that motivated hashing mutables by type identity only."""
    from hbase_tohdfs_spark.streaming import pivot_stream as ps

    before = fp.registry_fingerprints(REGISTRY)
    saved = dict(ps._SCHEMA_CACHE)
    try:
        ps._SCHEMA_CACHE[("/tmp/not-a-dir", 123.0)] = "polluted"
        after = fp.registry_fingerprints(REGISTRY)
    finally:
        ps._SCHEMA_CACHE.clear()
        ps._SCHEMA_CACHE.update(saved)
    assert before == after


def test_update_fingerprints_refuses_algo_mismatch(tmp_path):
    """Recording into a file written under a different ALGO must abort
    (restamping would make incomparable rounds load as comparable)."""
    import json
    import subprocess
    import sys

    bad = tmp_path / "fps.json"
    bad.write_text(json.dumps({"_algo": fp.ALGO + 999, "5": {}}))
    proc = subprocess.run(
        [sys.executable, "tools/update_fingerprints.py", "7", str(bad)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert proc.returncode != 0
    assert "Reconstruct" in proc.stderr
    assert json.loads(bad.read_text())["_algo"] == fp.ALGO + 999  # untouched
