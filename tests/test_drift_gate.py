"""The drift gate must flag mutated AND missing testdata, honor the
override, and pass on the real tree (which the autouse session fixture
already proved by letting this session start)."""

from __future__ import annotations

import pytest

from hbase_tohdfs_spark import drift


def test_clean_tree_passes():
    drift.check_or_raise()


def test_missing_tree_is_drift(monkeypatch):
    # Total deletion of the testdata tree is the worst drift case: the
    # old checker iterated live keys only, so "nothing live" diffed as
    # "nothing changed".  The union diff reports snapshot-only entries.
    monkeypatch.setenv("SPARK_GRAFT_TESTDATA", "/nonexistent/testdata")
    with pytest.raises(RuntimeError, match="schema drift"):
        drift.check_or_raise()


def test_env_override_skips(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TESTDATA", "/nonexistent/testdata")
    monkeypatch.setenv(drift.SKIP_ENV, "1")
    drift.check_or_raise()
