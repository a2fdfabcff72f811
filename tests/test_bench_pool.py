"""Minima-pool identity guards (r12 verdict item 1).

The bench reports per-query minima pooled over BENCH_HISTORY.jsonl lines
of *identical* timing identity.  r12 showed what happens when a facet of
that identity is missing: the pool matched on sf + code fingerprint but
not cpu count, so the driver's SPARK_GRAFT_CPUS=8 run reported 32-core
minima and the scaling block collapsed to ratios ~1.0.  These tests pin
the cpus facet (and the legacy-line rule) with a fixture history file.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _write_history(tmp_path, lines):
    path = tmp_path / "BENCH_HISTORY.jsonl"
    with open(path, "w") as fh:
        for line in lines:
            fh.write(json.dumps(line) + "\n")
    return str(path)


def _pin_identity(monkeypatch, tmp_path, lines, fp="fp-abc"):
    monkeypatch.setattr(bench, "_history_path", lambda: _write_history(tmp_path, lines))
    monkeypatch.setattr(bench, "_code_fingerprint", lambda: fp)
    monkeypatch.setattr(bench, "_git_sha", lambda: "deadbee")


def test_pool_is_keyed_on_cpus(monkeypatch, tmp_path):
    # A 32-core line must NOT lower an 8-core run's reported minimum.
    _pin_identity(
        monkeypatch,
        tmp_path,
        [
            {"sf": 0.1, "cpus": 32, "code_fp": "fp-abc", "queries": {"q": 0.4}},
            {"sf": 0.1, "cpus": 8, "code_fp": "fp-abc", "queries": {"q": 1.5}},
        ],
    )
    minima, used = bench._history_minima({"q": 2.0}, 0.1, cpus=8)
    assert minima["q"] == 1.5  # the 0.4s 32-core line is excluded
    # one matching history line; the "minus the current run" adjustment
    # applies only when this run has already been appended (main() order)
    assert used in (0, 1)


def test_legacy_untagged_lines_count_as_32core(monkeypatch, tmp_path):
    # Every pre-r13 history line was a 32-core run; they keep pooling for
    # cpus=32 and are excluded from any other core count.
    legacy = {"sf": 0.1, "code_fp": "fp-abc", "queries": {"q": 0.3}}
    _pin_identity(monkeypatch, tmp_path, [legacy])
    minima32, _ = bench._history_minima({"q": 1.0}, 0.1, cpus=32)
    assert minima32["q"] == 0.3
    minima8, _ = bench._history_minima({"q": 1.0}, 0.1, cpus=8)
    assert minima8["q"] == 1.0


def test_pool_still_keys_on_fingerprint_and_sf(monkeypatch, tmp_path):
    _pin_identity(
        monkeypatch,
        tmp_path,
        [
            {"sf": 0.1, "cpus": 32, "code_fp": "fp-OLD", "queries": {"q": 0.1}},
            {"sf": 0.01, "cpus": 32, "code_fp": "fp-abc", "queries": {"q": 0.1}},
        ],
    )
    minima, _ = bench._history_minima({"q": 1.0}, 0.1, cpus=32)
    assert minima["q"] == 1.0
