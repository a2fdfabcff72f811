"""VM-calibration protocol guards (r7 verdict task 2 + ADVICE r7).

The calibration tool and the close_round gate protect the bench
protocol from the host's 3-10x throughput swings.  These tests pin the
cheap, Spark-free policy pieces: argument validation, the sf-mismatch
refusal, the shared-floor invariant, and close_round's refuse/annotate
decision.  The expensive probe itself (a real tpch_q6 run) is exercised
by actually using the tool each round, not here.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)

import bench  # noqa: E402
import close_round  # noqa: E402
import vm_calibrate  # noqa: E402


def test_floor_is_shared_with_bench():
    # One source of truth: if the tool and the per-run BENCH note ever
    # disagree on the floor, every health verdict becomes ambiguous.
    assert vm_calibrate.HEALTHY_MIN == bench.VM_HEALTHY_Q6_MIN
    assert vm_calibrate.HEALTHY_FACTOR == bench.VM_HEALTHY_FACTOR
    assert vm_calibrate.SHUFFLE_HEALTHY_MIN == bench.VM_HEALTHY_SHUFFLE_MIN


def test_calibrate_rejects_nonpositive_runs():
    # ADVICE r7: `vm_calibrate.py 0` used to reach min([]) and die with
    # an unhelpful ValueError after paying a Spark session.
    with pytest.raises(ValueError, match="n_runs"):
        vm_calibrate.calibrate(0)
    with pytest.raises(ValueError, match="n_runs"):
        vm_calibrate.calibrate(-3)


def test_calibrate_refuses_wrong_sf(monkeypatch):
    # ADVICE r7: HEALTHY_MIN is an sf0.1 floor; any other sf-dir must
    # refuse rather than emit a false HEALTHY/DEGRADED verdict.  The
    # guard fires before the drift check and before any Spark session.
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    with pytest.raises(SystemExit, match="calibrated"):
        vm_calibrate.calibrate(4)


def test_gate_healthy_proceeds():
    assert close_round.calibration_gate(1.0, require_healthy=False) is None
    assert close_round.calibration_gate(1.0, require_healthy=True) is None
    # boundary: exactly at the factor is still healthy
    assert (
        close_round.calibration_gate(
            bench.VM_HEALTHY_FACTOR, require_healthy=True
        )
        is None
    )


def test_gate_degraded_refuses_only_when_required(capsys):
    # End-of-round close-outs must still lay protective bench history on
    # a sick host (annotate + proceed); perf-landing close-outs must
    # refuse (an A/B claim from a degraded host is untrustworthy).
    assert close_round.calibration_gate(6.0, require_healthy=False) is None
    assert "DEGRADED" in capsys.readouterr().out
    rc = close_round.calibration_gate(6.0, require_healthy=True)
    assert rc == 3
    assert "refusing" in capsys.readouterr().err


def test_probe_calibration_refuses_cleanly_on_sf_mismatch(
    monkeypatch, capsys
):
    # ADVICE r8: a non-sf0.1 SPARK_GRAFT_SF_DIR used to make calibrate's
    # import-level SystemExit kill the close-out mid-flight with no gate
    # decision.  probe_calibration must catch it, point the operator at
    # --skip-calibration, and return a distinct refusal code.
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    rc = close_round.probe_calibration(require_healthy=False)
    assert rc == 4
    err = capsys.readouterr().err
    assert "--skip-calibration" in err and "calibrated" in err


def test_floor_epoch_r11_rebase():
    # r10 verdict #1: the 0.20s floor was r8-era hardware never seen
    # again (21 r10 calibrations bottomed at 0.23s) — re-based to the
    # observed distribution floor, with the factor tightened 1.75 -> 1.5
    # so the ABSOLUTE admit threshold stays ~unchanged (0.35 -> 0.345s)
    # instead of loosening with the re-base.  Old epoch recorded in the
    # bench.py constant's history note and SCALE.md r11.
    assert bench.VM_HEALTHY_Q6_MIN == 0.23
    assert bench.VM_HEALTHY_FACTOR == 1.5
    assert bench.VM_HEALTHY_Q6_MIN * bench.VM_HEALTHY_FACTOR == pytest.approx(
        0.345
    )


def test_vm_health_note_wording():
    note = bench.vm_health_note(0.21)
    assert "HEALTHY" in note and "DEGRADED" not in note
    note = bench.vm_health_note(1.2)
    assert "DEGRADED" in note and "not" in note  # carries the attribution


def test_vm_health_note_two_axes():
    # ADVICE r11 medium: the note's verdict must cover BOTH degradation
    # shapes.  Scan healthy + shuffle sick (the r9 blind spot) and scan
    # sick + shuffle healthy (observed r12) are both DEGRADED; the
    # "-> HEALTHY" token close_round greps only appears when both axes
    # are under their floors.
    healthy_q6 = bench.VM_HEALTHY_Q6_MIN
    healthy_sh = bench.VM_HEALTHY_SHUFFLE_MIN
    sick_sh = healthy_sh * bench.VM_HEALTHY_FACTOR * 2
    sick_q6 = healthy_q6 * bench.VM_HEALTHY_FACTOR * 2

    note = bench.vm_health_note(healthy_q6, healthy_sh)
    assert "-> HEALTHY" in note and "shuffle axis" in note
    note = bench.vm_health_note(healthy_q6, sick_sh)
    assert "-> DEGRADED" in note and "-> HEALTHY" not in note
    note = bench.vm_health_note(sick_q6, healthy_sh)
    assert "-> DEGRADED" in note and "-> HEALTHY" not in note
    # one-axis fallback (burn probe failed): still a usable verdict
    note = bench.vm_health_note(healthy_q6, None)
    assert "-> HEALTHY" in note and "shuffle axis" not in note
