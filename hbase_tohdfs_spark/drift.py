"""Testdata schema-drift gate.

The harness regenerates ``/root/testdata`` between rounds and physical
types drift (round 3: ``events.ts`` TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)
crashed all 17 events queries in the correctness gate).  The checker
(``tools/check_testdata.py``) existed since round 4, but a checker only
helps if nothing can forget to run it — this module is the mandatory
entry point called by ``bench.py`` and the pytest session fixture before
any query runs.

Set ``SPARK_GRAFT_SKIP_DRIFT_CHECK=1`` to proceed anyway (e.g. while
deliberately auditing drifted data before updating the snapshot).
"""

from __future__ import annotations

import importlib.util
import os

SKIP_ENV = "SPARK_GRAFT_SKIP_DRIFT_CHECK"


def _load_checker():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "tools", "check_testdata.py")
    spec = importlib.util.spec_from_file_location("_check_testdata", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    return mod


def check_or_raise() -> None:
    """Raise RuntimeError on any schema drift vs the committed snapshot.

    Loud by design: drift must be the FIRST thing a round sees, not a
    surprise halfway through the correctness gate.  Honors ``SKIP_ENV``.
    """
    if os.environ.get(SKIP_ENV):
        return
    mod = _load_checker()
    drift = mod.diff_against_snapshot()
    if drift:
        heads = ", ".join(f"{sf}/{t}" for sf, t, _, _ in drift[:10])
        raise RuntimeError(
            f"testdata schema drift vs tools/testdata_schemas.json "
            f"({len(drift)} table(s): {heads}). Audit every consumer of "
            f"the drifted columns, then run tools/check_testdata.py "
            f"--update; or set {SKIP_ENV}=1 to proceed anyway."
        )
