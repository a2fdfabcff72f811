"""Detect testdata schema drift before it detonates mid-round.

The harness regenerates ``/root/testdata`` between rounds and physical
types drift: round 3 changed ``events.ts`` from TIMESTAMP(NANOS) to
TIMESTAMP(MICROS), which crashed every events query in the correctness
gate while the committed code was a round stale.  This tool diffs the
live parquet schemas of all ten tables against the committed snapshot
(``tools/testdata_schemas.json``) and exits non-zero on any change, so
drift is the FIRST thing a round sees, not a surprise inside the gate.

Usage:
    python tools/check_testdata.py            # diff all sf dirs
    python tools/check_testdata.py --update   # rewrite the snapshot
"""

from __future__ import annotations

import json
import os
import sys

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIRS = ["sf0.001", "sf0.01", "sf0.1"]
SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "testdata_schemas.json")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def live_schemas() -> dict[str, dict[str, str]]:
    import pyarrow.parquet as pq

    out: dict[str, dict[str, str]] = {}
    for sf in SF_DIRS:
        d = os.path.join(TESTDATA, sf)
        if not os.path.isdir(d):
            continue
        for t in TABLES:
            p = os.path.join(d, f"{t}.parquet")
            if not os.path.exists(p):
                out.setdefault(sf, {})[t] = "<MISSING>"
                continue
            s = pq.read_schema(p)
            out.setdefault(sf, {})[t] = ", ".join(
                f"{f.name}:{f.type}" for f in s
            )
    return out


def diff_against_snapshot() -> list[tuple[str, str, str | None, str | None]]:
    """Return [(sf, table, snapshot_schema, live_schema)] for every drift.

    Diffs over the UNION of snapshot and live keys: an sf dir (or the
    whole testdata tree) that disappears is drift too — a snapshot entry
    with no live counterpart reports as '<MISSING DIR>' rather than
    silently passing."""
    if not os.path.exists(SNAPSHOT):
        raise FileNotFoundError(
            f"no snapshot at {SNAPSHOT}; run check_testdata.py --update first"
        )
    with open(SNAPSHOT) as fh:
        snap = json.load(fh)
    live = live_schemas()
    drift: list[tuple[str, str, str | None, str | None]] = []
    for sf in sorted(set(snap) | set(live)):
        snap_tables = snap.get(sf, {})
        live_tables = live.get(sf, {})
        for t in sorted(set(snap_tables) | set(live_tables)):
            old = snap_tables.get(t)
            new = live_tables.get(t, "<MISSING DIR>")
            if old != new:
                drift.append((sf, t, old, new))
    return drift


def main() -> int:
    if "--update" in sys.argv:
        live = live_schemas()
        with open(SNAPSHOT, "w") as fh:
            json.dump(live, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {SNAPSHOT}")
        return 0
    try:
        drift = diff_against_snapshot()
    except FileNotFoundError as exc:
        print(exc)
        return 1
    if drift:
        print(f"!!! {len(drift)} schema drift(s) vs snapshot:")
        for sf, t, old, new in drift:
            print(f"  {sf}/{t}:\n    snapshot: {old}\n    live    : {new}")
        print("audit every consumer of the drifted columns, then re-run "
              "with --update")
        return 1
    print("testdata schemas match the snapshot")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
