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


def main() -> int:
    live = live_schemas()
    if "--update" in sys.argv:
        with open(SNAPSHOT, "w") as fh:
            json.dump(live, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {SNAPSHOT}")
        return 0
    if not os.path.exists(SNAPSHOT):
        print(f"no snapshot at {SNAPSHOT}; run with --update first")
        return 1
    with open(SNAPSHOT) as fh:
        snap = json.load(fh)
    drift = []
    for sf, tables in live.items():
        for t, schema in tables.items():
            old = snap.get(sf, {}).get(t)
            if old != schema:
                drift.append((sf, t, old, schema))
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
