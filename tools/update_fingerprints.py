"""Record the current registry code-fingerprints under a round number.

Usage:
    python tools/update_fingerprints.py <round>

Writes/merges ``tools/query_fingerprints.json``:
    {"_algo": 1, "<round>": {"<query>": "<md5>", ...}, ...}

PROTOCOL (the code-aware rotation contract): run this against the FINAL
code of round N — the snapshot the driver will execute for
CORRECTNESS_r0N.json — so a green row for round N certifies exactly the
fingerprints recorded under key N.  ``rotation_tail`` then forces any
query whose current fingerprint differs from its last-green round's
recorded fingerprint into the driver window.

Historical rounds are reconstructed by running this script from a git
worktree of that round's final commit with PYTHONPATH pointing at the
worktree (the fingerprint module itself is loaded standalone, so the
current algorithm hashes the old code).  If fingerprint.ALGO ever
changes, re-reconstruct every recorded round the same way.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        raise SystemExit(__doc__)
    rnd = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from hbase_tohdfs_spark import fingerprint as fp
    from hbase_tohdfs_spark.queries import REGISTRY

    path = out_path or fp.FINGERPRINTS_PATH
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        data = {}
    old_algo = data.get("_algo")
    if data and old_algo != fp.ALGO:
        # Restamping _algo would make old-algorithm rounds load as
        # comparable to new-algorithm ones — every query with an older
        # green would be spuriously flagged changed.  Enforce the
        # reconstruction contract instead of silently violating it.
        raise SystemExit(
            f"{path} was recorded with _algo={old_algo!r} but "
            f"fingerprint.ALGO is now {fp.ALGO}.  Reconstruct every "
            "recorded round from its final commit with the new "
            "algorithm (see module docstring) before recording more."
        )
    data["_algo"] = fp.ALGO
    data[rnd] = fp.registry_fingerprints(REGISTRY)
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"recorded {len(data[rnd])} fingerprints under round {rnd} -> {path}")


if __name__ == "__main__":
    main()
