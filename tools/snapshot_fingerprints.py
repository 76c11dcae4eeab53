"""Write QUERY_FINGERPRINTS.json — one entry-level fingerprint per
registry query (``_q_*`` source + oracle SQL, see
``__spark_entry__._query_fingerprint``).

Run at each round WRAP so the next round's ``_driver_window_order``
promotes any query whose entry-level semantics changed since its last
driver check (the module-level staleness tier cannot see edits inside
__spark_entry__.py itself).

Usage:
    python tools/snapshot_fingerprints.py            # fingerprint HEAD state
    python tools/snapshot_fingerprints.py --at REF   # fingerprint a past
        commit via a temporary worktree (used once in r9 to seed the file
        from the round-8 wrap, so r9's own entry edits promote)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fingerprints_for(repo_dir: str) -> "dict[str, str]":
    import hashlib
    import inspect

    # repo_dir must STAY on sys.path through the oracle_sql() call —
    # oracle bodies lazily import dlt_spark (e.g. dataops.text STOPWORDS)
    sys.path.insert(0, repo_dir)
    import __spark_entry__ as entry

    fps = {}
    oracles = entry.oracle_sql()
    # hash computed HERE, not via entry._query_fingerprint — must match
    # that function byte-for-byte, but also work against past commits
    # that predate it (the --at seeding path)
    for name, fn in entry._all_queries().items():
        try:
            src = inspect.getsource(fn)
        except Exception:
            src = repr(fn)
        fps[name] = hashlib.sha256(
            (src + "\0" + (oracles.get(name) or "")).encode()
        ).hexdigest()[:16]
    return fps


def main() -> None:
    at = None
    if len(sys.argv) >= 3 and sys.argv[1] == "--at":
        at = sys.argv[2]
    if at is None:
        fps = fingerprints_for(REPO)
    else:
        wt = "/tmp/dlt_spark_fp_worktree"
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, at],
            cwd=REPO, check=True, capture_output=True,
        )
        try:
            # subprocess so the module import is isolated from this repo's
            fps = json.loads(
                subprocess.run(
                    [
                        sys.executable, "-c",
                        "import json, sys; sys.path.insert(0, %r); "
                        "import tools.snapshot_fingerprints as s; "
                        "print(json.dumps(s.fingerprints_for(%r)))"
                        % (REPO, wt),
                    ],
                    check=True, capture_output=True, text=True,
                ).stdout.strip().splitlines()[-1]
            )
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, capture_output=True,
            )
    out = os.path.join(REPO, "QUERY_FINGERPRINTS.json")
    with open(out, "w") as fh:
        json.dump(fps, fh, indent=0, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out} ({len(fps)} queries)")


if __name__ == "__main__":
    main()
