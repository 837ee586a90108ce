#!/usr/bin/env python
"""Bench-baseline commit discipline (VERDICT r12 #6).

The committed BENCH_METRICS.json is the next round's wall/shuffle
baseline, so WHICH run gets committed is a correctness decision, not a
formality: a contended-host run (loadavg_start >= the anchor-freeze
threshold) carries inflated walls, and committing it over a quiet
baseline would make every future regression look like a recovery.
bench.py already applies this rule to individual anchor freezes; this
check applies the same rule at the FILE level — the step the r12 round
lacked when the driver's loadavg-9.33 run overwrote the 0.36 quiet
baseline in the round-closing commit.

Exit 1 iff the WORKTREE BENCH_METRICS.json is a contended-run file
while HEAD's is quiet.  Quiet-over-anything and contended-over-
contended (with a warning) pass; a missing/legacy loadavg_start is
treated as contended for the worktree (unknown provenance must not
displace a known-quiet baseline) and as contended for HEAD (anything
may displace it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the single source of truth for "quiet host" — bench.py applies it per
# anchor freeze, this script applies the same value at the file level
# (ADVICE r13: a duplicated literal here could silently drift)
from bench import ANCHOR_FREEZE_MAX_LOAD as THRESHOLD  # noqa: E402


def _load(text: str) -> float | None:
    try:
        return json.loads(text).get("loadavg_start")
    except (json.JSONDecodeError, AttributeError):
        return None


def main() -> int:
    try:
        with open("BENCH_METRICS.json") as f:
            work = _load(f.read())
    except OSError:
        print("bench-baseline: no worktree BENCH_METRICS.json — ok")
        return 0
    head_txt = subprocess.run(
        ["git", "show", "HEAD:BENCH_METRICS.json"],
        capture_output=True, text=True).stdout
    head = _load(head_txt) if head_txt else None
    if work == head:
        print(f"bench-baseline: unchanged (loadavg_start={work}) — ok")
        return 0
    work_quiet = work is not None and work < THRESHOLD
    head_quiet = head is not None and head < THRESHOLD
    if work_quiet:
        print(f"bench-baseline: quiet worktree run (loadavg_start="
              f"{work}) — ok to commit")
        return 0
    if not head_quiet:
        print(f"bench-baseline: WARNING both contended (worktree="
              f"{work}, HEAD={head}) — allowed, but prefer re-running "
              "bench on a quiet host")
        return 0
    print(f"bench-baseline: REFUSING — worktree BENCH_METRICS.json is a "
          f"contended run (loadavg_start={work} >= {THRESHOLD}) and "
          f"would overwrite HEAD's quiet baseline (loadavg_start="
          f"{head}).  Restore it (git checkout HEAD -- "
          "BENCH_METRICS.json) or re-run bench.py on a quiet host.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
