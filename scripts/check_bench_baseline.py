#!/usr/bin/env python
"""Bench-baseline commit discipline (VERDICT r12 #6, r14 #5).

The committed BENCH_METRICS.json is the next round's wall/shuffle
baseline, so WHICH run gets committed is a correctness decision, not a
formality: a contended-host run (loadavg_start >= the anchor-freeze
threshold) carries inflated walls, and committing it over a quiet
baseline would make every future regression look like a recovery.
bench.py already applies this rule to individual anchor freezes; this
check applies the same rule at the FILE level — the step the r12 round
lacked when the driver's loadavg-9.33 run overwrote the 0.36 quiet
baseline in the round-closing commit.

Default (gate) mode: exit 1 iff the WORKTREE BENCH_METRICS.json is a
contended-run file while HEAD's is quiet.  Quiet-over-anything and
contended-over-contended (with a warning) pass; a missing/legacy
loadavg_start is treated as contended for the worktree (unknown
provenance must not displace a known-quiet baseline) and as contended
for HEAD (anything may displace it).

``--restore`` (round-OPEN) mode, VERDICT r14 #5: the driver's
round-close commit can itself bake a contended run into HEAD (it did
in r12, r13 and r14), so the refusal-at-close gate alone cannot keep
the lineage quiet.  At round open, if the worktree file is contended,
walk ``git log -- BENCH_METRICS.json`` for the MOST RECENT quiet
version and restore it into the worktree (to be committed as the
round's opening commit).  A quiet worktree file is always kept — a
quieter/newer driver run must win, per the verdict's guard clause.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the single source of truth for "quiet host" — bench.py re-exports the
# same constant for its per-anchor freezes, this script applies it at
# the file level.  Imported from the dependency-free constants module,
# NOT from bench: bench's module imports pull pyspark + the full
# queries package into a one-constant gate script (ADVICE r14).
from bench_constants import ANCHOR_FREEZE_MAX_LOAD as THRESHOLD  # noqa: E402


def _load(text: str) -> float | None:
    try:
        return json.loads(text).get("loadavg_start")
    except (json.JSONDecodeError, AttributeError):
        return None


def _git_show(ref: str) -> str:
    return subprocess.run(
        ["git", "show", f"{ref}:BENCH_METRICS.json"],
        capture_output=True, text=True).stdout


def restore() -> int:
    """Round-open restore: put the most recent QUIET committed
    BENCH_METRICS.json into the worktree unless the worktree file is
    already quiet (a quieter driver run is kept)."""
    try:
        with open("BENCH_METRICS.json") as f:
            work = _load(f.read())
    except OSError:
        work = None
    if work is not None and work < THRESHOLD:
        print(f"bench-baseline restore: worktree run is quiet "
              f"(loadavg_start={work}) — kept")
        return 0
    log = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_METRICS.json"],
        capture_output=True, text=True).stdout.split()
    for sha in log:
        txt = _git_show(sha)
        if not txt:
            continue
        load = _load(txt)
        if load is not None and load < THRESHOLD:
            with open("BENCH_METRICS.json", "w") as f:
                f.write(txt)
            print(f"bench-baseline restore: worktree was contended "
                  f"(loadavg_start={work}); restored quiet baseline "
                  f"from {sha[:7]} (loadavg_start={load})")
            return 0
    print(f"bench-baseline restore: WARNING no quiet version in git "
          f"history; worktree (loadavg_start={work}) left as-is")
    return 0


def main() -> int:
    if "--restore" in sys.argv[1:]:
        return restore()
    try:
        with open("BENCH_METRICS.json") as f:
            work = _load(f.read())
    except OSError:
        print("bench-baseline: no worktree BENCH_METRICS.json — ok")
        return 0
    head_txt = _git_show("HEAD")
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
          f"{head}).  Restore it (python scripts/check_bench_baseline.py "
          "--restore) or re-run bench.py on a quiet host.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
