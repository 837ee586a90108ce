#!/usr/bin/env python
"""Multi-seed canonical fuzz roll (VERDICT r14 #3).

The r14 seed sweep proved that a green single-seed ledger can be a
dice roll: seeds 1/2 converted four committed dupkeys-family greens
into failures.  Policy from r15 on: every round re-rolls the canonical
regimes at ``seed = round number`` (a fresh roll per round, stable
ledger filenames), keeping the seed-0 ledgers for reproducibility.
Each regime therefore always has >= 2 seeds in the MANIFEST: the
frozen seed-0 canonical plus the rolling per-round seed.

Writes ``FUZZ_ledgers/FUZZ_<regime>_roll.json`` per regime (seed
recorded inside and in MANIFEST), then regenerates MANIFEST.json.
Regimes run sequentially — each sweep owns the local Spark session.

Usage:
  python scripts/run_fuzz_roll.py --round 15            # all regimes
  python scripts/run_fuzz_roll.py --round 15 --regimes full,tiny
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# regime name -> fuzz_oracle.py flags; mirrors the committed canonical
# seed-0 ledger set (FUZZ_ledgers/FUZZ_<regime>.json)
REGIMES: dict[str, list[str]] = {
    "full": [],
    "nullkeys": ["--nullkeys"],
    "dates": ["--dates"],
    "dates_nullkeys": ["--dates", "--nullkeys"],
    "dupkeys": ["--dupkeys"],
    "dupkeys_dates": ["--dupkeys", "--dates"],
    "dupkeys_nullkeys": ["--dupkeys", "--nullkeys"],
    "big_dupkeys": ["--big", "--dupkeys"],
    "malformed_dupkeys": ["--malformed", "--dupkeys"],
    "nan_nullkeys": ["--nan", "--nullkeys"],
    "negative": ["--negative"],
    "negative_dupkeys": ["--negative", "--dupkeys"],
    "tiny": ["--tiny"],
    "tiny_dupkeys": ["--tiny", "--dupkeys"],
    "tiny_negative": ["--tiny", "--negative"],
    "empty": ["--empty"],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True,
                    help="round number = the roll's seed")
    ap.add_argument("--regimes", default=None,
                    help="comma-separated subset (default: all)")
    args = ap.parse_args()

    todo = (args.regimes.split(",") if args.regimes else list(REGIMES))
    unknown = [r for r in todo if r not in REGIMES]
    if unknown:
        sys.exit(f"unknown regimes: {unknown}")

    failures: list[str] = []
    for regime in todo:
        ledger = os.path.join(REPO, "FUZZ_ledgers",
                              f"FUZZ_{regime}_roll.json")
        cmd = [sys.executable, os.path.join(REPO, "scripts",
                                            "fuzz_oracle.py"),
               "--seed", str(args.round), "--json", ledger,
               *REGIMES[regime]]
        t0 = time.time()
        print(f"=== roll {regime} (seed={args.round}) ===", flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        print(f"=== {regime}: rc={r.returncode} "
              f"{time.time() - t0:.0f}s ===", flush=True)
        if r.returncode != 0:
            failures.append(regime)
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "gen_fuzz_manifest.py")],
                   cwd=REPO)
    if failures:
        print(f"ROLL FAILURES: {failures}")
        return 1
    print("ROLL CLEAN: every regime 0 FAIL at seed", args.round)
    return 0


if __name__ == "__main__":
    sys.exit(main())
