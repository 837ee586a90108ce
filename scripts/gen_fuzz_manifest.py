#!/usr/bin/env python
"""Regenerate FUZZ_ledgers/MANIFEST.json from the ledger files.

The judge tallies every committed ledger against the manifest; keeping
the manifest hand-written invites drift.  This derives it: one entry
per FUZZ_*.json with the dimension string (from the filename), seed,
query count, and PASS/GUARD/FAIL tally — plus, since r14, how many
queries the ledger evidences as non-empty (``rows`` > 0), the input of
check_repo's non-emptiness lint.

Usage: python scripts/gen_fuzz_manifest.py   (writes the manifest,
prints the tally; exit 1 if any ledger records a FAIL)
"""

from __future__ import annotations

import glob
import json
import os
import sys

LEDGER_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "FUZZ_ledgers")


def main() -> int:
    manifest: dict[str, dict] = {}
    any_fail = False
    for path in sorted(glob.glob(os.path.join(LEDGER_DIR, "FUZZ_*.json"))):
        with open(path) as f:
            led = json.load(f)
        statuses = led.get("statuses", {})
        tally = {s: sum(1 for v in statuses.values() if v == s)
                 for s in ("PASS", "GUARD", "FAIL")}
        name = os.path.basename(path)
        dims = name[len("FUZZ_"):-len(".json")]
        entry = {
            "dimensions": dims,
            "seed": led.get("seed", 0),
            "queries": len(statuses),
            **tally,
        }
        rows = led.get("rows")
        if rows is not None:
            entry["nonempty_queries"] = sum(1 for n in rows.values()
                                            if n and n > 0)
        manifest[name] = entry
        any_fail = any_fail or tally["FAIL"] > 0
        print(f"{name:32s} {len(statuses):4d} queries  "
              f"{tally['PASS']} PASS / {tally['GUARD']} GUARD / "
              f"{tally['FAIL']} FAIL"
              + (f"  ({entry['nonempty_queries']} nonempty)"
                 if rows is not None else ""))
    with open(os.path.join(LEDGER_DIR, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"\nwrote MANIFEST.json ({len(manifest)} ledgers)"
          + ("  ** FAILURES RECORDED **" if any_fail else ""))
    return 1 if any_fail else 0


if __name__ == "__main__":
    sys.exit(main())
