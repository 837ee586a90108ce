#!/bin/bash
# One-command pre-ship gate, in cost order (fail fast):
#   1. check_repo.py      — imports/registry/docs/stability-ledger (~10 s)
#   2. pytest             — full suite incl. golden replay + plan shapes
#   3. check_queries      — every query vs its DuckDB oracle at sf0.01,
#                           driver-like 200 shuffle partitions
#   4. float stability    — full-registry 8-vs-200-partition sweep
#   5. bench.py           — headline suite at sf0.1 (prints the JSON line)
# Steps 3-5 dominate (~60-90 min total); pass --quick for 1-2 only.
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/check_repo.py
python -m pytest tests/ -q
[ "${1:-}" = "--quick" ] && { echo "QUICK GATE PASS"; exit 0; }
CHECK_SHUFFLE_PARTITIONS=200 python scripts/check_queries.py /root/testdata/sf0.01
python scripts/check_float_stability.py /root/testdata/sf0.01
python bench.py
echo "RELEASE GATE PASS"
