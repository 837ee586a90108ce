"""Dependency-free bench constants (ADVICE r14).

``scripts/check_bench_baseline.py`` is a one-constant commit gate that
must stay importable without pyspark: importing the threshold from
``bench`` executed bench.py's module imports, which transitively pull
the whole engine (pyspark + every queries module) into what used to be
a zero-dependency script.  The single source of truth for "quiet host"
lives here; ``bench`` re-exports it so every existing import keeps
working and the two sites cannot drift.
"""

# New anchors freeze only on a quiet host (loadavg at suite start below
# this); the same value gates WHICH BENCH_METRICS.json file may be
# committed (scripts/check_bench_baseline.py).
ANCHOR_FREEZE_MAX_LOAD = 1.0
