#!/usr/bin/env python
"""Profile one or more registry queries: executed wall time (min of N),
SQLMetrics summary (scan rows/bytes/files, shuffle records/bytes,
spills), and optionally the AQE-final physical plan.

Usage:
  python scripts/profile_query.py [sf_dir] name [name ...] [--plan] [--n 3]

This is the audit loop behind the plan claims in docstrings/PLANS.md:
run it after changing a query and check the shuffle bytes and plan
shape moved the way the docstring says they should.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from glue_parquet_splitter_spark.observability import run_with_metrics  # noqa: E402
from glue_parquet_splitter_spark.plans import physical_plan  # noqa: E402
from glue_parquet_splitter_spark.queries import load_all_modules  # noqa: E402
from glue_parquet_splitter_spark.session import get_spark  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_plan = "--plan" in sys.argv
    n_runs = 3
    if "--n" in sys.argv:
        n_runs = int(sys.argv[sys.argv.index("--n") + 1])
        args = [a for a in args if a != str(n_runs)]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    if not names:
        raise SystemExit("profile_query: give at least one query name")

    reg = load_all_modules()
    spark = get_spark("profile_query")
    for name in names:
        spec = reg[name]
        best_t, best_m = None, None
        for _ in range(n_runs):
            df = spec.fn(spark, sf_dir)
            t0 = time.time()
            _rows, m = run_with_metrics(df)
            dt = time.time() - t0
            if best_t is None or dt < best_t:
                best_t, best_m = dt, m
        print(f"== {name}  {best_t:.3f}s (min of {n_runs}) @ {sf_dir}")
        for k, v in best_m.items():
            print(f"   {k:>24}: {v:,}")
        if show_plan:
            print(physical_plan(spec.fn(spark, sf_dir)))


if __name__ == "__main__":
    main()
