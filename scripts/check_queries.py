#!/usr/bin/env python
"""Run every registered query against its DuckDB oracle locally.

Usage: python scripts/check_queries.py [sf_dir] [name ...]
Default sf_dir is sf0.001 for speed; the driver's gate runs sf0.01.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from glue_parquet_splitter_spark.oracle import run_one  # noqa: E402
from glue_parquet_splitter_spark.queries import load_all_modules  # noqa: E402
from glue_parquet_splitter_spark.session import get_spark  # noqa: E402


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]
    reg = load_all_modules()
    todo = names or list(reg)
    # CHECK_SHUFFLE_PARTITIONS=200 reproduces driver-like accumulation
    # order — shakes out float-order flakiness invisible at 8 partitions
    parts = int(os.environ.get("CHECK_SHUFFLE_PARTITIONS", "8"))
    spark = get_spark("check_queries", shuffle_partitions=parts)
    failures = []
    for name in todo:
        t0 = time.time()
        try:
            ok, msg = run_one(spark, sf_dir, name)
        except Exception as e:
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:6.1f}s  {msg}")
        if not ok:
            failures.append(name)
    print(f"\n{len(todo) - len(failures)}/{len(todo)} pass")
    if failures:
        print("failing:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
