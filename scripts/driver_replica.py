#!/usr/bin/env python
"""Exact replica of the verification driver's t2 pass: a VANILLA
SparkSession (no engine confs — catches session-conf regressions the
engine's own get_spark would mask), queries loaded through
__spark_entry__ exactly as the driver does, DuckDB-oracle compare at
sf0.01 with 200 shuffle partitions.

This is the strongest local predictor of CORRECTNESS_r{N}.json:
round 7 ran it green over the whole registry before shipping.

Usage: python scripts/driver_replica.py [sf_dir] [name ...]
"""

import importlib.util
import sys
import time


def main():
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "200")
             .getOrCreate())
    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from glue_parquet_splitter_spark.oracle import compare, duckdb_connection

    qs, os_ = mod.queries(), mod.oracle_sql()
    todo = names or list(qs)
    fails = []
    for name in todo:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            con = duckdb_connection(sf)  # hold the con: a temporary is
            odf = con.sql(os_[name]).df()  # GC'd before .df() runs
            ok, msg = compare(sdf, odf)
        except Exception as e:
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:200]}"
        print(f"{'PASS' if ok else 'FAIL'} {name} {time.time()-t0:.1f}s {msg}",
              flush=True)
        if not ok:
            fails.append(name)
    print(f"\nDRIVER-REPLICA: {len(todo)-len(fails)}/{len(todo)} pass")
    if fails:
        print("failing:", " ".join(fails))
        sys.exit(1)


if __name__ == "__main__":
    main()
