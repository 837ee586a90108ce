#!/usr/bin/env python
"""Float-order flakiness detector (the capped_running_balance class).

The r6 driver caught a query whose output depended on float
accumulation order: a final ``ROUND(SUM(<double>), 2)`` flipped on a
half-cent boundary between environments, so the query passed the
DuckDB oracle locally yet hash-failed on the driver.  The defining
symptom is *partition-count sensitivity*: Spark's own result changes
when ``spark.sql.shuffle.partitions`` changes, because a plain
aggregate accumulates in partition-arrival order.

This script runs every registered query TWICE on Spark — once at 8
shuffle partitions, once at the driver-like 200 — and compares the two
results EXACTLY (full float precision, no rounding slack).  A mismatch
means the query's output is not a pure function of its input and will
eventually flake on some environment.  It also runs the standard
DuckDB-oracle compare at the 200-partition setting, the configuration
the driver grades under.

Usage: python scripts/check_float_stability.py [sf_dir] [name ...]
Writes STABILITY.json {name: {"stable": bool, "oracle_ok": bool}}.
"""

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from glue_parquet_splitter_spark.oracle import run_one  # noqa: E402
from glue_parquet_splitter_spark.queries import load_all_modules  # noqa: E402
from glue_parquet_splitter_spark.session import get_spark  # noqa: E402


def canon_exact(df):
    """Order-insensitive canonical form at FULL float precision.

    Unlike oracle._canon (9-digit slack for cross-engine compares),
    this is Spark-vs-Spark: the same engine on the same data must be
    bit-identical, so repr() every float exactly.
    """
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return "∅" if math.isnan(v) else repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]
    reg = load_all_modules()
    todo = names or list(reg)
    spark = get_spark("float_stability", shuffle_partitions=8)
    results, failures = {}, []
    for name in todo:
        t0 = time.time()
        spec = reg[name]
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            a = canon_exact(spec.fn(spark, sf_dir).toPandas())
            spark.conf.set("spark.sql.shuffle.partitions", "200")
            b = canon_exact(spec.fn(spark, sf_dir).toPandas())
            stable = a.equals(b)
            detail = ""
            if not stable:
                diff = (a != b).any(axis=1) if len(a) == len(b) else None
                detail = (f" first diff row {int(diff.idxmax())}"
                          if diff is not None and diff.any()
                          else f" shapes {a.shape} vs {b.shape}")
            # oracle compare under the driver-like partition count
            ok, msg = run_one(spark, sf_dir, name)
        except Exception as e:
            stable, ok = False, False
            detail, msg = "", f"EXCEPTION {type(e).__name__}: {str(e)[:200]}"
        results[name] = {"stable": bool(stable), "oracle_ok": bool(ok),
                         "sf_dir": sf_dir}
        status = "PASS" if (stable and ok) else "FAIL"
        print(f"{status} {name:36s} {time.time()-t0:6.1f}s  "
              f"stable={stable} oracle={msg}{detail}", flush=True)
        if status == "FAIL":
            failures.append(name)
    # subset runs MERGE into the existing ledger (a named-queries
    # invocation must not clobber the full-registry sweep's results)
    path = "/root/repo/STABILITY.json"
    doc = {"sf_dir": sf_dir, "results": {}}
    if names:
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            pass
    doc["results"].update(results)
    doc["results"] = {k: doc["results"][k] for k in sorted(doc["results"])}
    doc["n"] = len(doc["results"])
    doc["fail"] = sorted(k for k, v in doc["results"].items()
                         if not (v["stable"] and v["oracle_ok"]))
    # the top-level sf_dir describes a FULL-registry sweep; a named-
    # subset run must not overwrite it (the merged ledger would then
    # claim a single scale for results actually swept at mixed scales —
    # each entry carries its own sf_dir for that)
    if not names:
        doc["sf_dir"] = sf_dir
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"\n{len(todo) - len(failures)}/{len(todo)} stable+green "
          f"-> STABILITY.json ({doc['n']} total, {len(doc['fail'])} failing)")
    if failures:
        print("failing:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
