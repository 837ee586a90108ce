#!/usr/bin/env python
"""Effective-parallelism probe (VERDICT r15 #7, the noise-robust form).

Wall-clock 8-vs-32-core ratios on this shared host are contention-
dominated (the fixed calibration probe itself swings 2x between runs),
so instead of comparing walls across runs, this measures — inside ONE
run — how much total CPU each query burns versus its wall:

    effective_parallelism = Δ(process-tree CPU seconds) / wall seconds

summed over the whole local-mode process tree (driver python, JVM,
pyspark daemon + workers).  A query whose plan parallelizes reads
~cores; a driver-sequenced or single-task-tail query reads ~1-2 no
matter how many cores exist.  External contention inflates wall AND
leaves CPU untouched, so the ratio DEGRADES (never flatters) under
noise — a lower bound, exactly what a scaling claim needs.

Usage: SPARK_GRAFT_SF_DIR=/tmp/scale/sf1 SPARK_GRAFT_CPUS=32 \
           python scripts/parallelism_probe.py [name ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize  # noqa: E402
from glue_parquet_splitter_spark.queries import load_all_modules  # noqa: E402
from glue_parquet_splitter_spark.session import get_spark  # noqa: E402

CLK = os.sysconf("SC_CLK_TCK")

DEFAULT_QUERIES = [
    "q5_region_revenue", "q9_product_profit", "pk_uniqueness_audit",
    "exact_substring_spans", "interdoc_dup_gram_fraction",
    "minhash_lsh_candidates", "tfidf_top_terms", "unigram_lm_train",
    "curation_funnel_v3", "semdedup_capped_two_salt",
]


def _tree_cpu_sec() -> float:
    """utime+stime over every process in this session's process tree
    (walk children from this pid; /proc/<pid>/task threads are already
    aggregated in the process stat)."""
    me = os.getpid()
    kids: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            kids.setdefault(ppid, []).append(int(pid))
        except OSError:
            continue
    total = 0.0
    stack = [me]
    seen = set()
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / CLK
        except OSError:
            continue
        stack.extend(kids.get(pid, []))
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/scale/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = sys.argv[1:] or DEFAULT_QUERIES
    reg = load_all_modules()
    spark = get_spark("parallelism_probe")
    spark.range(1000).count()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"par probe: {name}")
        # one warm rep (codegen), then the measured rep
        materialize(reg[name].fn(spark, sf_dir))
        c0, t0 = _tree_cpu_sec(), time.perf_counter()
        materialize(reg[name].fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        cpu = _tree_cpu_sec() - c0
        out[name] = {"wall_sec": round(wall, 2), "cpu_sec": round(cpu, 2),
                     "parallelism": round(cpu / wall, 1)}
        print(f"{name}: wall={wall:.2f}s cpu={cpu:.1f}s "
              f"parallelism={cpu / wall:.1f}", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "effective_parallelism", "cpus": cpus,
                      "sf_dir": sf_dir, "queries": out},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
