#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries.

Usage: python scripts/dump_plans.py <outdir> <suffix> <name ...>
Writes <outdir>/<name>_<suffix>.txt for each query (sf0.1 inputs,
engine session).  Streaming queries are skipped (their fn() drains a
real stream; the returned memory-sink table's plan is just the sink
scan — plan claims for those live in the streaming runner's shape)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glue_parquet_splitter_spark.queries import load_all_modules  # noqa: E402
from glue_parquet_splitter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    reg = load_all_modules()
    spark = get_spark("dump_plans")
    for name in names:
        spec = reg[name]
        if "streaming" in spec.tags:
            print(f"skip {name} (streaming)")
            continue
        df = spec.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
