#!/usr/bin/env python
"""Generate QUERIES.md: the declared-operator inventory (name, family,
oracle status, one-line description from the docstring/module)."""

import sys
from collections import OrderedDict

sys.path.insert(0, "/root/repo")

from glue_parquet_splitter_spark.queries import load_all_modules  # noqa: E402

FAMILIES = OrderedDict([
    ("relational", "Relational core (scans, filters, joins, aggregation, set ops, subqueries)"),
    ("tpch_q", "TPC-H-style headline queries"),
    ("tpch2_q", "TPC-H wave 2 (correlated subqueries, distributions, min-cost matching)"),
    ("functions_q", "Scalar function library (string / regexp / date / json / array / math / hash)"),
    ("window_q", "Window functions"),
    ("events_q", "Event-time windows & Structured Streaming"),
    ("advanced_q", "Advanced joins & statistical aggregates"),
    ("dedup_q", "Deduplication (exact / MinHash+LSH / SimHash / n-gram Jaccard)"),
    ("similarity_q", "Similarity search (cosine, ANN brute-force + LSH, centroids)"),
    ("text_q", "Text analysis (tokens, quality, language-ID, tf-idf, fingerprints)"),
    ("multimodal_q", "Multimodal columns (binary payloads, Arrow-batched decode)"),
    ("pipeline_q", "Split-pipeline parity (reference operators as relational programs)"),
    ("scale_q", "Scale techniques (salting, sampling, generators, iterative)"),
    ("misc_q", "Maps, null-safe joins, rolling fingerprints, pandas UDFs"),
    ("udf_q", "UDF / UDAF / UDTF APIs + IVF search"),
])


def main():
    reg = load_all_modules()
    by_mod: dict[str, list] = {}
    for name, spec in reg.items():
        mod = spec.fn.__module__.rsplit(".", 1)[-1]
        by_mod.setdefault(mod, []).append(spec)

    out = ["# QUERIES — declared operator inventory",
           "",
           f"{len(reg)} declared queries; "
           f"{sum(1 for s in reg.values() if s.oracle)} with full DuckDB oracles, "
           f"{sum(1 for s in reg.values() if not s.oracle)} rows-only "
           "(sketches / append-mode streams — estimates or intentionally partial output).",
           "",
           "Every entry is runnable via `__spark_entry__.queries()[name](spark, sf_dir)`;",
           "checkable via `python scripts/check_queries.py <sf_dir> <name>`.",
           ""]
    for mod, title in FAMILIES.items():
        specs = by_mod.get(mod, [])
        if not specs:
            continue
        out.append(f"## {title}")
        out.append("")
        out.append("| query | oracle | summary |")
        out.append("|---|---|---|")
        for s in sorted(specs, key=lambda x: x.name):
            doc = (s.fn.__doc__ or "").strip().split("\n")[0].strip()
            out.append(f"| `{s.name}` | {'✓' if s.oracle else 'rows-only'} | {doc} |")
        out.append("")
    with open("/root/repo/QUERIES.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote QUERIES.md: {len(reg)} queries")


if __name__ == "__main__":
    main()
