#!/usr/bin/env python
"""Deterministic 10x scale-up of the sf0.1 fixtures for SCALING
measurements (VERDICT r15 #7): sf0.1 is scheduling-overhead-bound at
both 8 and 32 cores, so the driver's low-core scaling block carries no
parallelism signal.  This writes an "sf1"-shaped dataset to a caller
directory (NOT /root/testdata — that tree is driver-owned/read-only)
by replicating each table REP times with key offsets that preserve
referential integrity inside each replica:

- TPC-H keys (orderkey/custkey/partkey/suppkey) shift by
  replica * (max_key + 1), so joins fan out exactly REP-fold and no
  cross-replica key collides.  nation/region (25/5 rows, key-bounded
  dimensions every query treats as constants) are NOT replicated.
- documents: doc_id shifts; text/lang/source unchanged (content-keyed
  operators see REP identical corpora with disjoint ids — exact-dup
  heavy, which is fine for a SCALING probe, not a recall probe).
- embeddings: vec_id shifts; the replica>0 embedding gets a tiny
  deterministic per-replica rotation via element order (reverse for
  odd replicas) to avoid every vector being an exact dup.
- events: event_id/user_id shift, ts unchanged.

Pure replication (no RNG) keeps the output deterministic and cheap.
Usage: python scripts/gen_scale_data.py /tmp/scale/sf1 [REP]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

SHIFTS = {
    "customer": {"c_custkey": 15001},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "events": {"event_id": 1_000_000, "user_id": 1_000_000},
    "lineitem": {"l_orderkey": 600_001, "l_partkey": 20_001,
                 "l_suppkey": 1_001},
    "orders": {"o_orderkey": 600_001, "o_custkey": 15_001},
    "part": {"p_partkey": 20_001},
    "supplier": {"s_suppkey": 1_001},
}
COPY_ONLY = ("nation", "region")


def main() -> None:
    out, rep = sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for name in COPY_ONLY:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out}/{name}.parquet")
        print(f"{name}: copied {t.num_rows}")
    for name, shifts in SHIFTS.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for r in range(rep):
            t = base
            for col, step in shifts.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t.column(col), r * step)
                t = t.set_column(idx, t.schema.field(col), shifted)
            if name == "embeddings" and r % 2 == 1:
                # deterministic variation: reverse odd replicas' vectors
                idx = t.schema.get_field_index("embedding")
                col = t.column("embedding").combine_chunks()
                arrs = col.to_pylist()
                arrs = [None if a is None else a[::-1] for a in arrs]
                t = t.set_column(idx, t.schema.field("embedding"),
                                 pa.array(arrs, type=col.type))
            parts.append(t)
        full = pa.concat_tables(parts)
        pq.write_table(full, f"{out}/{name}.parquet")
        print(f"{name}: {base.num_rows} x {rep} -> {full.num_rows}")


if __name__ == "__main__":
    main()
