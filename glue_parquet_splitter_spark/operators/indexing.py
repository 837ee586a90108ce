"""Global row indexing without a global sort bottleneck.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole relation into ONE window partition — a single task sorts every
row, the classic 100 TB anti-pattern.  The scalable form (the DataFrame
equivalent of RDD ``zipWithIndex``) keeps the sort distributed:

1. derive range-bucket boundaries from approximate quantiles of the
   order key, and assign each row a bucket id AS A FUNCTION OF THE KEY
   — deterministic, independent of physical partitioning (a
   ``repartitionByRange`` bucket id would NOT be: its RangePartitioner
   re-samples per job with an RDD-id-derived seed, so the count job
   and the index job can disagree on boundaries — observed as
   duplicate indexes at 10M rows);
2. count rows per bucket — a metadata-sized aggregate (≤ #buckets
   rows to the driver) that needs no particular partitioning at all;
3. cluster by bucket, sort within partitions on (bucket, key), and add
   each bucket's exclusive-prefix offset to a per-bucket running
   counter (Arrow-batched ``mapInPandas``, no extra shuffle).

Bucket boundaries only affect BALANCE, never correctness — any
monotone bucketing of the key yields the same total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_row_index(df: DataFrame, order_cols: list[str],
                     num_partitions: int | None = None,
                     col_name: str = "row_idx") -> DataFrame:
    """Contiguous 0-based global row index in ``order_cols`` order.

    ``order_cols[0]`` must be numeric (quantile boundaries are computed
    on it) and the full ``order_cols`` must be a unique key — with
    duplicate keys a global row number is not well-defined in ANY
    engine.  The per-bucket count ``collect()`` is metadata-bounded
    (one row per bucket, never data rows) — same contract as the
    manifest collects in ``pipeline/incremental.py``.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    key = order_cols[0]
    qs = [i / n for i in range(1, n)]
    bounds = sorted(set(df.approxQuantile(key, qs, 0.001))) if n > 1 else []
    b_arr = F.array(*[F.lit(float(b)) for b in bounds])
    pid_expr = F.aggregate(
        b_arr, F.lit(0),
        lambda acc, b: acc + F.when(F.col(key).cast("double") >= b, 1)
        .otherwise(0),
    )
    tagged = df.withColumn("_pid", pid_expr)
    counts = {r["_pid"]: r["cnt"] for r in
              tagged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    clustered = (
        tagged.repartition(len(bounds) + 1, "_pid")
        .sortWithinPartitions("_pid", *order_cols)
    )
    out_schema = df.schema.add(col_name, "long")

    def add_index(batches):
        # a physical partition may hold several buckets (hash(_pid)
        # collisions) — but each bucket lives in exactly one partition
        # and its rows arrive contiguously sorted, so per-bucket
        # running counters stay correct
        import numpy as np
        import pandas as pd

        next_idx: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pids = pdf["_pid"].to_numpy()
            idx = np.empty(len(pids), dtype="int64")
            for pid in pd.unique(pids):
                mask = pids == pid
                cnt = int(mask.sum())
                start = next_idx.setdefault(int(pid), offsets[int(pid)])
                idx[mask] = np.arange(start, start + cnt)
                next_idx[int(pid)] = start + cnt
            pdf = pdf.drop(columns=["_pid"])
            pdf[col_name] = idx
            yield pdf

    return clustered.mapInPandas(add_index, schema=out_schema)
