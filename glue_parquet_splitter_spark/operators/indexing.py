"""Global row indexing without a global sort bottleneck.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole relation into ONE window partition — a single task sorts every
row, the classic 100 TB anti-pattern.  The scalable form (the DataFrame
equivalent of RDD ``zipWithIndex``) keeps the sort distributed:

1. range-partition on the order key, sort within partitions — a
   distributed sort, every partition in parallel;
2. count rows per partition — a metadata-sized job (#partitions rows)
   whose shuffle files the main job reuses;
3. add each partition's exclusive-prefix offset to a within-partition
   running counter (Arrow-batched ``mapInPandas``, no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_row_index(df: DataFrame, order_cols: list[str],
                     num_partitions: int | None = None,
                     col_name: str = "row_idx") -> DataFrame:
    """Contiguous 0-based global row index in ``order_cols`` order.

    The per-partition count ``collect()`` is metadata-bounded (one row
    per shuffle partition, never data rows) — same contract as the
    manifest collects in ``pipeline/incremental.py``.  Because both the
    count job and the main job hang off the same shuffle lineage, the
    range exchange runs once and its files are reused.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = {r["_pid"]: r["cnt"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = df.schema.add(col_name, "long")

    def add_index(batches):
        base = None  # one mapInPandas call == one partition
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[col_name] = range(base, base + len(pdf))
            base += len(pdf)
            yield pdf

    return ranged.mapInPandas(add_index, schema=out_schema)
