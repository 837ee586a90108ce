"""Small-file compaction (M5 scale hardening).

The reference's one-object-per-(key, day) layout (parquet-splitter.py
:167) is the classic small-file anti-pattern at 100 TB: a year of a
30k-key dataset is ~11M tiny objects. Compaction rewrites a partitioned
dataset to a bounded number of right-sized files per partition while
preserving the partition column — run it periodically behind the
incremental pipeline, or write compacted from the start via
``write_partitioned(..., max_records_per_file=...)``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_partitions(spark: SparkSession, src_dir: str, dst_dir: str,
                       partition_col: str = "item_id",
                       target_files_per_partition: int = 1,
                       max_records_per_file: int = 5_000_000) -> dict:
    """Rewrite ``src_dir`` (Hive-partitioned parquet) into ``dst_dir``
    with ``target_files_per_partition`` files per partition value.

    Returns {"rows", "partitions"} for audit. The repartition is by the
    partition column (plus a bounded salt when >1 file is requested), so
    each output task writes exactly one file of one partition — no
    cross-partition shuffle amplification.
    """
    df = spark.read.parquet(src_dir)
    if target_files_per_partition <= 1:
        parts = [F.col(partition_col)]
    else:
        parts = [F.col(partition_col),
                 (F.abs(F.hash("*")) % target_files_per_partition)]
    out = df.repartition(*parts)
    (out.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(partition_col)
        .parquet(dst_dir))
    back = spark.read.parquet(dst_dir)
    return {
        "rows": back.count(),
        "partitions": back.select(partition_col).distinct().count(),
    }
