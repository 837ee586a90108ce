"""Small-file compaction for split outputs.

The split pipeline's exact layout accrues one file per (key, day) —
after a year of dailies that is 365 small objects per key, and at
millions of keys the listing itself becomes the bottleneck (the classic
object-store small-file problem).  Compaction rewrites a dataset with
the same rows into the same partition layout but target-sized files.

Pattern (safe on object stores, no in-place mutation):

1. read the dataset, count rows in the same job
2. write the compacted copy to ``<dir>__compacting`` (partition layout
   preserved, ``maxRecordsPerFile`` bounds file size)
3. verify the copy's row count equals the source's
4. atomic-ish swap: source → ``<dir>__precompact`` backup, copy → source
5. drop the backup only on ``keep_backup=False``

A crash before step 4 leaves the source untouched (re-run safe); a
crash between the two renames leaves the backup in place for manual
restore — the same conservative commit order as the marker protocol
(markers only after outputs, ``incremental.py``).
"""

from __future__ import annotations

import contextlib
import logging

from pyspark.sql import SparkSession

log = logging.getLogger(__name__)

_INFER_KEY = "spark.sql.sources.partitionColumnTypeInference.enabled"


@contextlib.contextmanager
def _verbatim_partition_values(spark: SparkSession):
    """Read hive partition values as strings, not inferred types.

    The split layout's partition values are zero-padded strings
    (``item_id=0000000005``); default inference would re-type them as
    long ``5`` and the compacted rewrite would silently corrupt every
    partition key.  Same guard as the counts-mode manifest read in
    ``incremental.py``.
    """
    prev = spark.conf.get(_INFER_KEY, "true")
    spark.conf.set(_INFER_KEY, "false")
    try:
        yield
    finally:
        spark.conf.set(_INFER_KEY, prev)


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def count_data_files(spark: SparkSession, directory: str,
                     suffix: str = ".parquet") -> int:
    """Recursive data-file count — the before/after compaction metric."""
    fs, hpath, _ = _hadoop_fs(spark, directory)
    if not fs.exists(hpath):
        return 0
    n = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            n += 1
    return n


def compact_dataset(spark: SparkSession, directory: str,
                    partition_by: list[str] | None = None,
                    max_records_per_file: int = 5_000_000,
                    keep_backup: bool = False) -> dict:
    """Rewrite ``directory`` into target-sized files, preserving rows
    and partition layout.  Returns a summary dict.

    ``partition_by`` must name the dataset's physical partition columns
    (e.g. ``["item_id"]`` for the scale split layout); ``None`` for an
    unpartitioned dataset.  Row-count equality is verified before the
    swap; any mismatch aborts with the source untouched.
    """
    partition_by = list(partition_by or [])
    src = directory.rstrip("/")
    tmp, backup = f"{src}__compacting", f"{src}__precompact"
    fs, src_path, jvm = _hadoop_fs(spark, src)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    backup_path = jvm.org.apache.hadoop.fs.Path(backup)
    for stale in (tmp_path, backup_path):
        if fs.exists(stale):  # prior crashed/unfinished run
            raise RuntimeError(
                f"refusing to compact: leftover {stale.toString()} exists "
                "(restore or delete it first)")

    with _verbatim_partition_values(spark):
        df = spark.read.parquet(src)
        files_before = count_data_files(spark, src)
        n_src = df.count()

        writer = (df.repartition(*partition_by) if partition_by
                  else df.coalesce(
                      max(1, spark.sparkContext.defaultParallelism))
                  ).write.mode("overwrite").option(
                      "maxRecordsPerFile", str(max_records_per_file))
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)

        n_tmp = spark.read.parquet(tmp).count()
    if n_tmp != n_src:
        fs.delete(tmp_path, True)
        raise RuntimeError(
            f"compaction row-count mismatch ({n_src} -> {n_tmp}); aborted, "
            "source untouched")

    if not fs.rename(src_path, backup_path):
        fs.delete(tmp_path, True)
        raise RuntimeError(f"could not move {src} aside; aborted")
    if not fs.rename(tmp_path, src_path):
        # restore the original before failing
        fs.rename(backup_path, src_path)
        raise RuntimeError(f"could not move compacted data into {src}; restored")
    if not keep_backup:
        fs.delete(backup_path, True)

    files_after = count_data_files(spark, src)
    summary = {
        "rows": n_src,
        "files_before": files_before,
        "files_after": files_after,
        "backup": backup if keep_backup else None,
    }
    log.info("[compact] %s: %s", src, summary)
    return summary
