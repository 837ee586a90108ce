"""The split operator: fan a day's rows out into one parquet per key.

Reference semantics (/root/reference/src/Split/parquet-splitter.py:153-171):
for input day ``d``, every distinct ``item_id`` value ``k`` yields an
output object ``<out>/<k>/<d>.parquet`` holding exactly
``input[input.item_id == k]`` with input row order preserved; an empty
input is skipped; a missing ``item_id`` column is a hard error.

Two writers:

- :func:`write_partitioned` — the idiomatic scale path:
  ``df.write.partitionBy(key)``. One shuffle-free distributed write;
  Hive layout ``item_id=<k>/part-*.parquet``. At 100 TB this is the
  right shape (parallel tasks, S3A committer, ``maxRecordsPerFile`` to
  bound small files).

- :func:`split_day` with ``exact_layout=True`` — parity mode
  reproducing the reference's ``<k>/<d>.parquet`` layout and row order
  via ``repartition(key).applyInPandas`` (one Arrow batch per key,
  order restored from a pre-shuffle row-id). Group files are written
  through pyarrow.fs (:func:`write_parquet_object`), so output paths
  may be plain local paths or ``file://``/``s3://``/``s3a://``/
  ``gs://``/``hdfs://`` URIs — no extra executor dependencies.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ORDER_COL = "__row_order"


def resolve_fs(path: str):
    """(pyarrow filesystem, in-fs path) for a plain path or URI.

    Executor-side parity writes go through pyarrow.fs — built into the
    pyarrow wheel Spark already requires, so local, ``file://``,
    ``s3://``/``s3a://``, ``gs://`` and ``hdfs://`` all work without
    fsspec/s3fs on the workers.  Hadoop's ``s3a``/``s3n`` scheme names
    map onto pyarrow's S3 implementation.
    """
    from pyarrow import fs as pafs

    if path.startswith(("s3a://", "s3n://")):
        path = "s3://" + path.split("://", 1)[1]
    if path.startswith("file:"):
        # Hadoop renders local URIs as file:/x (single slash); pyarrow
        # only accepts file:///x — normalize both to a plain path
        return pafs.LocalFileSystem(), "/" + path[5:].lstrip("/")
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def write_parquet_object(pdf: pd.DataFrame, path: str) -> None:
    """Write one pandas frame as a single parquet object at ``path``
    (any pyarrow-supported filesystem; parent dirs created)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    filesystem, fs_path = resolve_fs(path)
    parent = fs_path.rsplit("/", 1)[0]
    filesystem.create_dir(parent, recursive=True)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        fs_path, filesystem=filesystem, compression="snappy",
    )


def require_columns(df: DataFrame, cols: Iterable[str]) -> None:
    """Schema assertion (reference parquet-splitter.py:157-159)."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"required column(s) missing: {missing}")


def write_partitioned(df: DataFrame, out_dir: str, key: str = "item_id",
                      max_records_per_file: int = 5_000_000) -> None:
    """Idiomatic Spark partitioned write (Hive layout ``key=value/``).

    ``maxRecordsPerFile`` bounds file size at scale; snappy parquet is
    the Spark default (matches the reference's codec choice,
    parquet-splitter.py:96-98).
    """
    require_columns(df, [key])
    (df.write.mode("overwrite")
       .option("maxRecordsPerFile", str(max_records_per_file))
       .partitionBy(key)
       .parquet(out_dir))


def split_day(df: DataFrame, out_dir: str, date: str, key: str = "item_id",
              exact_layout: bool = True) -> list[str]:
    """Split one day's DataFrame by ``key`` into ``<out>/<k>/<date>.parquet``.

    Returns the list of output paths (the marker manifest's ``outputs``,
    reference parquet-splitter.py:162-171).  Row order within each
    output equals input order (pandas-groupby semantics the reference's
    golden files exhibit), restored from a monotonic row id captured
    before the shuffle.

    The returned list is collected to the driver — one row per key,
    fine at reference shape.  At millions of keys/day use
    ``run_incremental(..., manifest="counts")`` (executor-written
    manifests, in-plan counts, no driver-side per-key list) or
    :func:`write_partitioned`.
    """
    require_columns(df, [key])
    # Reference parity: pandas groupby silently drops NaN keys
    # (parquet-splitter.py:166, pandas dropna=True default) — drop
    # null-key rows explicitly so the fan-out is total over outputs.
    df = df.filter(F.col(key).isNotNull())
    if df.isEmpty():
        return []
    if not exact_layout:
        day_dir = f"{out_dir}/date={date}"
        write_partitioned(df, day_dir, key)
        return [day_dir]

    manifest = (
        split_day_manifest(df, out_dir, date, key=key)
        .collect()  # manifest only: one row per key, not per data row
    )
    return sorted(r.out_path for r in manifest)


def split_day_manifest(df: DataFrame, out_dir: str, date: str,
                       key: str = "item_id") -> DataFrame:
    """One day's exact-layout fan-out as a LAZY manifest DataFrame
    (``out_path``, ``rows`` — one row per key).  The per-key parquet
    writes happen when the returned frame is consumed, so a caller can
    aggregate counts or sink the manifest from executors without the
    driver ever holding the per-key list (the ``manifest="counts"``
    scale path of ``run_incremental``)."""
    ordered = df.withColumn(ORDER_COL, F.monotonically_increasing_id())

    def _write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ORDER_COL).drop(columns=[ORDER_COL])
        k = pdf[key].iloc[0]
        path = f"{out_dir}/{k}/{date}.parquet"
        write_parquet_object(pdf, path)
        return pd.DataFrame({"out_path": [path], "rows": [len(pdf)]})

    return ordered.groupBy(key).applyInPandas(
        _write_group, schema="out_path string, rows long")


def split_counts(df: DataFrame, key: str = "item_id") -> DataFrame:
    """Per-key row counts + distinct-key cardinality helper.

    Mirrors the reference's success log (``nunique`` at
    parquet-splitter.py:173) as a DataFrame instead of a driver loop.
    """
    return df.groupBy(key).agg(F.count("*").alias("rows"))
