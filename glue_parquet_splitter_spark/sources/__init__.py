"""Source connectors.

Batch parquet fixtures load through :mod:`..catalog`; streaming file
sources through :mod:`..streaming.windows`; media objects land via
:func:`read_binary_dir`. All are thin fronts over Spark's built-in
sources — the engine adds schema handling (ns timestamps), not I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import TABLES, load_all, load_table, register_views
from ..streaming.windows import events_stream as read_events_stream
from .markers import read_markers, register_marker_source


def read_binary_dir(spark: SparkSession, directory: str,
                    glob: str = "*") -> DataFrame:
    """Land opaque media objects as (path, modificationTime, length,
    content) rows — the ingestion edge of the multimodal operators
    (operators/multimodal.py decodes them via mapInPandas)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(directory)
    )


__all__ = ["TABLES", "load_table", "load_all", "register_views",
           "read_events_stream", "read_binary_dir", "read_markers",
           "register_marker_source"]
