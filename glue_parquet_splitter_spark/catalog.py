"""Table loading for the driver fixtures and reference sample data.

The fixture tables (TESTDATA.md) are plain parquet files; the only
special case is ``events`` whose ``ts`` column is parquet
TIMESTAMP(NANOS) — Spark's reader rejects it, so we read nanos as long
(``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds,
matching what the DuckDB oracle sees (DuckDB surfaces the same column as
a µs TIMESTAMP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy parquet scan)."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos epoch → µs-truncated timestamp (same value DuckDB reads).
        # Integer `div`, NOT float division: double ulp at 1.7e18 is
        # 256 ns, which mis-truncates ~13% of values by 1 µs.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return normalize_ntz(df)


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (instant).

    Fixture parquet written with naive (non-UTC-adjusted) timestamps is
    read by Spark 3.4+ as TIMESTAMP_NTZ, which cannot be a watermark
    column and rejects ``cast(bigint)``.  Casting to TimestampType
    preserves the wall-clock fields (the session timezone is applied on
    the way in and again by ``date_format``/``to_date`` on the way out),
    so results match what DuckDB computes on the same naive values.
    """
    ntz_cols = [f.name for f in df.schema.fields
                if f.dataType.simpleString() == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
