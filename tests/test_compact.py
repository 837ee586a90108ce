"""Small-file compaction: fewer files, identical rows, crash-safe
swap protocol (source untouched until the verified copy is in place).
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.pipeline import (
    compact_dataset,
    count_data_files,
)


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A scale-layout dataset fragmented into many small files: 20
    append writes of 500 rows across 8 keys — like 20 days of splits."""
    out = str(tmp_path / "data")
    for day in range(20):
        df = spark.range(500).select(
            F.lpad((F.col("id") % 8).cast("string"), 10, "0").alias("item_id"),
            (F.col("id") + day * 500).alias("row_id"),
            (F.col("id") % 97).alias("sales_figures"),
        )
        (df.repartition(4).write.mode("append")
         .partitionBy("item_id").parquet(out))
    return out


def test_compact_reduces_files_preserves_rows(spark, fragmented):
    before = count_data_files(spark, fragmented)
    assert before >= 8 * 20  # genuinely fragmented

    checksum_sql = (
        "SELECT COUNT(*) AS n, SUM(row_id) AS s1, SUM(sales_figures) AS s2 "
        f"FROM read_parquet('{fragmented}/*/*.parquet', "
        "hive_partitioning=true)")
    pre = duckdb.sql(checksum_sql).fetchone()

    summary = compact_dataset(spark, fragmented, partition_by=["item_id"])
    assert summary["rows"] == 20 * 500
    assert summary["files_before"] == before
    assert summary["files_after"] <= 8  # one file per key partition
    assert count_data_files(spark, fragmented) == summary["files_after"]

    post = duckdb.sql(checksum_sql).fetchone()
    assert pre == post
    # no leftovers from the swap protocol
    parent = os.path.dirname(fragmented)
    assert sorted(os.listdir(parent)) == [os.path.basename(fragmented)]


def test_compact_refuses_leftover_dirs(spark, fragmented):
    os.makedirs(fragmented + "__precompact")
    with pytest.raises(RuntimeError, match="leftover"):
        compact_dataset(spark, fragmented, partition_by=["item_id"])


def test_compact_keep_backup(spark, fragmented):
    summary = compact_dataset(spark, fragmented, partition_by=["item_id"],
                              keep_backup=True)
    assert summary["backup"] == fragmented + "__precompact"
    assert os.path.isdir(summary["backup"])
    n_backup = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{summary['backup']}/*/*.parquet',"
        " hive_partitioning=true)").fetchone()[0]
    assert n_backup == 20 * 500


def test_compact_unpartitioned(spark, tmp_path):
    out = str(tmp_path / "flat")
    for _ in range(10):
        spark.range(100).repartition(5).write.mode("append").parquet(out)
    before = count_data_files(spark, out)
    assert before >= 50
    summary = compact_dataset(spark, out)
    assert summary["rows"] == 1000
    assert summary["files_after"] < before
    n = duckdb.sql(f"SELECT COUNT(*) FROM '{out}/*.parquet'").fetchone()[0]
    assert n == 1000


def test_content_fingerprint_detects_value_corruption(spark):
    """Equal row counts, one corrupted value → different fingerprint
    (the case a count-only verify waves through); order/partitioning
    of rows does not affect it."""
    from pyspark.sql import functions as F

    from glue_parquet_splitter_spark.pipeline.compact import (
        content_fingerprint_cols,
    )

    def fp(df):
        return df.agg(*content_fingerprint_cols(df)).collect()[0]

    base = spark.range(10_000).select(
        F.lpad((F.col("id") % 8).cast("string"), 10, "0").alias("item_id"),
        F.col("id").alias("v"))
    a, b = fp(base), fp(base.orderBy(F.desc("v")).repartition(13))
    assert (a.n, a.fp) == (b.n, b.fp)  # order/layout-insensitive

    corrupted = base.withColumn(
        "v", F.when(F.col("v") == 4321, F.lit(-1)).otherwise(F.col("v")))
    c = fp(corrupted)
    assert c.n == a.n and c.fp != a.fp

    # the ADVICE scenario: a re-typed partition key (string '0000000005'
    # -> int 5) changes the fingerprint even though counts match
    retyped = base.withColumn("item_id", F.col("item_id").cast("long"))
    assert fp(retyped).fp != fp(base).fp
