"""Streaming foreachBatch upsert sink: latest-row-per-key maintenance
with idempotent dynamic-partition overwrites."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.catalog import load_table
from glue_parquet_splitter_spark.streaming.upsert_sink import run_upsert_stream


def _expected_latest(spark, src_path):
    from pyspark.sql import Window

    ev = spark.read.parquet(src_path)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"))
    return (
        ev.withColumn("rn", F.row_number().over(w)).where("rn = 1")
        .select("user_id", "event_id").toPandas()
        .sort_values("user_id").reset_index(drop=True)
    )


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    # µs timestamps so the raw stream (no ns fixup needed) sorts correctly
    load_table(spark, sf_dir, "events").limit(4000).coalesce(2).write.parquet(src)
    return src


def test_upsert_maintains_latest_per_key(spark, events_dir, tmp_path):
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    run_upsert_stream(spark, events_dir, target, checkpoint_dir=ckpt)

    got = (
        spark.read.parquet(target).select("user_id", "event_id").toPandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _expected_latest(spark, events_dir))


def test_upsert_incremental_and_idempotent(spark, events_dir, tmp_path):
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    run_upsert_stream(spark, events_dir, target, checkpoint_dir=ckpt)
    first = spark.read.parquet(target)
    n_first = first.count()

    # re-drain with the same checkpoint: no new files -> target unchanged
    run_upsert_stream(spark, events_dir, target, checkpoint_dir=ckpt)
    assert spark.read.parquet(target).count() == n_first

    # land a late file moving every seen user to a newer event, re-drain
    bump = (
        spark.read.parquet(events_dir)
        .groupBy("user_id").agg(F.max("ts").alias("ts"))
        .select(
            (F.lit(10_000_000) + F.monotonically_increasing_id()).alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"),
            "user_id",
            F.lit("upsert").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    bump.coalesce(1).write.mode("append").parquet(events_dir)
    run_upsert_stream(spark, events_dir, target, checkpoint_dir=ckpt)

    final = spark.read.parquet(target)
    assert final.count() == n_first  # still one row per user
    assert final.where(F.col("event_type") == "upsert").count() == n_first


def test_upsert_raises_on_foreign_target(spark, events_dir, tmp_path):
    """A target that exists but isn't this sink's layout (no __bucket
    partition column) must fail loudly — treating it as 'first batch'
    would overwrite stored data with batch-only rows."""
    target = str(tmp_path / "target")
    spark.range(5).write.parquet(target)  # foreign table at the path
    with pytest.raises(Exception) as ei:
        run_upsert_stream(spark, events_dir, target,
                          checkpoint_dir=str(tmp_path / "ckpt"))
    assert "PATH_NOT_FOUND" not in str(ei.value)
