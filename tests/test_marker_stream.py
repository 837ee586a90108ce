"""The marker protocol as a STREAMING source (Spark 4 Python
streaming data source, ``SimpleDataSourceStreamReader``): markers
committed by the split pipeline arrive as stream rows, incrementally —
a second drain with the same checkpoint serves only markers that
appeared after the first drain's offset."""

import os

import pytest
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.pipeline import run_incremental
from glue_parquet_splitter_spark.sources.markers import read_marker_stream

N_KEYS = 10
ROWS_PER_DAY = 100


def _write_day(spark, tmp, in_dir, i, date):
    os.makedirs(in_dir, exist_ok=True)
    df = spark.range(ROWS_PER_DAY).select(
        F.lit(date).alias("date"),
        F.lpad((F.col("id") % N_KEYS).cast("string"), 10, "0").alias("item_id"),
        (F.col("id") % 7).alias("sales_figures"),
    )
    stage = f"{tmp}/stage{i}"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.rename(f"{stage}/{part}", f"{in_dir}/{date}.parquet")


def _drain(spark, marker_dir, ckpt, sink):
    # parquet sink, not memory: the memory sink cannot recover from a
    # checkpoint, and checkpoint recovery IS what the incremental
    # assertions exercise
    q = (
        read_marker_stream(spark, marker_dir)
        .writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink)


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("marker_stream"))
    for i, date in enumerate(("20250301", "20250302")):
        _write_day(spark, tmp, f"{tmp}/input", i, date)
    run_incremental(spark, "t", f"{tmp}/input", f"{tmp}/out",
                    f"{tmp}/markers")
    return tmp


def test_first_drain_serves_all_markers(spark, env):
    out = _drain(spark, f"{env}/markers", f"{env}/ckpt", f"{env}/sink")
    rows = {r.date: r.output_count for r in out.collect()}
    assert rows == {"20250301": N_KEYS, "20250302": N_KEYS}


def test_second_drain_is_incremental(spark, env):
    # no new markers → zero new rows (offset held by the checkpoint)
    again = _drain(spark, f"{env}/markers", f"{env}/ckpt", f"{env}/sink")
    assert {r.date for r in again.collect()} == {"20250301", "20250302"}

    # a NEW day commits → the next drain appends exactly that marker
    _write_day(spark, env, f"{env}/input", 2, "20250303")
    run_incremental(spark, "t", f"{env}/input", f"{env}/out",
                    f"{env}/markers")
    after = _drain(spark, f"{env}/markers", f"{env}/ckpt", f"{env}/sink")
    rows = {r.date: r.output_count for r in after.collect()}
    assert rows == {"20250301": N_KEYS, "20250302": N_KEYS,
                    "20250303": N_KEYS}
    # and the third batch really was incremental: only one fresh row
    # beyond what the first two drains had already committed
    assert after.count() == 3


def test_stream_schema_matches_batch_source(spark, env):
    from glue_parquet_splitter_spark.sources.markers import read_markers

    batch = read_markers(spark, f"{env}/markers")
    stream_df = read_marker_stream(spark, f"{env}/markers")
    assert stream_df.schema == batch.schema
