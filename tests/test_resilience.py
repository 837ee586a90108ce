"""Fault-tolerance behaviors a 100 TB run depends on: corrupt-input
tolerance (one bad file among thousands must not kill a day's job) and
stateful-aggregation recovery from the checkpoint (an executor/driver
restart mid-backlog must resume window state, not recount from zero).

The reference's failure story is per-day try/except-and-skip
(src/Split/parquet-splitter.py:147-152); these pin the Spark-native
equivalents: ``ignoreCorruptFiles`` for scans and the state-store
checkpoint for streams.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F


def test_corrupt_file_skip(spark, sf_dir, tmp_path):
    """A garbage .parquet in the input dir: the default read fails the
    job, `ignoreCorruptFiles` serves every healthy row instead —
    the O8 missing/bad-source guard at scan granularity."""
    d = str(tmp_path / "in")
    os.makedirs(d)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.parquet(f"{d}/good")
    good = docs.count()
    with open(f"{d}/good/part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a parquet footer")

    with pytest.raises(Exception):
        spark.read.parquet(f"{d}/good").count()

    n = (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(f"{d}/good")
        .count()
    )
    assert n == good


def _drain_update_counts(spark, in_dir, ckpt, merged):
    """Run a watermarked tumbling-count stream over the parquet dir in
    update mode, folding each micro-batch's updated rows into
    ``merged`` (latest value per window wins — an idempotent upsert
    sink)."""
    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .parquet(in_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "n")
    )

    def sink(batch_df, _bid):
        for r in batch_df.collect():  # ≤ windows-per-batch rows
            merged[r["day"]] = r["n"]

    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windowed_state_recovers_across_restart(spark, sf_dir, tmp_path):
    """Kill-and-restart semantics for a stateful aggregation: drain
    half the days, stop, add the rest, restart from the SAME
    checkpoint — the merged update-mode output must equal the batch
    aggregate over all data.  If window state were lost on restart,
    the second drain would emit second-half-only counts for any day
    both halves touch."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("ts", "user_id")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    # split at a mid-day instant: run 2's rows all sit ABOVE the
    # watermark recovered from the checkpoint (max(A) - 1h), so none
    # are dropped as late, and the cut day's window spans both runs —
    # its final count is correct only if run 1's state was recovered
    cut = "2024-01-15 12:00:00"
    a = ev.where(F.col("ts") < cut)
    b = ev.where(F.col("ts") >= cut)

    def land(df, tag):
        # the file source watches in_dir flat — stage the half's part
        # files in with unique names, as an ingest job would
        stage = str(tmp_path / f"stage_{tag}")
        df.write.parquet(stage)
        for i, f_ in enumerate(sorted(os.listdir(stage))):
            if f_.endswith(".parquet"):
                shutil.move(f"{stage}/{f_}", f"{in_dir}/{tag}_{i}.parquet")

    land(a, "a")
    merged: dict[str, int] = {}
    _drain_update_counts(spark, in_dir, ckpt, merged)
    assert merged, "first drain produced no updates"

    land(b, "b")
    _drain_update_counts(spark, in_dir, ckpt, merged)

    expect = {
        r["day"]: r["n"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert merged == expect
    shutil.rmtree(in_dir, ignore_errors=True)
