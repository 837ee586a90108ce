"""Marker-sink writer (Spark 4 Python DataSource write path): the
counterpart of the `split_markers` reader — rows out to one
`<date>.json` marker per day, with a two-phase temp-then-rename commit
so failed tasks never publish half-written markers."""

import os

import pytest
from pyspark.sql import Row

from glue_parquet_splitter_spark.sources.markers import (
    SCHEMA,
    read_markers,
    register_marker_source,
)

ROWS = [
    Row(kind="outputs", date="20250101", input_key="in/20250101.parquet",
        input_fingerprint="123:456", output_count=30,
        outputs_manifest=None, generated_at="2025-01-02T00:00:00Z"),
    Row(kind="counts", date="20250102", input_key="in/20250102.parquet",
        input_fingerprint="124:457", output_count=28,
        outputs_manifest="manifests/run1", generated_at="2025-01-03T00:00:00Z"),
]


def _write(spark, rows, dest, mode):
    register_marker_source(spark)
    df = spark.createDataFrame(rows, schema=SCHEMA)
    df.write.format("split_markers").mode(mode).save(dest)


def test_roundtrip_and_no_temp_leftovers(spark, tmp_path):
    dest = str(tmp_path / "markers")
    _write(spark, ROWS, dest, "append")
    assert sorted(os.listdir(dest)) == ["20250101.json", "20250102.json"]

    back = {r["date"]: r.asDict() for r in read_markers(spark, dest).collect()}
    assert back["20250101"]["output_count"] == 30
    assert back["20250101"]["kind"] == "outputs"
    assert back["20250102"]["outputs_manifest"] == "manifests/run1"
    assert back["20250102"]["input_fingerprint"] == "124:457"


def test_append_then_overwrite(spark, tmp_path):
    dest = str(tmp_path / "markers")
    _write(spark, ROWS, dest, "append")
    extra = [ROWS[0].asDict() | {"date": "20250103"}]
    _write(spark, [Row(**e) for e in extra], dest, "append")
    assert len(os.listdir(dest)) == 3

    _write(spark, [ROWS[0]], dest, "overwrite")
    assert os.listdir(dest) == ["20250101.json"]


def test_failed_write_publishes_nothing(spark, tmp_path):
    """A task failure (null date) must abort the whole write: no
    visible marker, no temp debris — the marker-last discipline."""
    dest = str(tmp_path / "markers")
    _write(spark, ROWS, dest, "append")
    bad = [Row(**(ROWS[0].asDict() | {"date": "20250104"})),
           Row(**(ROWS[0].asDict() | {"date": None}))]
    with pytest.raises(Exception):
        _write(spark, bad, dest, "append")
    # the two committed markers survive; nothing new is visible and no
    # .tmp files are left behind
    assert sorted(os.listdir(dest)) == ["20250101.json", "20250102.json"]


def test_failed_overwrite_preserves_existing(spark, tmp_path):
    """Overwrite's deletion must be deferred to commit(): a FAILED
    overwrite job (bad row aborts the write) may not destroy the
    previously committed markers — before the r7 fix, __init__ deleted
    them at write-planning time, before any task ran."""
    dest = str(tmp_path / "markers")
    _write(spark, ROWS, dest, "append")
    bad = [Row(**(ROWS[0].asDict() | {"date": None}))]
    with pytest.raises(Exception):
        _write(spark, bad, dest, "overwrite")
    assert sorted(os.listdir(dest)) == ["20250101.json", "20250102.json"]


def test_successful_overwrite_drops_stale_after_publish(spark, tmp_path):
    """A successful overwrite publishes the new markers first, then
    drops only the stale ones (pre-existing, not re-written)."""
    dest = str(tmp_path / "markers")
    _write(spark, ROWS, dest, "append")
    # overwrite with a REWRITE of 20250101 plus a new day; 20250102 is
    # stale and must disappear, the rewrite must carry the new count
    newer = [Row(**(ROWS[0].asDict() | {"output_count": 7})),
             Row(**(ROWS[0].asDict() | {"date": "20250105"}))]
    _write(spark, newer, dest, "overwrite")
    assert sorted(os.listdir(dest)) == ["20250101.json", "20250105.json"]
    back = {r["date"]: r["output_count"]
            for r in read_markers(spark, dest).collect()}
    assert back == {"20250101": 7, "20250105": 30}


def test_midtask_failure_cleans_own_temps(spark, tmp_path):
    """Good-row-then-bad-row in the SAME task: the Python DataSource
    API has no task-level abort and driver abort() only sees messages
    from successful tasks, so the failing task itself must delete the
    temps it already staged — no .tmp debris, nothing visible."""
    dest = str(tmp_path / "markers")
    register_marker_source(spark)
    bad = [Row(**(ROWS[0].asDict() | {"date": "20250110"})),
           Row(**(ROWS[0].asDict() | {"date": None}))]
    df = spark.createDataFrame(bad, schema=SCHEMA).coalesce(1)
    assert df.rdd.getNumPartitions() == 1  # one task stages then fails
    with pytest.raises(Exception):
        df.write.format("split_markers").mode("append").save(dest)
    assert os.listdir(dest) == []  # includes dotfiles — no temp debris


def test_read_through_scheme_carrying_uri(spark, tmp_path):
    """VERDICT r6 #5: the multi-FS listing/read fix (base-name
    partitions re-resolved against the scheme-carrying marker_dir) was
    only exercised on plain local paths — pin it through a file:// URI,
    which takes the same re-prefix path as s3://d/gs:// dirs."""
    dest = str(tmp_path / "markers")
    _write(spark, ROWS, dest, "append")
    back = {r["date"]: r["output_count"]
            for r in read_markers(spark, f"file://{dest}").collect()}
    assert back == {"20250101": 30, "20250102": 28}


def test_stream_sink_incremental_and_idempotent(spark, tmp_path):
    """writeStream.format('split_markers'): each drained micro-batch
    publishes markers; a restart from the same checkpoint processes
    only new files, and re-emitting a date rewrites the same
    <date>.json (idempotent by name) instead of duplicating."""
    src, dest, ckpt = (str(tmp_path / p) for p in ["src", "markers", "ckpt"])
    os.makedirs(src)
    register_marker_source(spark)

    def land(rows, tag):
        stage = str(tmp_path / f"st_{tag}")
        spark.createDataFrame(rows, schema=SCHEMA).coalesce(1) \
            .write.parquet(stage)
        for i, f in enumerate(sorted(os.listdir(stage))):
            if f.endswith(".parquet"):
                os.rename(f"{stage}/{f}", f"{src}/{tag}_{i}.parquet")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA).parquet(src)
            .writeStream.format("split_markers")
            .option("checkpointLocation", ckpt)
            .option("path", dest)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    land([ROWS[0]], "a")
    drain()
    assert os.listdir(dest) == ["20250101.json"]

    # second batch: a new date plus a REWRITE of 20250101 with a new
    # count — the same visible name must be replaced, not duplicated
    land([Row(**(ROWS[0].asDict() | {"output_count": 99})),
          ROWS[1]], "b")
    drain()
    assert sorted(os.listdir(dest)) == ["20250101.json", "20250102.json"]
    back = {r["date"]: r["output_count"]
            for r in read_markers(spark, dest).collect()}
    assert back == {"20250101": 99, "20250102": 28}


def test_abort_sweeps_killed_task_temps(tmp_path):
    """Commit messages only cover tasks that FINISHED: a task killed
    mid-write (job abort racing a live task) leaves a staged temp and
    no message — observed as a real suite flake.  abort() must sweep
    every remaining *.tmp OF ITS OWN JOB (the job token is in every
    temp name — ADVICE r8), while committed markers AND a concurrent
    foreign job's staged temps survive untouched."""
    from glue_parquet_splitter_spark.sources.markers import MarkerWriter

    dest = str(tmp_path / "markers")
    w = MarkerWriter(dest, overwrite=False)
    # a committed marker, a message-covered temp, an orphan temp from
    # this job's killed task, and a FOREIGN job's staged temp
    with open(os.path.join(dest, "20250101.json"), "w") as f:
        f.write("{}")
    covered = f".20250102.json.{w.job_token}.aaaa1111.tmp"
    orphan = f".20250103.json.{w.job_token}.bbbb2222.tmp"
    foreign = ".20250103.json.feedbeef.cccc3333.tmp"
    for t in (covered, orphan, foreign):
        with open(os.path.join(dest, t), "w") as f:
            f.write("partial")

    class _Msg:
        pairs = [(covered, "20250102.json")]

    w.abort([_Msg(), None])   # None = the failed task's slot
    assert sorted(os.listdir(dest)) == sorted(["20250101.json", foreign])
