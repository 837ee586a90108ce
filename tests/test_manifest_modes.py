"""Marker-manifest modes: reference-parity "outputs" vs scale "counts".

VERDICT r3 flagged the exact-layout manifest collect
(`incremental.py` / `splitter.py`) as the one driver-side list that
breaks at millions of keys/day.  `manifest="counts"` replaces it with
executor-written per-day manifest files + an in-plan count.  These
tests pin the equivalence contract: identical marker semantics, and a
per-key list that never lands on the driver.
"""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.pipeline import run_incremental

N_DAYS = 3
N_KEYS = 40
ROWS_PER_DAY = 400


def _make_input(spark, tmp, in_dir):
    os.makedirs(in_dir, exist_ok=True)
    for i, date in enumerate(f"202502{d:02d}" for d in range(1, N_DAYS + 1)):
        df = spark.range(ROWS_PER_DAY).select(
            F.lit(date).alias("date"),
            F.lpad((F.col("id") % N_KEYS).cast("string"), 10, "0").alias("item_id"),
            (F.col("id") % 7).alias("sales_figures"),
        )
        stage = f"{tmp}/stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(f"{stage}/{part}", f"{in_dir}/{date}.parquet")


@pytest.fixture(scope="module")
def both_runs(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("manifest_modes"))
    in_dir = f"{tmp}/input"
    _make_input(spark, tmp, in_dir)
    summaries = {}
    for mode in ("outputs", "counts"):
        summaries[mode] = run_incremental(
            spark, "t", in_dir, f"{tmp}/out_{mode}", f"{tmp}/markers_{mode}",
            manifest=mode)
    return tmp, summaries


def _markers(tmp, mode):
    docs = {}
    for p in glob.glob(f"{tmp}/markers_{mode}/*.json"):
        with open(p) as f:
            docs[os.path.basename(p)[:-5]] = json.load(f)
    return docs


def test_both_modes_process_all_days(both_runs):
    _, summaries = both_runs
    assert summaries["outputs"]["processed_days"] == N_DAYS
    assert summaries["counts"]["processed_days"] == N_DAYS


def test_marker_docs_equivalent(both_runs):
    """counts-mode markers carry the same commit facts; the outputs
    list is reachable through the manifest pointer and identical."""
    tmp, _ = both_runs
    a, b = _markers(tmp, "outputs"), _markers(tmp, "counts")
    assert set(a) == set(b) and len(a) == N_DAYS
    for date in a:
        da, db = a[date], b[date]
        for fld in ("kind", "date", "output_count"):
            assert da[fld] == db[fld], (date, fld)
        assert da["input_key"] == db["input_key"]
        assert da["output_count"] == N_KEYS
        # exact mode embeds the list; counts mode points at a manifest
        assert "outputs" in da and "outputs_manifest" not in da
        assert "outputs" not in db and "outputs_manifest" in db
        manifest_rows = []
        for mp in glob.glob(f"{db['outputs_manifest']}/*.json"):
            with open(mp) as f:
                manifest_rows += [
                    r for r in (json.loads(line) for line in f if line.strip())
                    # skip day-presence rows (null out_path): they mark
                    # days whose rows were all null-keyed, not outputs
                    if r.get("out_path") is not None
                ]
        # same output set, modulo the mode-specific output root
        rel = lambda paths, root: sorted(  # noqa: E731
            p.split(root, 1)[1] for p in paths)
        assert rel([r["out_path"] for r in manifest_rows], "out_counts") == \
            rel(da["outputs"], "out_outputs")


def test_counts_mode_data_files_match_exact_mode(both_runs):
    tmp, _ = both_runs
    import duckdb

    for date in ("20250201", "20250203"):
        for k in ("0000000000", "0000000013"):
            qa = duckdb.sql(
                f"SELECT * FROM '{tmp}/out_outputs/{k}/{date}.parquet'").df()
            qb = duckdb.sql(
                f"SELECT * FROM '{tmp}/out_counts/{k}/{date}.parquet'").df()
            assert qa.equals(qb)


def test_counts_mode_idempotent(both_runs, spark):
    tmp, _ = both_runs
    again = run_incremental(spark, "t", f"{tmp}/input", f"{tmp}/out_counts",
                            f"{tmp}/markers_counts", manifest="counts")
    assert again["processed_days"] == 0


def test_manifest_count_aggregation_stays_in_plan_at_1e6_keys(spark, tmp_path):
    """The scale claim: a million (key, day) manifest rows round-trip
    through the executor-written JSON manifest and the driver sees only
    one count row per day — never the per-key list."""
    run_dir = str(tmp_path / "run")
    n = 1_000_000
    manifest_df = spark.range(n).select(
        F.concat(F.lit("2025030"), (F.col("id") % 3 + 1).cast("string")
                 ).alias("date"),
        F.concat(F.lit("out/k"), F.col("id").cast("string")).alias("out_path"),
    )
    (manifest_df.repartition("date")
     .write.mode("overwrite").partitionBy("date").json(run_dir))
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(infer_key, "true")
    spark.conf.set(infer_key, "false")
    try:
        counts = spark.read.json(run_dir).groupBy("date").count().collect()
    finally:
        spark.conf.set(infer_key, prev)
    assert len(counts) == 3  # driver materializes 3 rows, not 1e6
    assert sorted((r["date"], r["count"]) for r in counts) == [
        ("20250301", 333334), ("20250302", 333333), ("20250303", 333333)]


def test_day_by_day_fallback_honors_counts_mode(spark, tmp_path):
    """A counts-mode run forced down the day-by-day path (corrupt file
    in the backlog breaks the batch job) must still write counts-schema
    markers for the good days — not silently degrade to driver-side
    output lists (mixed marker schemas)."""
    tmp = str(tmp_path)
    in_dir = f"{tmp}/input"
    _make_input(spark, tmp, in_dir)
    with open(f"{in_dir}/20250204.parquet", "wb") as f:
        f.write(b"not a parquet file")  # poisons the batch read
    summary = run_incremental(spark, "t", in_dir, f"{tmp}/out",
                              f"{tmp}/markers_fb", manifest="counts")
    assert summary["processed_days"] == N_DAYS  # bad day skipped, rest ok
    docs = _markers(tmp, "fb")
    assert set(docs) == {f"202502{d:02d}" for d in range(1, N_DAYS + 1)}
    for date, doc in docs.items():
        assert "outputs" not in doc, f"{date}: fallback wrote outputs list"
        assert doc["output_count"] == N_KEYS
        rows = []
        for mp in glob.glob(f"{doc['outputs_manifest']}/*.json"):
            with open(mp) as f:
                rows += [json.loads(line) for line in f if line.strip()]
        assert len(rows) == N_KEYS
        assert all(os.path.exists(r["out_path"]) for r in rows)


def test_gc_reclaims_orphaned_manifest_runs(spark, tmp_path):
    """Reopening a day re-points its marker at a new run dir; the old
    run dir is orphaned and the end-of-run GC removes it."""
    from glue_parquet_splitter_spark.pipeline.incremental import (
        gc_manifest_runs,
    )

    tmp = str(tmp_path)
    in_dir = f"{tmp}/input"
    _make_input(spark, tmp, in_dir)
    marker_dir = f"{tmp}/markers"
    run_incremental(spark, "t", in_dir, f"{tmp}/out", marker_dir,
                    manifest="counts")
    runs = lambda: sorted(  # noqa: E731
        os.listdir(f"{marker_dir}/_manifests"))
    assert len(runs()) == 1
    live = runs()[0]

    # orphan: a crashed/abandoned run no marker references
    os.makedirs(f"{marker_dir}/_manifests/run-deadbeef0000/date=20250201")
    assert len(runs()) == 2
    removed = gc_manifest_runs(spark, marker_dir)
    assert removed == 1 and runs() == [live]

    # reopen one day (touch its input so the fingerprint changes):
    # its marker re-points at a NEW run dir; the next counts-mode run's
    # GC keeps both dirs that still back some marker, drops none extra
    os.utime(f"{in_dir}/20250202.parquet", (1e9, 1e9))
    again = run_incremental(spark, "t", in_dir, f"{tmp}/out", marker_dir,
                            manifest="counts", reprocess_changed=True)
    assert again["processed_days"] == 1
    assert len(runs()) == 2  # old run still backs 2 markers, new backs 1
    with open(f"{marker_dir}/20250202.json") as f:
        assert live not in json.load(f)["outputs_manifest"]


def test_gc_survives_corrupt_marker(spark, tmp_path):
    """ADVICE r5: one unreadable marker must not disable GC forever.
    Run dirs no newer than the bad marker are kept (it might reference
    one of them); newer orphans are still collected."""
    import time as _time

    from glue_parquet_splitter_spark.pipeline.incremental import (
        gc_manifest_runs,
    )

    tmp = str(tmp_path)
    in_dir = f"{tmp}/input"
    _make_input(spark, tmp, in_dir)
    marker_dir = f"{tmp}/markers"
    run_incremental(spark, "t", in_dir, f"{tmp}/out", marker_dir,
                    manifest="counts")
    runs = lambda: sorted(  # noqa: E731
        os.listdir(f"{marker_dir}/_manifests"))
    live = runs()[0]

    # an old orphan, then a corrupt marker NEWER than it, then a newer
    # orphan — only the newer orphan is safely collectable
    old_orphan = f"{marker_dir}/_manifests/run-000000000bad"
    os.makedirs(f"{old_orphan}/date=20250201")
    t0 = _time.time()
    os.utime(old_orphan, (t0 - 300, t0 - 300))
    with open(f"{marker_dir}/99999999.json", "w") as f:
        f.write("{corrupt")
    os.utime(f"{marker_dir}/99999999.json", (t0 - 200, t0 - 200))
    new_orphan = f"{marker_dir}/_manifests/run-00000000cafe"
    os.makedirs(f"{new_orphan}/date=20250202")
    os.utime(new_orphan, (t0 - 100, t0 - 100))

    removed = gc_manifest_runs(spark, marker_dir)
    assert removed == 1
    assert sorted(runs()) == sorted([live, "run-000000000bad"])

    # once the marker is repaired (here: removed), the old orphan goes
    os.remove(f"{marker_dir}/99999999.json")
    assert gc_manifest_runs(spark, marker_dir) == 1
    assert runs() == [live]
