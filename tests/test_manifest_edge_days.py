"""Edge-day marker semantics (ADVICE r5): a day whose rows are ALL
null-keyed must still commit a marker (empty outputs / 0 count) in
every mode — otherwise the batched driver re-schedules it forever and
the counts-mode manifest read used to crash on schema inference.  A
truly EMPTY day keeps the O9 skip semantics: no marker, retried."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.pipeline import run_incremental

SCHEMA = pa.schema([
    ("date", pa.string()),
    ("item_id", pa.string()),
    ("sales_figures", pa.int64()),
])


def _make_input(spark, in_dir):
    os.makedirs(in_dir, exist_ok=True)
    # 20250401: normal day (2 keys)
    pq.write_table(pa.table({
        "date": ["20250401"] * 4,
        "item_id": ["a", "a", "b", "b"],
        "sales_figures": [1, 2, 3, 4],
    }, schema=SCHEMA), f"{in_dir}/20250401.parquet")
    # 20250402: rows exist but every key is null
    pq.write_table(pa.table({
        "date": ["20250402"] * 3,
        "item_id": pa.array([None, None, None], pa.string()),
        "sales_figures": [5, 6, 7],
    }, schema=SCHEMA), f"{in_dir}/20250402.parquet")
    # 20250403: truly empty (0 rows, valid schema)
    pq.write_table(SCHEMA.empty_table(), f"{in_dir}/20250403.parquet")


def _markers(marker_dir):
    docs = {}
    for p in glob.glob(f"{marker_dir}/*.json"):
        with open(p) as f:
            docs[os.path.basename(p)[:-5]] = json.load(f)
    return docs


@pytest.mark.parametrize("mode", ["outputs", "counts"])
def test_all_null_day_commits_zero_marker(spark, tmp_path, mode):
    tmp = str(tmp_path)
    in_dir = f"{tmp}/input"
    _make_input(spark, in_dir)
    out, mk = f"{tmp}/out_{mode}", f"{tmp}/mk_{mode}"
    run_incremental(spark, "t", in_dir, out, mk, manifest=mode)

    docs = _markers(mk)
    # normal day processed, null day marked with zero outputs,
    # empty day skipped (O9) — no marker, retried next run
    assert set(docs) == {"20250401", "20250402"}
    assert docs["20250401"]["output_count"] == 2
    assert docs["20250402"]["output_count"] == 0
    if mode == "outputs" and "outputs" in docs["20250402"]:
        assert docs["20250402"]["outputs"] == []
    # no data files were written for the null day
    assert glob.glob(f"{out}/*/20250402.parquet") == []

    # second run: the two marked days stay settled; only the empty day
    # is re-examined (and skipped again)
    summary = run_incremental(spark, "t", in_dir, out, mk, manifest=mode)
    assert summary["processed_days"] == 0


@pytest.mark.parametrize("mode", ["outputs", "counts"])
def test_day_by_day_null_day_matches_batched(spark, tmp_path, mode):
    """The per-day fallback loop commits the same zero marker (the
    counts-mode read used to abort on the empty manifest dir)."""
    tmp = str(tmp_path)
    in_dir = f"{tmp}/input"
    _make_input(spark, in_dir)
    # a corrupt extra day forces the batched read to fall back
    with open(f"{in_dir}/20250404.parquet", "wb") as f:
        f.write(b"not parquet at all")
    out, mk = f"{tmp}/out_{mode}", f"{tmp}/mk_{mode}"
    run_incremental(spark, "t", in_dir, out, mk, manifest=mode)

    docs = _markers(mk)
    assert set(docs) == {"20250401", "20250402"}
    assert docs["20250402"]["output_count"] == 0
