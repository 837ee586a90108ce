"""Materialized funnel pipeline (VERDICT r10 #4): stage-table schemas,
audit == lazy-v3 equality, and the plan pin that the audit reads ONLY
the materialized signal tables (4 scans + raw-free joins, not v3's
~36 pruned source scans)."""

import re

from glue_parquet_splitter_spark.pipeline.funnel import (
    SIGNAL_TABLES,
    funnel_audit,
    materialize_funnel_signals,
)
from glue_parquet_splitter_spark.plans import physical_plan

_EXPECTED_SCHEMAS = {
    "sig_dedup": {"doc_id"},
    "sig_nll": {"doc_id", "avg_nll", "n_bigrams"},
    "sig_clf": {"doc_id", "pred_en"},
    "sig_pct": {"doc_id", "source", "pct"},
}


def test_stage_tables_materialize_with_contracted_schemas(
        spark, sf_dir, tmp_path):
    paths = materialize_funnel_signals(spark, sf_dir, str(tmp_path))
    assert set(paths) == set(SIGNAL_TABLES)
    for name, path in paths.items():
        df = spark.read.parquet(path)
        assert set(df.columns) == _EXPECTED_SCHEMAS[name], name
        assert df.count() > 0, f"{name} materialized empty"


def test_audit_equals_lazy_v3(spark, sf_dir, tmp_path):
    from glue_parquet_splitter_spark.queries import load_all_modules

    reg = load_all_modules()
    materialize_funnel_signals(spark, sf_dir, str(tmp_path))
    audit = funnel_audit(spark, str(tmp_path))
    v3 = reg["curation_funnel_v3"].fn(spark, sf_dir)
    key = lambda r: tuple(sorted(r.asDict().items()))  # noqa: E731
    assert sorted(map(key, audit.collect())) == \
        sorted(map(key, v3.collect()))


def test_audit_plan_reads_only_signal_tables(spark, sf_dir, tmp_path):
    """The audit's scans must all be signal-table scans (sig_*.parquet)
    — none of v3's winnowing windows / vocab aggregation / classifier
    re-scoring machinery survives into the audit plan."""
    materialize_funnel_signals(spark, sf_dir, str(tmp_path))
    plan = physical_plan(funnel_audit(spark, str(tmp_path)))
    scans = re.findall(r"Scan parquet[^\n]*", plan)
    assert scans, "expected parquet scans in the audit plan"
    for s in scans:
        # the explain line truncates long paths, so pin the scan by its
        # ReadSchema: no scan may touch the raw corpus columns
        assert "text:" not in s and "n_chars:" not in s, \
            f"raw-corpus scan in audit plan: {s}"
        assert "/sig" in s or "sig_" in s, \
            f"non-signal scan in audit plan: {s}"
    # one scan per signal table (nll is read twice: threshold + join)
    assert 4 <= len(scans) <= 6
    # the heavy signal machinery must be gone
    assert "FlatMapGroupsInPandas" not in plan
    assert "Generate explode" not in plan
