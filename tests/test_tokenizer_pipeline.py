"""Materialized tokenizer pipeline (VERDICT r11 #7): stage-table
schemas, manifest quota exactness, and the plan pin that the audit
reads ONLY the materialized stage tables — no corpus scan, no greedy
encoder, no pandas FFD."""

import re

import pyspark.sql.functions as F

from glue_parquet_splitter_spark.pipeline.tokenize import (
    MANIFEST_BUDGET,
    STAGE_TABLES,
    materialize_tokenizer_stages,
    tokenizer_audit,
)
from glue_parquet_splitter_spark.plans import physical_plan

_EXPECTED_SCHEMAS = {
    "tok_stats": {"doc_id", "lang", "source", "n_tokens", "n_chars",
                  "n_wp_tokens"},
    "tok_bins": {"doc_id", "bucket", "salt", "bin_idx", "toks"},
    "tok_manifest": {"source", "doc_id"},
}


def test_stage_tables_materialize_with_contracted_schemas(
        spark, sf_dir, tmp_path):
    paths = materialize_tokenizer_stages(spark, sf_dir, str(tmp_path))
    assert set(paths) == set(STAGE_TABLES)
    for name, path in paths.items():
        df = spark.read.parquet(path)
        assert set(df.columns) == _EXPECTED_SCHEMAS[name], name
        assert df.count() > 0, f"{name} materialized empty"


def test_manifest_quota_is_exact_and_deterministic(spark, sf_dir,
                                                   tmp_path):
    """Hamilton exactness: the manifest ships exactly min(budget,
    corpus) docs, never more than each source's packed count, and two
    materializations are byte-identical."""
    materialize_tokenizer_stages(spark, sf_dir, str(tmp_path / "a"))
    man = spark.read.parquet(str(tmp_path / "a" / "tok_manifest.parquet"))
    stats = spark.read.parquet(str(tmp_path / "a" / "tok_stats.parquet"))
    n_corpus = stats.count()
    assert man.count() == min(MANIFEST_BUDGET, n_corpus)
    per_src = {r["source"]: r["n"] for r in
               man.groupBy("source").agg(F.count("*").alias("n"))
               .collect()}
    avail = {r["source"]: r["n"] for r in
             stats.groupBy("source").agg(F.count("*").alias("n"))
             .collect()}
    for src, n in per_src.items():
        assert n <= avail[src], src
    materialize_tokenizer_stages(spark, sf_dir, str(tmp_path / "b"))
    a = sorted(map(tuple, man.collect()))
    b = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "b" / "tok_manifest.parquet")).collect()))
    assert a == b


def test_wp_tokens_bounded_by_chars(spark, sf_dir, tmp_path):
    """Per doc: every WordPiece piece covers >= 1 char and a piece
    spans <= 3 chars, so chars/3 <= n_wp_tokens <= n_chars for any
    doc with words (0 for empty/space-only docs), and the corpus has
    real token mass."""
    materialize_tokenizer_stages(spark, sf_dir, str(tmp_path))
    stats = spark.read.parquet(str(tmp_path / "tok_stats.parquet"))
    assert stats.filter(F.col("n_wp_tokens") > F.col("n_chars")
                        ).count() == 0
    assert stats.agg(F.sum("n_wp_tokens")).collect()[0][0] > 0


def test_audit_plan_reads_only_stage_tables(spark, sf_dir, tmp_path):
    """The audit's scans must all be stage-table scans — none of the
    encoder/FFD machinery survives into the audit plan."""
    materialize_tokenizer_stages(spark, sf_dir, str(tmp_path))
    plan = physical_plan(tokenizer_audit(spark, str(tmp_path)))
    scans = re.findall(r"Scan parquet[^\n]*", plan)
    assert scans, "expected parquet scans in the audit plan"
    for s in scans:
        assert "text:" not in s, f"raw-corpus scan in audit plan: {s}"
        assert "/tok" in s or "tok_" in s, \
            f"non-stage scan in audit plan: {s}"
    assert 3 <= len(scans) <= 4
    assert "FlatMapGroupsInPandas" not in plan   # no pandas FFD
    assert "MapInPandas" not in plan             # no greedy encoder
