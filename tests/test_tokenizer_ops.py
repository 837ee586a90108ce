"""Semantic invariants of the tokenizer-family operators (round 10
wave 2) — properties the DuckDB oracle compare cannot express:
chunk reassembly, BPE monotonicity, containment bounds.
"""

import pytest
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.catalog import load_table
from glue_parquet_splitter_spark.queries import load_all_modules
from glue_parquet_splitter_spark.queries.tokenizer_q import (
    _BPE_K,
    _cdc_chunks,
)

REG = load_all_modules()


def test_cdc_chunks_reassemble_exactly(spark, sf_dir):
    """Boundary list must tile each doc: chunk lengths sum to n_chars,
    starts are contiguous (start_k+1 = start_k + len_k), every length
    is positive — i.e. the chunker loses and duplicates nothing."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars")
    ch = _cdc_chunks(d)
    agg = (ch.groupBy("doc_id")
           .agg(F.sum("chunk_len").alias("total"),
                F.min("chunk_len").alias("mn"),
                F.max(F.col("chunk_start") + F.col("chunk_len"))
                .alias("last_end")))
    bad = (agg.join(d.select("doc_id", "n_chars"), "doc_id")
           .filter((F.col("total") != F.col("n_chars"))
                   | (F.col("mn") <= 0)
                   | (F.col("last_end") != F.col("n_chars"))))
    assert bad.count() == 0
    # contiguity: next start == start + len within each doc
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("chunk_start")
    gaps = (ch.withColumn("nxt", F.lead("chunk_start").over(w))
            .filter(F.col("nxt").isNotNull()
                    & (F.col("nxt") != F.col("chunk_start")
                       + F.col("chunk_len"))))
    assert gaps.count() == 0


def test_cdc_resilience_orders_methods(spark, sf_dir):
    """CDC must beat fixed-stride on fingerprint survival under a head
    insertion — the property the operator exists for."""
    rows = {r["method"]: r for r in
            REG["cdc_shift_resilience"].fn(spark, sf_dir).collect()}
    assert rows["cdc"]["mean_shared_frac"] > 0.5
    assert rows["fixed"]["mean_shared_frac"] < 0.05
    assert rows["cdc"]["mean_shared_frac"] > rows["fixed"]["mean_shared_frac"]


def test_bpe_merges_shape_and_monotone_counts(spark, sf_dir):
    """K merge rows; each merged symbol is the pair with the space
    dropped; pair counts never increase with rank (the argmax of a
    shrinking pool)."""
    rows = (REG["bpe_learn_merges"].fn(spark, sf_dir)
            .orderBy("merge_rank").collect())
    assert len(rows) == _BPE_K
    for r in rows:
        assert r["merged"] == r["pair"].replace(" ", "")
        assert r["pcnt"] > 0
    counts = [r["pcnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_bpe_encode_compresses(spark, sf_dir):
    """Per language: n_words <= n_bpe_tokens <= total chars, and
    chars_per_token > 1 (4 merges must compress SOMETHING)."""
    rows = REG["bpe_encode_apply"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["chars_per_token"] >= 1.0
    assert any(r["chars_per_token"] > 1.0 for r in rows)


def test_cdc_containment_bounds(spark, sf_dir):
    rows = REG["cdc_containment_pairs"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["shared"] >= 2
        assert 0.0 < r["containment"] <= 1.0


def test_novelty_first_batch_is_all_new(spark, sf_dir):
    """Batch 0 by construction has novelty_rate 1.0 (nothing precedes
    it); later batches never exceed it."""
    rows = {r["batch"]: r for r in
            REG["ngram_novelty_saturation"].fn(spark, sf_dir).collect()}
    assert rows[0]["novelty_rate"] == pytest.approx(1.0)
    assert all(r["novelty_rate"] <= 1.0 for r in rows.values())
    assert all(r["n_first_seen"] <= r["n_distinct_grams"]
               for r in rows.values())
