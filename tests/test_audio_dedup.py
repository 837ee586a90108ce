"""Audio fingerprint dedup (VERDICT r10 #6): planted clipped and
re-padded duplicate clips must be recovered at containment 1.0, and
the candidate plan must be the banded (win_idx, energy) equi-join."""

import pyspark.sql.functions as F

from glue_parquet_splitter_spark.catalog import load_table
from glue_parquet_splitter_spark.operators import multimodal as M
from glue_parquet_splitter_spark.queries import load_all_modules

REG = load_all_modules()


def test_band_energy_frames_integer_exact(spark, sf_dir):
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull() & (F.col("n_chars") >= 1))
            .orderBy("doc_id").limit(5))
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    bands = M.wav_band_energy(M.pack_wav(docs), window=8).collect()
    by_doc = {}
    for r in bands:
        by_doc.setdefault(r["doc_id"], {})[r["win_idx"]] = r
    for doc_id, text in rows.items():
        k = len(text) // 8
        assert len(by_doc.get(doc_id, {})) == k
        for i in range(k):
            expect = sum(ord(c) for c in text[8 * i:8 * i + 8])
            assert by_doc[doc_id][i]["energy"] == expect
            assert by_doc[doc_id][i]["n_windows"] == k


def test_planted_clip_and_pad_twins_recovered(spark, sf_dir):
    out = REG["audio_fingerprint_dedup"].fn(spark, sf_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    docs = {r["doc_id"]: r["n_chars"] for r in
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "n_chars").collect()}
    clip_expected = [d for d in docs if d % 7 == 0 and docs[d] >= 72]
    pad_expected = [d for d in docs if d % 11 == 0 and docs[d] >= 8]
    assert clip_expected and pad_expected, "fixture lost its plants"
    for d in clip_expected:
        r = pairs.get((d, d + 200000))
        assert r is not None and r["containment"] == 1.0 and r["planted"]
        # shared counts KEPT (DF-capped) keys only — at most the 8
        # full frames of the 64-sample clip
        assert 1 <= r["shared_windows"] <= 8
    for d in pad_expected:
        r = pairs.get((d, d + 300000))
        assert r is not None and r["containment"] == 1.0 and r["planted"]
        assert 1 <= r["shared_windows"] <= docs[d] // 8


def test_audio_dedup_plan_is_banded_join(spark, sf_dir):
    from glue_parquet_splitter_spark.plans import physical_plan

    plan = physical_plan(REG["audio_fingerprint_dedup"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "win_idx" in plan and "energy" in plan
    assert "SinglePartition" not in plan
