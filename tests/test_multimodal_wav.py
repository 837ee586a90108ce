"""multimodal_decode_wav: the packed bytes must be a REAL WAV file —
validated by Python's stdlib `wave` reader, a parser we didn't write —
and the decoder must agree with it field for field.
"""

import io
import wave

from pyspark.sql import functions as F

from glue_parquet_splitter_spark.catalog import load_table
from glue_parquet_splitter_spark.operators.multimodal import (
    decode_wav,
    pack_wav,
)


def test_packed_bytes_open_with_stdlib_wave(spark, sf_dir):
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text", "n_chars")
            .orderBy("doc_id").limit(5))
    rows = {r["doc_id"]: r for r in docs.collect()}
    for p in pack_wav(docs).collect():
        with wave.open(io.BytesIO(bytes(p["payload"]))) as w:
            assert w.getframerate() == 8000
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 1
            assert w.getnframes() == rows[p["doc_id"]]["n_chars"]
            frames = w.readframes(w.getnframes())
        assert frames == rows[p["doc_id"]]["text"].encode()


def test_decode_agrees_with_stdlib(spark, sf_dir):
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text", "n_chars")
            .orderBy("doc_id").limit(5))
    packed = pack_wav(docs)
    decoded = {r["doc_id"]: r for r in decode_wav(packed).collect()}
    for p in packed.collect():
        with wave.open(io.BytesIO(bytes(p["payload"]))) as w:
            frames = w.readframes(w.getnframes())
        d = decoded[p["doc_id"]]
        assert d["n_samples"] == len(frames)
        assert d["duration_us"] == len(frames) * 125
        s, n = sum(frames), len(frames)
        assert d["mean_amp"] == ((s * 20000 + n) // (2 * n)) / 10000.0


def test_odd_length_payload_riff_even_padded(spark, sf_dir):
    """RIFF spec: chunks pad to even length — an odd-n_chars doc must
    carry one trailing zero pad byte EXCLUDED from the data-chunk size
    but INCLUDED in the RIFF size, so total file length is even and a
    strict chunk walker that steps `size + (size & 1)` lands exactly
    on end-of-file (ADVICE r10)."""
    import struct

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text", "n_chars")
            .filter(F.col("n_chars") % 2 == 1)
            .orderBy("doc_id").limit(3))
    assert docs.count() > 0, "fixture has no odd-length docs"
    rows = {r["doc_id"]: r for r in docs.collect()}
    for p in pack_wav(docs).collect():
        buf = bytes(p["payload"])
        n = rows[p["doc_id"]]["n_chars"]
        assert len(buf) % 2 == 0                       # even total
        assert len(buf) == 44 + n + 1                  # one pad byte
        (riff_size,) = struct.unpack("<I", buf[4:8])
        assert riff_size == 36 + n + 1                 # pad in RIFF size
        (data_size,) = struct.unpack("<I", buf[40:44])
        assert data_size == n                          # pad NOT in data size
        assert buf[-1] == 0                            # pad byte is zero
        assert buf[44:44 + n] == rows[p["doc_id"]]["text"].encode()


def test_bpe_checkpoint_lineage_cut_identical_merges(spark, sf_dir):
    """_bpe_train(checkpoint=True) localCheckpoints the vocab table per
    level (the O(K²)-recompute fix, ADVICE r10); merges and the final
    symbolization must be byte-identical to the checkpoint-free path."""
    from glue_parquet_splitter_spark.queries import tokenizer_q as T

    wf = T._word_freqs(spark, sf_dir)
    plain_m, plain_sym = T._bpe_train(wf, apply_last=True)
    ck_m, ck_sym = T._bpe_train(wf, apply_last=True, checkpoint=True)
    for a, b in zip(plain_m, ck_m):
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))
    assert sorted(map(tuple, plain_sym.collect())) == \
        sorted(map(tuple, ck_sym.collect()))
