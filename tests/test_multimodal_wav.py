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
