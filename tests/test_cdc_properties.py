"""Property tests for the content-defined chunker: for ANY ASCII text
(including docs shorter than the 16-char hash window and single-char
docs), the chunks must tile the doc exactly and reassemble to the
original text, and boundaries must be content-determined (identical
text => identical chunking, regardless of doc_id).
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.queries.tokenizer_q import _cdc_chunks

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1, max_size=400)


def _chunk_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long")
    return (_cdc_chunks(df)
            .orderBy("doc_id", "chunk_start").collect())


@settings(max_examples=12, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=1, max_size=6))
def test_chunks_tile_and_reassemble(spark, texts):
    rows = _chunk_rows(spark, texts)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(texts)))
    for i, t in enumerate(texts):
        chunks = by_doc[i]
        # contiguous tiling from 0 to n_chars, all lengths positive
        pos = 0
        for c in chunks:
            assert c["chunk_start"] == pos
            assert c["chunk_len"] > 0
            pos += c["chunk_len"]
        assert pos == len(t)


@settings(max_examples=8, deadline=None)
@given(ASCII_TEXT)
def test_chunking_is_content_determined(spark, text):
    """Same text under two different doc_ids chunks identically —
    boundaries depend on CONTENT only (the CDC property)."""
    rows = _chunk_rows(spark, [text, text])
    a = [(r["chunk_start"], r["chunk_len"], r["chunk_md5"])
         for r in rows if r["doc_id"] == 0]
    b = [(r["chunk_start"], r["chunk_len"], r["chunk_md5"])
         for r in rows if r["doc_id"] == 1]
    assert a == b and len(a) >= 1
