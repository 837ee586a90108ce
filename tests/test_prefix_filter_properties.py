"""Losslessness property test for PPJoin-style prefix filtering:
``operators.dedup.prefix_filtered_jaccard_pairs`` must return exactly
the brute-force Jaccard ≥ t pair set on arbitrary generated element
sets — the oracle gate only exercises the fixture corpus; hypothesis
explores tiny sets, identical sets, disjoint sets, and threshold
boundaries where the prefix-length arithmetic is off-by-one-prone."""

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_parquet_splitter_spark.operators.dedup import (
    prefix_filtered_jaccard_pairs,
)

ELEMS = st.integers(min_value=0, max_value=12)


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(min_value=2, max_value=8))
    docs = {}
    for d in range(n_docs):
        s = draw(st.sets(ELEMS, min_size=1, max_size=8))
        docs[d] = s
    t = draw(st.sampled_from([0.3, 0.5, 0.8]))
    return docs, t


def brute_force(docs, t):
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(docs[a] & docs[b])
            union = len(docs[a] | docs[b])
            j = round(inter / union, 4)
            if j >= t:
                out[(a, b)] = j
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus())
def test_prefix_filter_is_lossless(spark, case):
    docs, t = case
    rows = [(d, f"e{e}") for d, es in docs.items() for e in sorted(es)]
    sh = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "shingle"]))
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in prefix_filtered_jaccard_pairs(sh, t).collect()}
    assert got == brute_force(docs, t)
