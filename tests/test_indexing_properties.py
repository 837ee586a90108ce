"""Ground-truth property test for the distributed zipWithIndex:
``operators.indexing.global_row_index`` must equal the rank of the key
(``ROW_NUMBER() - 1``) for arbitrary unique key sets and bucket counts
— the oracle gate only exercises the fixture's dense doc_id sequence;
hypothesis explores gaps, negatives, tiny relations, and bucket counts
that force empty/duplicate-boundary buckets."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_parquet_splitter_spark.operators.indexing import global_row_index


@st.composite
def index_case(draw):
    keys = draw(st.lists(
        st.integers(min_value=-1_000_000, max_value=1_000_000),
        min_size=1, max_size=60, unique=True))
    n_parts = draw(st.integers(min_value=1, max_value=7))
    return keys, n_parts


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(index_case())
def test_global_row_index_matches_rank(spark, case):
    keys, n_parts = case
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    out = global_row_index(df, ["k"], num_partitions=n_parts).toPandas()
    expected = {k: i for i, k in enumerate(sorted(keys))}
    got = dict(zip(out["k"], out["row_idx"]))
    assert got == expected
