"""Property-based tests for the split operator (SURVEY.md §5 plan #2):
∀ inputs — union of outputs == non-null-key input, outputs disjoint and
key-homogeneous, row order preserved within groups, null keys dropped
(reference pandas-groupby parity)."""

import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_parquet_splitter_spark.pipeline.splitter import split_day

keys = st.one_of(st.none(), st.sampled_from(["k1", "k2", "käy", "0003"]))
rows = st.lists(
    st.tuples(keys, st.integers(min_value=-1000, max_value=1000)),
    min_size=0, max_size=40,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=rows)
def test_split_partition_properties(data, spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("prop")
    pdf = pd.DataFrame(data, columns=["item_id", "val"])
    pdf["val"] = pdf["val"].astype("int64")
    df = spark.createDataFrame(pdf.astype({"item_id": object}),
                               schema="item_id string, val long")
    outputs = split_day(df, str(tmp / "out"), "20250101")

    nn = pdf[pdf.item_id.notna()].reset_index(drop=True)
    assert len(outputs) == nn.item_id.nunique()

    parts = []
    for path in outputs:
        part = pd.read_parquet(path)
        k = os.path.basename(os.path.dirname(path))
        assert (part["item_id"] == k).all()          # homogeneous
        expected = nn[nn.item_id == k].reset_index(drop=True)
        pd.testing.assert_frame_equal(part.reset_index(drop=True), expected)  # order kept
        parts.append(part)
    union = (pd.concat(parts, ignore_index=True) if parts
             else pd.DataFrame(columns=["item_id", "val"]))
    assert len(union) == len(nn)                     # union == input (sans null keys)
