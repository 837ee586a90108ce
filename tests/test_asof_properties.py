"""Ground-truth property test for the as-of composition: the
union+running-fill form (`operators.timeseries.asof_backward`) must
equal pandas ``merge_asof`` on arbitrary generated data — the oracle
gate only exercises fixture distributions; hypothesis explores edge
shapes (empty sides, equal timestamps, keys with no matches, single-
row histories)."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_parquet_splitter_spark.operators.timeseries import asof_backward

KEYS = st.integers(min_value=0, max_value=3)
TIMES = st.integers(min_value=0, max_value=50)


@st.composite
def asof_case(draw):
    # right side unique per (key, t) — the operator's documented contract
    right = draw(st.lists(st.tuples(KEYS, TIMES), min_size=0, max_size=25,
                          unique=True))
    left = draw(st.lists(st.tuples(KEYS, TIMES), min_size=1, max_size=25))
    return left, right


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(asof_case())
def test_asof_backward_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    left_pdf = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "t", "row_id"])
    right_pdf = pd.DataFrame(
        [(k, t, 100 * k + t) for (k, t) in right_rows],
        columns=["k", "t", "v"])

    left = spark.createDataFrame(left_pdf)
    right = (spark.createDataFrame(right_pdf) if len(right_pdf) else
             spark.createDataFrame([], "k long, t long, v long"))
    got = {r.row_id: r.v for r in
           asof_backward(left, right, on="t", by=["k"],
                         values=["v"]).collect()}

    if len(right_pdf):
        want_pdf = pd.merge_asof(
            left_pdf.sort_values(["t", "row_id"]),
            right_pdf.sort_values("t"),
            on="t", by="k", direction="backward")
    else:
        want_pdf = left_pdf.assign(v=pd.NA)
    want = {int(r.row_id): (None if pd.isna(r.v) else int(r.v))
            for r in want_pdf.itertuples()}

    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(asof_case())
def test_asof_forward_matches_pandas_merge_asof(spark, case):
    from glue_parquet_splitter_spark.operators.timeseries import asof_forward

    left_rows, right_rows = case
    left_pdf = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "t", "row_id"])
    right_pdf = pd.DataFrame(
        [(k, t, 100 * k + t) for (k, t) in right_rows],
        columns=["k", "t", "v"])

    left = spark.createDataFrame(left_pdf)
    right = (spark.createDataFrame(right_pdf) if len(right_pdf) else
             spark.createDataFrame([], "k long, t long, v long"))
    got = {r.row_id: r.v for r in
           asof_forward(left, right, on="t", by=["k"],
                        values=["v"]).collect()}

    if len(right_pdf):
        want_pdf = pd.merge_asof(
            left_pdf.sort_values(["t", "row_id"]),
            right_pdf.sort_values("t"),
            on="t", by="k", direction="forward")
    else:
        want_pdf = left_pdf.assign(v=pd.NA)
    want = {int(r.row_id): (None if pd.isna(r.v) else int(r.v))
            for r in want_pdf.itertuples()}

    assert got == want
