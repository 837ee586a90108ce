"""Block-rebased EWMA: matches pandas ewm(adjust=True) to double
precision, and stays finite where the closed-form ``(1-α)^(-rn)``
rewrite overflows (unbounded per-key histories)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.operators.timeseries import (
    ewma,
    rebase_block_size,
)


def _spark_ewma(spark, values_by_key, alpha):
    pdf = pd.DataFrame(
        [(k, i, float(v)) for k, vs in values_by_key.items()
         for i, v in enumerate(vs)],
        columns=["k", "i", "x"])
    df = spark.createDataFrame(pdf).repartition(8)
    out = ewma(df, ["k"], ["i"], "x", alpha).toPandas()
    return {k: g.sort_values("rn")["ewma"].to_numpy()
            for k, g in out.groupby("k")}


@pytest.mark.parametrize("alpha", [0.5, 0.1, 0.01, 0.001])
def test_matches_pandas_every_row(spark, alpha):
    rng = np.random.default_rng(42)
    data = {f"u{i}": rng.normal(size=n).tolist()
            for i, n in enumerate([1, 2, 7, 100, 500])}
    got = _spark_ewma(spark, data, alpha)
    for k, vs in data.items():
        want = pd.Series(vs).ewm(alpha=alpha, adjust=True).mean().to_numpy()
        np.testing.assert_allclose(got[k], want, rtol=1e-9, atol=1e-12,
                                   err_msg=f"key {k} alpha {alpha}")


def test_unbounded_history_stays_finite(spark):
    """A 10⁵-event key: the naive weight (0.9)^(-1e5) is inf in
    float64; the rebased form matches pandas' recursive result."""
    alpha, n = 0.1, 100_000
    with np.errstate(over="ignore"):
        assert np.isinf((1 - alpha) ** -np.float64(n))  # naive form overflows
    rng = np.random.default_rng(7)
    vs = rng.normal(loc=3.0, size=n)
    got = _spark_ewma(spark, {"big": vs.tolist()}, alpha)["big"]
    assert np.isfinite(got).all()
    want = pd.Series(vs).ewm(alpha=alpha, adjust=True).mean().to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_block_size_bounds():
    for alpha in (0.9, 0.5, 0.1, 0.01, 1e-4):
        B = rebase_block_size(alpha)
        assert (1 - alpha) ** B < 1e-16          # truncation below ulp
        assert np.isfinite((1 - alpha) ** -np.float64(B))  # weights finite
    with pytest.raises(ValueError):
        rebase_block_size(0.0)


def test_matches_closed_form_query_small(spark, sf_dir):
    """On the bounded fixture the rebased operator reproduces the
    registry query's closed-form EWMA (last-event value per user)."""
    from glue_parquet_splitter_spark.catalog import load_table
    from glue_parquet_splitter_spark.queries.timeseries2_q import (
        ALPHA,
        ewma_user_value,
    )
    ev = load_table(spark, sf_dir, "events")
    rebased = ewma(ev, ["user_id"], ["ts", "event_id"], "value", ALPHA)
    last = rebased.groupBy("user_id").agg(
        F.max("rn").cast("long").alias("n_events"),
        F.round(F.max_by("ewma", "rn"), 4).alias("ewma_value"))
    want = {r.user_id: (r.n_events, r.ewma_value)
            for r in ewma_user_value(spark, sf_dir).collect()}
    got = {r.user_id: (r.n_events, r.ewma_value) for r in last.collect()}
    assert got == want
