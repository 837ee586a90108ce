"""Ground-truth property test for the weighted-median window algebra
(`weighted_median_per_group`'s cumulative-weight form): against a
direct numpy computation on arbitrary generated weights — the oracle
gate only proves Spark == DuckDB on the fixture; this proves BOTH
implement the textbook lower weighted median (smallest x with
cumulative weight ≥ half the total) on adversarial shapes: single
rows, all-equal values, one giant weight, exact half-boundaries."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def numpy_lower_weighted_median(vals, weights):
    order = np.argsort(vals, kind="stable")
    v, w = np.asarray(vals)[order], np.asarray(weights)[order]
    cum = np.cumsum(w)
    return float(v[np.searchsorted(cum, cum[-1] / 2.0)])


CASE = st.lists(
    st.tuples(st.integers(min_value=-50, max_value=50),   # value
              st.integers(min_value=1, max_value=20)),    # weight
    min_size=1, max_size=40)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(CASE, min_size=1, max_size=3))
def test_weighted_median_window_algebra_matches_numpy(spark, groups):
    rows = [(g, float(v), w)
            for g, case in enumerate(groups) for v, w in case]
    df = spark.createDataFrame(rows, "g int, v double, w long")
    # same shape as the registry query: reduce to (g, v) cells, then
    # cumulative weight over the ordered support, pick the boundary
    pts = df.groupBy("g", "v").agg(F.sum("w").alias("w"))
    wp = Window.partitionBy("g")
    cum = pts.select(
        "g", "v",
        F.sum("w").over(wp.orderBy("v")).alias("cw"),
        F.sum("w").over(wp).alias("tw"))
    got = {
        r["g"]: r["wm"]
        for r in cum.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("g").agg(F.min("v").alias("wm")).collect()
    }
    for g, case in enumerate(groups):
        vals = [v for v, _ in case]
        weights = [w for _, w in case]
        assert got[g] == numpy_lower_weighted_median(vals, weights), (
            g, case)
