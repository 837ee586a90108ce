"""Property-based tests for the warehouse ops (SURVEY.md §5 model):
MERGE and sessionization invariants over random inputs — the oracle
hash pins one fixture; these pin the semantics for all inputs."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# small key space so matched/unmatched/delete cases all occur often
base_rows = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 1000)),
    min_size=0, max_size=25, unique_by=lambda t: t[0],
)
change_rows = st.lists(
    st.tuples(st.integers(0, 30), st.sampled_from(["U", "D"]),
              st.integers(1, 1000)),
    min_size=0, max_size=25, unique_by=lambda t: t[0],
)


def _merge(spark, base, changes):
    """The merge_upsert_apply join shape over arbitrary inputs."""
    b = spark.createDataFrame(
        pd.DataFrame(base, columns=["k", "v"]), "k long, v long"
    ).alias("b")
    c = spark.createDataFrame(
        pd.DataFrame(changes, columns=["k", "op", "nv"]),
        "k long, op string, nv long",
    ).alias("c")
    j = b.join(c, F.col("b.k") == F.col("c.k"), "full_outer")
    matched = F.col("b.k").isNotNull()
    return (
        j.where(F.coalesce(F.col("c.op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("b.k"), F.col("c.k")).alias("k"),
            F.when(F.col("c.op") == "U", F.col("c.nv"))
            .otherwise(F.col("b.v")).alias("v"),
            F.when((F.col("c.op") == "U") & matched, F.lit("updated"))
            .when(F.col("c.op") == "U", F.lit("inserted"))
            .otherwise(F.lit("kept")).alias("action"),
        )
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base=base_rows, changes=change_rows)
def test_merge_semantics_for_all_inputs(base, changes, spark):
    out = {r.k: (r.v, r.action) for r in _merge(spark, base, changes).collect()}
    bd = dict(base)
    cd = {k: (op, nv) for k, op, nv in changes}

    expect_keys = ({k for k in bd if cd.get(k, ("", 0))[0] != "D"}
                   | {k for k, (op, _) in cd.items() if op == "U"})
    assert set(out) == expect_keys
    for k, (v, action) in out.items():
        if k in cd and cd[k][0] == "U":
            assert v == cd[k][1]
            assert action == ("updated" if k in bd else "inserted")
        else:
            assert v == bd[k] and action == "kept"


event_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50_000)),  # (user, seconds)
    min_size=1, max_size=30,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=event_rows)
def test_sessionize_gap_invariants(data, spark):
    """Sessions partition each user's events; consecutive events within
    a session are ≤ the gap apart; session boundaries exceed it."""
    GAP = 1800
    rows = [(i, u, s) for i, (u, s) in enumerate(data)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["eid", "u", "sec"]),
        "eid long, u long, sec long",
    )
    w = Window.partitionBy("u").orderBy("sec", "eid")
    gap = F.col("sec") - F.lag("sec").over(w)
    flagged = df.withColumn(
        "new_s", F.when(gap.isNull() | (gap > GAP), 1).otherwise(0)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("sid", F.sum("new_s").over(run)).collect()

    per_user: dict[int, list] = {}
    for r in sorted(sess, key=lambda r: (r.u, r.sec, r.eid)):
        per_user.setdefault(r.u, []).append(r)
    n_assigned = 0
    for rs in per_user.values():
        n_assigned += len(rs)
        for a, b in zip(rs, rs[1:]):
            if b.sid == a.sid:
                assert b.sec - a.sec <= GAP
            else:
                assert b.sid == a.sid + 1  # contiguous ids
                assert b.sec - a.sec > GAP
    assert n_assigned == len(data)  # partition: every event in a session
