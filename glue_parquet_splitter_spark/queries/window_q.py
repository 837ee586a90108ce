"""Window function queries (SURVEY.md §2 taxonomy: absent from the
reference, mandated for the engine). All orderings carry a unique
tie-break key so results are deterministic across engines."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


@register(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey,
                                               o_totalprice NULLS LAST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey,
                                               o_totalprice NULLS LAST) AS BIGINT) AS order_seq
    FROM orders
    """,
    tags=("window",),
)
def window_running_sum(spark, sf_dir):
    o = _orders(spark, sf_dir)
    # total-order: the running sum CARRIES o_totalprice, so the order
    # key includes it — a duplicate o_orderkey pair with a mutated
    # price (--dupkeys) is otherwise order-tied and the prefix sums
    # become a dice roll (r15 window-totality lint); residual ties are
    # equal in every referenced column.  No-op on pk-unique fixtures.
    w = W.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey",
        F.asc_nulls_last("o_totalprice"))
    return o.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias("running_total"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@register(
    "window_rank_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(RANK()       OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6)     AS prnk,
           ROUND(CUME_DIST() OVER w, 6)        AS cdist,
           CAST(NTILE(4) OVER w AS BIGINT)     AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def window_rank_funcs(spark, sf_dir):
    o = _orders(spark, sf_dir)
    # total-order: residual ties are duplicate (o_totalprice,
    # o_orderkey) pairs; rank/dense_rank/percent_rank/cume_dist are
    # tie-stable, and ntile's differing buckets attach to rows equal
    # in every selected column — the output multiset is roll-invariant
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_orderkey,
           ROUND(COALESCE(o_totalprice - LAG(o_totalprice) OVER w, 0), 2)  AS delta_prev,
           ROUND(COALESCE(LEAD(o_totalprice) OVER w - o_totalprice, 0), 2) AS delta_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey,
                                                 o_totalprice NULLS LAST)
    """,
    tags=("window",),
)
def window_lag_lead(spark, sf_dir):
    o = _orders(spark, sf_dir)
    # total-order: lag/lead CARRY o_totalprice, so the order key ends
    # with it — duplicate o_orderkey pairs with a mutated price are
    # otherwise order-tied and the deltas (their own and their
    # neighbors') roll dice (r15 window-totality lint); residual ties
    # are equal in every referenced column.  No-op on pk-unique data.
    w = W.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey",
        F.asc_nulls_last("o_totalprice"))
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.coalesce(tp - F.lag(tp).over(w), F.lit(0)), 2).alias("delta_prev"),
        F.round(F.coalesce(F.lead(tp).over(w) - tp, F.lit(0)), 2).alias("delta_next"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT o_orderkey,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderdate NULLS LAST, o_orderkey,
                                                     o_totalprice NULLS LAST
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
    FROM orders
    """,
    tags=("window",),
)
def window_moving_avg(spark, sf_dir):
    o = _orders(spark, sf_dir)
    # total-order: the 3-row moving average CARRIES o_totalprice, so
    # the order key ends with it — otherwise a duplicate o_orderkey
    # pair with a mutated price is order-tied and every ma3 touching
    # the pair rolls dice (r15 window-totality lint); residual ties
    # are equal in every referenced column.  No-op on pk-unique data.
    w = (W.partitionBy("o_orderpriority")
         .orderBy(F.asc_nulls_last("o_orderdate"), "o_orderkey",
                  F.asc_nulls_last("o_totalprice"))
         .rowsBetween(-2, W.currentRow))
    return o.select(
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("ma3"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           CAST(COUNT(*) OVER (
               ORDER BY o_totalprice
               RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_5k
    FROM orders
    """,
    tags=("window",),
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over a numeric ordering — count of orders within
    $5000 below each order's price."""
    o = _orders(spark, sf_dir)
    # bounded: RANGE-frame semantics demo on the fixture orders table —
    # the frame spec is the tested surface; the scale form adds
    # partitionBy(month(o_orderdate)) with per-month range frames
    w = W.orderBy("o_totalprice").rangeBetween(-5000, W.currentRow)
    return o.select(
        "o_orderkey",
        F.count("*").over(w).cast("long").alias("n_within_5k"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT o_orderkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS cheapest,
           ROUND(LAST_VALUE(o_totalprice)  OVER w, 2) AS priciest,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_first_last(spark, sf_dir):
    o = _orders(spark, sf_dir)
    # total-order: the picks carry o_totalprice, which LEADS the order
    # key — tied rows are equal in every referenced column, so
    # first/last/nth_value are roll-invariant
    w = (W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return o.select(
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("cheapest"),
        F.round(F.last("o_totalprice").over(w), 2).alias("priciest"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_cheapest"),
    )


@register(
    "ntile_balance_quartiles",
    oracle="""
    WITH t AS (
      SELECT c_mktsegment,
             NTILE(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal NULLS LAST, c_custkey) AS q,
             c_acctbal
      FROM customer
    )
    SELECT c_mktsegment, CAST(q AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(c_acctbal), 2) AS lo,
           ROUND(MAX(c_acctbal), 2) AS hi
    FROM t GROUP BY c_mktsegment, q
    """,
    tags=("window", "ntile"),
)
def ntile_balance_quartiles(spark, sf_dir):
    """NTILE(4) balance quartiles per market segment with each tile's
    row count and balance range — the classic equi-count banding
    window (ties broken by c_custkey so tile edges are deterministic
    in both engines).

    Scale: one shuffle on the segment key; the rollup after is tile-
    granular.  NTILE needs the partition ordered — for a partition too
    big to sort in one task, the histogram-decile form
    (``quality_decile_mix_histogram``) is the scale substitute.
    """
    cust = load_table(spark, sf_dir, "customer")
    # explicit NULLS LAST: unknown balances band into the top tile in
    # BOTH engines (Spark bare ASC = nulls first, DuckDB = nulls last —
    # fuzz_oracle.py)
    # total-order: residual ties are duplicate (c_acctbal, c_custkey)
    # pairs occupying adjacent fixed positions — ntile assigns the
    # same quartiles to those positions whatever the roll, and the
    # rollup only reads c_acctbal, which is tie-equal
    w = W.partitionBy("c_mktsegment").orderBy(
        F.asc_nulls_last("c_acctbal"), "c_custkey")
    t = cust.select(
        "c_mktsegment", "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"))
    return t.groupBy("c_mktsegment", "quartile").agg(
        F.count("*").alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
    )
