"""Advanced operators: as-of join, range join, statistical aggregates,
ordered string aggregation, bitwise ops (SURVEY.md §2 extended-join row
and aggregate taxonomy)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "asof_join",
    oracle="""
    WITH od AS (
      SELECT o_custkey, o_orderdate,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(MAX(o_orderkey) AS BIGINT) AS last_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id AS event_id,
           strftime(o.o_orderdate, '%Y-%m-%d') AS asof_order_date,
           o.n_orders, o.last_orderkey
    FROM events e ASOF JOIN od o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("join", "asof"),
)
def asof_join(spark, sf_dir):
    """As-of join: each event matched to the user's most recent order
    day at event time. Spark lacks a native ASOF — composed scale-safe
    as a union + running last-value fill: tag order-day rows and event
    rows, union them, and within each user take the running
    last-non-null order attributes in time order (order rows sort
    before events at equal timestamps, so the `>=` bound is inclusive).
    One shuffle on the key, zero row explosion — unlike the
    inequality-join + top-1 form, whose intermediate is |events| × (all
    earlier order days of that user) and whose broadcast side grows
    with the fact table.  Orders are pre-aggregated per (cust, day) so
    the as-of pick is unique & deterministic."""
    from ..operators.timeseries import asof_backward

    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    od = o.groupBy("o_custkey", "o_orderdate").agg(
        F.count("*").alias("n_orders"),
        F.max("o_orderkey").alias("last_orderkey"),
    )
    # SQL ASOF equality semantics (--nullkeys fuzz): a NULL key never
    # matches (NULL = NULL is false) and a NULL order date never
    # satisfies the time bound — but the union+fill composition would
    # group NULL by-keys into one partition and let NULL-t rows seed
    # the fill, so NULL-key/NULL-date order rows are dropped up front.
    # Left events stay intact: unmatched rows fill NULL, which the
    # inner-shape filter (backward) or tolerance NULL-out (forward)
    # then handles identically to the SQL form.
    right = od.filter(F.col("o_custkey").isNotNull()
                      & F.col("o_orderdate").isNotNull()).select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        "o_orderdate", "n_orders", "last_orderkey",
    )
    left = ev.select("user_id", F.col("ts").alias("t"), "event_id")
    matched = asof_backward(left, right, on="t", by=["user_id"],
                            values=["o_orderdate", "n_orders",
                                    "last_orderkey"])
    return (
        matched.filter(F.col("o_orderdate").isNotNull())
        .select(
            "event_id",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("asof_order_date"),
            "n_orders", "last_orderkey",
        )
    )


@register(
    "range_join_events",
    oracle="""
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '60 seconds'
    """,
    tags=("join", "range"),
)
def range_join_events(spark, sf_dir):
    """Range (interval) self-join: pairs of same-user events within
    60 s — the building block of sequence/funnel mining. Equi-key on
    user_id keeps it a hash join with a range residual, not a BNLJ."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(F.col("event_id").alias("event_a"), F.col("user_id").alias("u"), F.col("ts").alias("ts_a"))
    b = ev.select(F.col("event_id").alias("event_b"), F.col("user_id").alias("u"), F.col("ts").alias("ts_b"))
    return (
        a.join(b, "u")
        .filter((F.col("ts_b") > F.col("ts_a")) &
                (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 60 SECONDS")))
        .select(
            "event_a", "event_b",
            (F.unix_timestamp(F.date_trunc("second", "ts_b"))
             - F.unix_timestamp(F.date_trunc("second", "ts_a"))).alias("gap_s"),
        )
    )


@register(
    "percentile_stats",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(median(o_totalprice), 4)              AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "stats"),
)
def percentile_stats(spark, sf_dir):
    """Exact interpolated percentiles (both engines use linear
    interpolation). The 100 TB variant is approx_percentile
    (t-digest) — see ``approx_percentile_stats`` (rows-only)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.median("o_totalprice"), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
    )


@register(
    "approx_percentile_stats",
    oracle="""
    SELECT o_orderstatus,
           ROUND(median(o_totalprice), 4) AS p50_exact,
           TRUE AS approx_in_rank_band
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "stats", "approx"),
)
def approx_percentile_stats(spark, sf_dir):
    """Sketch-based percentiles — single-pass, mergeable, the scale
    path.  Graded the sketch way: the oracle pins the exact
    interpolated median and asserts the accuracy flag TRUE; Spark
    computes the flag from the sketch's ACTUAL guarantee — a RANK
    band (approx between the exact DISCRETE p45 and p55 values), the
    ``approx_quantile_error_by_group`` pattern.  A relative-VALUE
    band is an invalid contract here: ``approx_percentile`` returns
    an actual data value, so on a tie-heavy even-count group whose
    interpolated median straddles two distant pool values (the
    ``--nan --nullkeys`` fuzz draw put the NULL-status group's exact
    median at 77.75 between actual values 55.5 and 100) every
    rank-correct answer is ~28 % off and the old ±1 % flag flipped.
    """
    o = load_table(spark, sf_dir, "orders")
    exact = F.percentile("o_totalprice", F.lit(0.5))
    est = F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000))
    return o.groupBy("o_orderstatus").agg(
        F.round(exact, 4).alias("p50_exact"),
        # coalesce: a group whose every measure is NULL has NULL
        # est/band bounds, so `between` is NULL — the band contract is
        # vacuously TRUE there (the oracle hardcodes TRUE); without it
        # a fuzz dimension that nulls measure columns flips this red
        F.coalesce(
            est.between(
                F.expr("percentile_disc(0.45) WITHIN GROUP "
                       "(ORDER BY o_totalprice)"),
                F.expr("percentile_disc(0.55) WITHIN GROUP "
                       "(ORDER BY o_totalprice)"),
            ),
            F.lit(True),
        ).alias("approx_in_rank_band"),
    )


@register(
    "corr_covar_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(covar_samp(l_quantity, l_extendedprice)
                 / (stddev_samp(l_quantity)
                    * stddev_samp(l_extendedprice)), 6) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           ROUND(stddev_samp(l_quantity), 6)                 AS qty_stddev,
           ROUND(var_samp(l_discount), 6)                    AS disc_var
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def corr_covar_stats(spark, sf_dir):
    """Correlation/covariance aggregates.  Pearson corr of a
    DEGENERATE group (either series constant, or a single row) is
    0/0: ANSI Spark RAISES Divide-by-zero INSIDE the corr aggregate
    (a when() guard around it cannot help — the aggregate still
    accumulates) while DuckDB's corr returns NULL.  So corr is
    spelled as covar_samp/(σx·σy) on BOTH engines — algebraically
    Pearson, and the zero/undefined-variance case degrades to NULL
    identically (try_divide here, NULL-on-/0 there).  Found by the
    --tiny --dupkeys sweep, where a 2-row group had tied
    quantities."""
    li = load_table(spark, sf_dir, "lineitem")
    corr_expr = F.try_divide(
        F.covar_samp("l_quantity", "l_extendedprice"),
        F.stddev_samp("l_quantity") * F.stddev_samp("l_extendedprice"))
    return li.groupBy("l_returnflag").agg(
        F.round(corr_expr, 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
    )


@register(
    "listagg_ordered",
    oracle="""
    SELECT n_regionkey AS region_key,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "string"),
)
def listagg_ordered(spark, sf_dir):
    """Ordered string aggregation — deterministic via sort_array over
    the collected list (collect_list order alone is not)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy(F.col("n_regionkey").alias("region_key")).agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations")
    )


@register(
    "bitwise_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT)            AS low_byte,
           CAST(l_orderkey | 4096 AS BIGINT)           AS with_flag,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT)  AS key_xor,
           CAST(l_linenumber << 4 AS BIGINT)           AS shifted,
           CAST(bit_count(l_orderkey) AS BIGINT)       AS popcount
    FROM lineitem
    """,
    tags=("scalar", "bitwise"),
)
def bitwise_ops(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.expr("l_orderkey & 255").cast("long").alias("low_byte"),
        F.expr("l_orderkey | 4096").cast("long").alias("with_flag"),
        F.expr("l_orderkey ^ l_partkey").cast("long").alias("key_xor"),
        F.expr("shiftleft(l_linenumber, 4)").cast("long").alias("shifted"),
        F.bit_count("l_orderkey").cast("long").alias("popcount"),
    )


@register(
    "conditional_distinct_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS BIGINT) AS f_custs,
           CAST(COUNT(DISTINCT CASE WHEN o_orderstatus = 'O' THEN o_custkey END) AS BIGINT) AS o_custs
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def conditional_distinct_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct(F.when(F.col("o_orderstatus") == "F", F.col("o_custkey"))).alias("f_custs"),
        F.countDistinct(F.when(F.col("o_orderstatus") == "O", F.col("o_custkey"))).alias("o_custs"),
    )


@register(
    "asof_join_forward_tolerance",
    oracle="""
    WITH od AS (
      SELECT o_custkey, o_orderdate,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(MAX(o_orderkey) AS BIGINT) AS last_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ), nxt AS (
      SELECT e.event_id, MIN(o.o_orderdate) AS d
      FROM events e LEFT JOIN od o
        ON o.o_custkey = e.user_id
       AND CAST(o.o_orderdate AS TIMESTAMP) >= e.ts
       AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts + INTERVAL '7 days'
      GROUP BY e.event_id
    )
    SELECT n.event_id,
           strftime(n.d, '%Y-%m-%d') AS next_order_date,
           o.n_orders, o.last_orderkey
    FROM nxt n
    LEFT JOIN events e ON e.event_id = n.event_id
    LEFT JOIN od o ON o.o_orderdate = n.d AND o.o_custkey = e.user_id
    """,
    tags=("join", "asof", "tolerance"),
)
def asof_join_forward_tolerance(spark, sf_dir):
    """Forward as-of join with tolerance: each event matched to the
    user's NEXT order day within the following 7 days, NULLs otherwise
    (pandas ``merge_asof(direction='forward', tolerance=...)``
    semantics — "did the signup convert within a week?").

    Same scale shape as ``asof_join`` run in reverse time order: union
    the tagged sides, one shuffle on the user key, running
    first-upcoming-order fill via ``last(ignorenulls)`` over a
    DESCENDING window (order rows tie-break before events so the match
    bound is inclusive), then the tolerance applied as a NULL-out
    projection — no row explosion, no |events| x |orders| intermediate.
    """
    from ..operators.timeseries import asof_forward

    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    od = o.groupBy("o_custkey", "o_orderdate").agg(
        F.count("*").alias("n_orders"),
        F.max("o_orderkey").alias("last_orderkey"),
    )
    # SQL ASOF equality semantics (--nullkeys fuzz): a NULL key never
    # matches (NULL = NULL is false) and a NULL order date never
    # satisfies the time bound — but the union+fill composition would
    # group NULL by-keys into one partition and let NULL-t rows seed
    # the fill, so NULL-key/NULL-date order rows are dropped up front.
    # Left events stay intact: unmatched rows fill NULL, which the
    # inner-shape filter (backward) or tolerance NULL-out (forward)
    # then handles identically to the SQL form.
    right = od.filter(F.col("o_custkey").isNotNull()
                      & F.col("o_orderdate").isNotNull()).select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        "o_orderdate", "n_orders", "last_orderkey",
    )
    left = ev.select("user_id", F.col("ts").alias("t"), "event_id")
    matched = asof_forward(left, right, on="t", by=["user_id"],
                           values=["o_orderdate", "n_orders",
                                   "last_orderkey"])
    in_tol = (F.col("o_orderdate").isNotNull()
              & (F.col("o_orderdate").cast("timestamp")
                 <= F.col("t") + F.expr("INTERVAL 7 DAYS")))
    return matched.select(
        "event_id",
        F.when(in_tol, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("next_order_date"),
        F.when(in_tol, F.col("n_orders")).alias("n_orders"),
        F.when(in_tol, F.col("last_orderkey")).alias("last_orderkey"),
    )
