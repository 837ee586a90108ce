"""Relational operator queries (SURVEY.md §2 taxonomy, M2).

Each query is idiomatic DataFrame code — Catalyst handles pushdown,
pruning, join strategy (broadcast for the tiny dims), partial aggs.
Oracles are ANSI SQL for DuckDB over the same parquet views.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- TPC-H-style headline queries -----------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "headline"),
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_unshipped_orders",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "headline"),
)
def q3_top_unshipped_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")
                   * (100 - F.round(F.col("l_discount") * 100)
                      .cast("long"))).alias("_rev_u"))
        .withColumn("revenue",
                    # CAST: a bare 100.0 literal is DECIMAL in Spark
                    # SQL (DOUBLE in DuckDB) — the DECIMAL-literal trap.
                    # Floor-division emulated via pmod so the rounding is
                    # sign-symmetric with DuckDB's `//` (floor toward
                    # -inf): Spark `div` truncates toward zero, which
                    # diverges on a negative cents sum; subtracting
                    # pmod makes the dividend an exact multiple of 100,
                    # where truncation == floor for any sign.
                    F.expr("((_rev_u + 50 - pmod(_rev_u + 50, 100))"
                           " div 100) / CAST(100.0 AS DOUBLE)"))
        .drop("_rev_u")
        .select("o_orderkey", "revenue", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    -- integer cents (the q10 pattern): float SUM order flipped the
    -- last cent on the --nullkeys fuzz fixtures.  The half-up step is
    -- an EXPLICIT floor division ((y - pmod(y,100)) // 100): measured,
    -- DuckDB's integer `//` truncates toward zero exactly like Spark's
    -- `div` (-707 // 100 = -7), so both engines get the same
    -- sign-symmetric construction rather than trusting either
    -- operator's negative-dividend behavior.
    SELECT n_name,
           ((y - ((y % 100) + 100) % 100) // 100) / 100.0 AS revenue
    FROM (
      SELECT n.n_name AS n_name,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                 * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT))
             + 50 AS y
      FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      GROUP BY n.n_name
    )
    """,
    tags=("join", "agg", "headline"),
)
def q5_region_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")
                   * (100 - F.round(F.col("l_discount") * 100)
                      .cast("long"))).alias("_rev_u"))
        .withColumn("revenue",
                    # CAST: a bare 100.0 literal is DECIMAL in Spark
                    # SQL (DOUBLE in DuckDB) — the DECIMAL-literal trap.
                    # Floor-division emulated via pmod so the rounding is
                    # sign-symmetric with DuckDB's `//` (floor toward
                    # -inf): Spark `div` truncates toward zero, which
                    # diverges on a negative cents sum; subtracting
                    # pmod makes the dividend an exact multiple of 100,
                    # where truncation == floor for any sign.
                    F.expr("((_rev_u + 50 - pmod(_rev_u + 50, 100))"
                           " div 100) / CAST(100.0 AS DOUBLE)"))
        .drop("_rev_u")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
    """,
    tags=("agg", "filter", "headline"),
)
def q6_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_discount").between(0.02, 0.06)) & (F.col("l_quantity") < 24))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    -- explicit floor division, same construction as q5_region_revenue:
    -- sign-symmetric on both engines by exact-multiple arithmetic
    SELECT c_custkey, c_name,
           ((y - ((y % 100) + 100) % 100) // 100) / 100.0 AS revenue,
           n_name
    FROM (
      SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                 * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT))
             + 50 AS y,
             n.n_name AS n_name
      FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "headline"),
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10.  Revenue is an EXACT integer sum: prices/discounts
    are 2-decimal by data contract, so price·(1−disc) quantizes to
    integer 10⁻⁴ dollars with no float accumulation — a tie-heavy
    fuzz draw (seed 3) flipped ROUND(SUM(double), 2)'s last cent
    between the engines' summation orders; integer cents cannot.
    Half-up to cents at the end, order-free."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")
                   * (100 - F.round(F.col("l_discount") * 100)
                      .cast("long"))).alias("_rev_u"))
        .withColumn("revenue",
                    # CAST: a bare 100.0 literal is DECIMAL in Spark
                    # SQL (DOUBLE in DuckDB) — the DECIMAL-literal trap.
                    # Floor-division emulated via pmod so the rounding is
                    # sign-symmetric with DuckDB's `//` (floor toward
                    # -inf): Spark `div` truncates toward zero, which
                    # diverges on a negative cents sum; subtracting
                    # pmod makes the dividend an exact multiple of 100,
                    # where truncation == floor for any sign.
                    F.expr("((_rev_u + 50 - pmod(_rev_u + 50, 100))"
                           " div 100) / CAST(100.0 AS DOUBLE)"))
        .drop("_rev_u")
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --- scans / projection / filter ------------------------------------------

@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price,
           ROUND(l_quantity, 2) AS qty
    FROM lineitem
    WHERE l_quantity >= 45 AND l_returnflag = 'A'
    """,
    tags=("scan", "filter"),
)
def filter_project(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") >= 45) & (F.col("l_returnflag") == "A"))
        .select(
            "l_orderkey", "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
            F.round("l_quantity", 2).alias("qty"),
        )
    )


# --- joins -----------------------------------------------------------------

@register(
    "join_inner_agg",
    oracle="""
    SELECT c.c_mktsegment AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "agg"),
)
def join_inner_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey AS c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias("total"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    tags=("join",),
)
def join_full_outer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_cust"))
    s = _t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_supp"))
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("join",),
)
def join_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark, sf_dir):
    """Anti-join — the reference's incremental scheduler primitive
    (parquet-splitter.py:138, ``input_dates - done_dates``)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_cross",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
    tags=("join",),
)
def join_cross(spark, sf_dir):
    a = _t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("r1"))
    b = _t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("r2"))
    return a.crossJoin(b).filter(F.col("k1") < F.col("k2")).select("r1", "r2")


@register(
    "join_broadcast_multihop",
    oracle="""
    SELECT r.r_name AS r_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_multihop(spark, sf_dir):
    """Explicit broadcast of the small dims — no shuffle of the fact side."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
    )


@register(
    "join_range_nonequi",
    oracle="""
    SELECT p.p_partkey AS p_partkey, CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM part p JOIN supplier s
      ON s.s_acctbal >= p.p_retailprice / 100.0
     AND s.s_acctbal <  p.p_retailprice / 100.0 + 500.0
    GROUP BY p.p_partkey
    """,
    tags=("join", "range"),
)
def join_range_nonequi(spark, sf_dir):
    """Non-equi (range) join; small side broadcast so the range predicate
    is evaluated as a broadcast-nested-loop, not a cartesian shuffle."""
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    cond = (s.s_acctbal >= p.p_retailprice / 100.0) & (s.s_acctbal < p.p_retailprice / 100.0 + 500.0)
    return (
        # bounded: range (theta) join — broadcast-nested-loop is the only
        # non-cartesian plan shape; ceiling = broadcast threshold
        p.join(F.broadcast(s), cond)
        .groupBy("p_partkey")
        .agg(F.count("*").alias("n_matches"))
    )


# --- aggregation variants ---------------------------------------------------

@register(
    "agg_stats",
    oracle="""
    SELECT o_orderstatus AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT)            AS n,
           ROUND(SUM(o_totalprice), 2)         AS total,
           ROUND(AVG(o_totalprice), 4)         AS avg_price,
           ROUND(MIN(o_totalprice), 2)         AS min_price,
           ROUND(MAX(o_totalprice), 2)         AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_stats(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag AS l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_count_distinct(spark, sf_dir):
    """Exact count-distinct (reference O17, ``nunique`` at
    parquet-splitter.py:173). ``approx_count_distinct`` is the scale
    variant — see query ``agg_approx_distinct`` (rows-only)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp_exact,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark, sf_dir):
    """HLL-sketch count-distinct with a tolerance-band oracle: the HLL
    estimate (rsd = 0.01) must land within ±5 % of the exact count,
    returned as a deterministic boolean next to the exact value (the
    oracle's side is ``TRUE`` by construction).

    NOTE: the exact ``countDistinct`` here exists ONLY to make the
    sketch verifiable — it dominates this query's cost, so this row
    does NOT demonstrate the sketch-only 100 TB path.  That path (no
    exact shuffle of every distinct key) is the separately registered
    ``agg_approx_distinct_only``, which is what the bench times."""
    li = _t(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_suppkey")
    est = F.approx_count_distinct("l_suppkey", rsd=0.01)
    return li.groupBy("l_returnflag").agg(
        exact.alias("n_supp_exact"),
        (F.abs(est - exact) <= 0.05 * exact).alias("approx_within_5pct"),
    )


@register(
    "group_having",
    oracle="""
    SELECT o_custkey AS o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
    tags=("agg",),
)
def group_having(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    -- empty-corpus contract (--empty fuzz): Spark rollup/cube emit NO
    -- rows on empty input, ANSI/DuckDB emit the grand-total set; the
    -- HAVING is a no-op on non-empty input (every grouping-set row
    -- aggregates >= 1 row) and drops only that phantom row
    HAVING COUNT(*) > 0
    """,
    tags=("agg", "rollup"),
)
def rollup_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", "total",
        )
    )


@register(
    "cube_agg",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
           CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0  -- empty-corpus contract, see rollup_agg
    """,
    tags=("agg", "cube"),
)
def cube_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n", "qty",
        )
    )


@register(
    "grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg",),
)
def grouping_sets(spark, sf_dir):
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


@register(
    "pivot_status",
    oracle="""
    SELECT l_returnflag AS l_returnflag,
           ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS O,
           ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def pivot_status(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0)), 2).alias("O"),
        F.round(F.coalesce(F.col("F"), F.lit(0)), 2).alias("F"),
    )


# --- sort / limit / top-k ---------------------------------------------------

@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("sort",),
)
def sort_limit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .limit(20)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark, sf_dir):
    from pyspark.sql import Window as W

    c = _t(spark, sf_dir, "customer")
    # total-order: ties share (c_mktsegment, c_acctbal, c_custkey) —
    # every returned column — indistinguishable rows
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


# --- set operations ---------------------------------------------------------

@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union_distinct(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct) semantics, matching SQL EXCEPT


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_union_all_counts",
    oracle="""
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    tags=("setop",),
)
def set_union_all_counts(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("nationkey").agg(F.count("*").alias("n"))


# --- conditional / null handling -------------------------------------------

@register(
    "case_when_bucketing",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
    """,
    tags=("scalar",),
)
def case_when_bucketing(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return o.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


@register(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'suppressed') AS seg,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 2) END AS pos_bal
    FROM customer
    """,
    tags=("scalar",),
)
def null_handling(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("suppressed")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.round("c_acctbal", 2)).alias("pos_bal"),
    )


# --- subqueries -------------------------------------------------------------

@register(
    "scalar_subquery",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_above_avg
    FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
    tags=("subquery",),
)
def scalar_subquery(spark, sf_dir):
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_above_avg
        FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """)


@register(
    "in_subquery",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    """,
    tags=("subquery",),
)
def in_subquery(spark, sf_dir):
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    """)


@register(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l_returnflag
    """,
    tags=("join", "relational", "hint"),
)
def join_shuffle_hash_hint(spark, sf_dir):
    """Join-strategy HINT surface: ``hint("SHUFFLE_HASH")`` forces a
    shuffled hash join where the planner would default to sort-merge —
    the right call when one side comfortably fits a per-task hash map
    but is too big to broadcast (hash build beats sorting BOTH sides).
    Values are strategy-independent, so the plain join is the oracle;
    the plan shape itself is pinned by
    ``tests/test_plans.py::test_shuffle_hash_hint_honored``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderstatus") == "F").hint("SHUFFLE_HASH"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )


@register(
    "distribute_sort_within_partitions",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "api", "layout"),
)
def distribute_sort_within_partitions(spark, sf_dir):
    """``DISTRIBUTE BY … SORT BY`` (repartition + sortWithinPartitions)
    — the write-layout primitive behind every clustered table: rows
    co-located by key and locally ordered WITHOUT a global sort
    barrier.  The aggregate on top proves values are layout-invariant
    (the oracle is the plain rollup); the point of the query is the
    plan — one hash exchange, per-partition sort, no
    ``Exchange SinglePartition`` anywhere (contrast ORDER BY).
    """
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ord_dist")
    return spark.sql("""
        WITH clustered AS (
          SELECT * FROM ord_dist
          DISTRIBUTE BY o_orderpriority SORT BY o_orderpriority, o_totalprice
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM clustered GROUP BY o_orderpriority
    """)


@register(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey,
           CAST(COUNT(l.l_linenumber) AS BIGINT) AS n_lines
    FROM (SELECT * FROM lineitem WHERE l_quantity > 45) l
    RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 13 = 0
    GROUP BY o.o_orderkey
    """,
    tags=("join", "outer", "relational"),
)
def join_right_outer(spark, sf_dir):
    """RIGHT OUTER join — the remaining outer-join cell: every order
    row survives even when the filtered lineitem side has no match
    (COUNT over the nullable side distinguishes 0-match rows).  At
    scale Spark plans right-outer as the mirrored left-outer with the
    preserved side streamed; the orderkey filter bounds the graded
    result.
    """
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 45))
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "right")
        .where(F.col("o_orderkey") % 13 == 0)
        .groupBy("o_orderkey")
        .agg(F.count("l_linenumber").alias("n_lines"))
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT CAST(l_suppkey AS BIGINT) AS suppkey FROM lineitem
    WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT CAST(l_suppkey AS BIGINT) AS suppkey FROM lineitem
    WHERE l_linestatus = 'F'
    """,
    tags=("setop", "relational"),
)
def set_intersect_all(spark, sf_dir):
    """``INTERSECT ALL`` — bag semantics: a supplier key appearing 3×
    in the returned-items stream and 2× in the finished stream
    survives exactly min(3, 2) = 2 times (DISTINCT-flavored
    ``set_intersect`` collapses it to one).  Multiplicity is the whole
    point: downstream bag-cardinality math (sampling weights, join
    pre-sizing) needs the min-count semantics, and Spark plans it as
    one aggregate over both tagged inputs — no pairwise matching.
    """
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("suppkey"))
    b = li.where(F.col("l_linestatus") == "F").select(
        F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
    SELECT CAST(l_suppkey AS BIGINT) AS suppkey FROM lineitem
    WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT CAST(l_suppkey AS BIGINT) AS suppkey FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus = 'F'
    """,
    tags=("setop", "relational"),
)
def set_except_all(spark, sf_dir):
    """``EXCEPT ALL`` — bag difference: occurrences surviving =
    max(count_left − count_right, 0) per value, the multiset
    complement of ``set_intersect_all``.  The right side is a strict
    subset of the left (R-flag AND F-status), so per-key survivors =
    #(R ∧ ¬F) — guaranteed >0 on any mixed-status corpus; the earlier
    disjoint-predicate form (left R-flag vs right F-status) was
    empirically empty on EVERY fixture family because F rows always
    outnumbered R rows per suppkey, grading nothing (non-emptiness
    lint, VERDICT r13 #3)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("suppkey"))
    b = li.where((F.col("l_returnflag") == "R")
                 & (F.col("l_linestatus") == "F")).select(
        F.col("l_suppkey").alias("suppkey"))
    return a.exceptAll(b)


@register(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    tags=("relational", "topk", "api"),
)
def sort_limit_offset(spark, sf_dir):
    """Keyset-free pagination (SQL ``LIMIT … OFFSET``, Spark 3.4+):
    page 3 of the price leaderboard.  The deterministic tiebreak
    (orderkey) is what makes OFFSET pagination well-defined at all;
    the docstring caveat every engine shares: OFFSET still computes
    the first 60 rows' ordering, so deep pagination at 100 TB wants
    keyset (``WHERE price < last_seen``) instead — this query is the
    API-surface row, ``window_rank_funcs`` is the scale form.
    """
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ord_page")
    return spark.sql("""
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        FROM ord_page
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
    """)


@register(
    "rollup_grouping_id",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
           COALESCE(l_linestatus, 'ALL') AS lstatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0  -- empty-corpus contract, see rollup_agg
    """,
    tags=("agg", "relational", "rollup"),
)
def rollup_grouping_id(spark, sf_dir):
    """``grouping_id()`` over a ROLLUP — the bitmask that tells a
    report renderer WHICH aggregation level each row is (0 = leaf,
    1 = per-flag subtotal, 3 = grand total), needed because COALESCE
    alone cannot distinguish a real 'ALL' value from a rolled-up
    NULL.  DuckDB composes the same mask from per-column
    ``GROUPING()`` bits — the contract is the bit layout (first
    grouping column = highest bit), which both engines share.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().cast("long").alias("gid"),
             F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "gid", "n")
    )
