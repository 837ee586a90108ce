"""Second TPC-H wave: correlated subqueries, count-distribution,
CTE-on-aggregate, min-cost matching (q2/q13/q15/q17/q22 shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from . import register


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    tags=("headline", "join", "agg"),
)
def q13_customer_distribution(spark, sf_dir):
    """Distribution of orders-per-customer (two-level aggregation)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("headline", "subquery"),
)
def q15_top_supplier(spark, sf_dir):
    """Top supplier by half-year revenue (CTE + scalar-max filter)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("headline", "subquery"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Correlated average subquery (small-order revenue). Spark-first:
    decorrelated by hand into a per-part aggregate + broadcast join —
    the plan Catalyst's decorrelation would produce, stated explicitly."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT substr(c_name, 1, 9) AS cntrycode, c_acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ) GROUP BY cntrycode
    """,
    tags=("headline", "subquery"),
)
def q22_global_sales_opportunity(spark, sf_dir):
    """Rich prospects with no orders: scalar-avg subquery + anti-join +
    substring bucketing."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM (
          SELECT substr(c_name, 1, 9) AS cntrycode, c_acctbal
          FROM customer c
          WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
            AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ) GROUP BY cntrycode
    """)


@register(
    "q2_min_cost_match",
    oracle="""
    WITH costs AS (
      SELECT p.p_partkey, s.s_suppkey, s.s_acctbal, s.s_name,
             MIN(s.s_acctbal) OVER (PARTITION BY p.p_partkey) AS min_bal
      FROM part p JOIN supplier s ON (p.p_partkey + s.s_suppkey) % 4 = 0
      WHERE p.p_size >= 30
    )
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           CAST(s_suppkey AS BIGINT) AS s_suppkey,
           s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM costs WHERE s_acctbal = min_bal
    """,
    tags=("headline", "window", "join"),
)
def q2_min_cost_match(spark, sf_dir):
    """q2 shape: per-part minimum-cost supplier via a window-min filter
    (the fixture has no partsupp table; an arithmetic predicate stands
    in for the supplies relation)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    s = load_table(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    # bounded: theta join — BroadcastNestedLoop is Spark's only
    # non-cartesian physical plan for a non-equi predicate; supplier is
    # the smallest input here, and the documented scale ceiling is the
    # broadcast threshold (block or bucketize the predicate past it)
    joined = p.join(F.broadcast(s), (p.p_partkey + s.s_suppkey) % 4 == 0)
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )
