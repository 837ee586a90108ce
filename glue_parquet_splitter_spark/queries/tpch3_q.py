"""Third TPC-H wave: market share, threshold filtering, multi-level
EXISTS/NOT EXISTS (q8/q11/q16/q20/q21 shapes, adapted — the fixture has
no partsupp, so arithmetic predicates stand in for supplies)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from . import register


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN n_name = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n.n_name AS n_name
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
    ) GROUP BY o_year
    """,
    tags=("headline", "join"),
)
def q8_market_share(spark, sf_dir):
    """One nation's share of yearly revenue volume (conditional ratio
    aggregation over a multi-way join)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select(F.year("o_orderdate").cast("long").alias("o_year"),
                vol.alias("volume"), "n_name")
        .groupBy("o_year")
        .agg(F.round(
            F.sum(F.when(F.col("n_name") == "NATION_3", F.col("volume")).otherwise(0))
            / F.sum("volume"), 6).alias("mkt_share"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH holdings AS (
      SELECT s.s_nationkey, p.p_partkey,
             p.p_retailprice * (1 + s.s_acctbal / 100000) AS val
      FROM part p JOIN supplier s ON (p.p_partkey + s.s_suppkey) % 3 = 0
    )
    SELECT p_partkey, ROUND(SUM(val), 4) AS part_value
    FROM holdings
    GROUP BY p_partkey
    HAVING SUM(val) > (SELECT SUM(val) * 0.002 FROM holdings)
    """,
    tags=("headline", "subquery"),
)
def q11_important_stock(spark, sf_dir):
    """Parts whose holding value exceeds a fraction of the global total
    (group-agg filtered by a scalar aggregate of the same relation)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH holdings AS (
          SELECT s.s_nationkey, p.p_partkey,
                 p.p_retailprice * (1 + s.s_acctbal / 100000) AS val
          FROM part p JOIN supplier s ON (p.p_partkey + s.s_suppkey) % 3 = 0
        )
        SELECT p_partkey, ROUND(SUM(val), 4) AS part_value
        FROM holdings
        GROUP BY p_partkey
        HAVING SUM(val) > (SELECT SUM(val) * 0.002 FROM holdings)
    """)


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand AS p_brand, p.p_type AS p_type,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN supplier s ON (p.p_partkey + s.s_suppkey) % 3 = 0
    WHERE p.p_brand <> 'Brand#13'
      AND s.s_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    """,
    tags=("headline", "subquery"),
)
def q16_supplier_part_counts(spark, sf_dir):
    """Distinct supplier counts per brand/type, excluding a NOT IN
    supplier set."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT p.p_brand AS p_brand, p.p_type AS p_type,
               CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS supplier_cnt
        FROM part p JOIN supplier s ON (p.p_partkey + s.s_suppkey) % 3 = 0
        WHERE p.p_brand <> 'Brand#13'
          AND s.s_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type
    """)


@register(
    "q20_excess_inventory",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > (
        SELECT AVG(q) * 1.05 FROM (
          SELECT SUM(l_quantity) AS q FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01' GROUP BY l_suppkey)))
    """,
    tags=("headline", "subquery"),
)
def q20_excess_inventory(spark, sf_dir):
    """Suppliers shipping above 1.05× the average shipped quantity —
    nested IN over a HAVING over a scalar-of-aggregate subquery."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey
          HAVING SUM(l_quantity) > (
            SELECT AVG(q) * 1.05 FROM (
              SELECT SUM(l_quantity) AS q FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01' GROUP BY l_suppkey)))
    """)


@register(
    "q21_waiting_orders",
    oracle="""
    SELECT s.s_name AS s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
    tags=("headline", "subquery"),
)
def q21_waiting_orders(spark, sf_dir):
    """q21 shape: the only supplier whose last shipment blocks a
    finished order — EXISTS + NOT EXISTS correlated on the same
    relation."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT s.s_name AS s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s.s_name
    """)
