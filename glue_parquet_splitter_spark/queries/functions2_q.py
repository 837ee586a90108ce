"""Scalar function matrix wave 2: array set algebra (intersect /
except / union), zip_with, and the higher-order map transforms
(transform_keys / transform_values / map_zip_with).

Oracle strategy: DuckDB's list set ops are unordered, so both engines
sort (and dedup) before comparing; the map transforms are verified
first-principles — the maps are built from known scalars, so the SQL
recomputes each transformed entry directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "collection_funcs2",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_custkey,
             [o_orderkey % 7, o_custkey % 7, o_orderkey % 5] AS a1,
             [o_custkey % 7, o_orderkey % 3] AS a2
      FROM orders WHERE o_orderkey % 20 = 0
    )
    SELECT o_orderkey,
           list_sort(list_distinct(list_intersect(a1, a2))) AS inter_sorted,
           list_sort(list_distinct(list_filter(a1, x -> NOT list_contains(a2, x))))
             AS except_sorted,
           list_sort(list_distinct(a1 || a2)) AS union_sorted,
           len(list_intersect(a1, a2)) > 0 AS overlaps,
           (o_orderkey % 7) * (o_orderkey % 3)
             + (o_custkey % 7) * (o_custkey % 3) AS zip_dot,
           o_orderkey % 10 AS tk_val,
           3 * (o_custkey % 10) AS tv_val,
           2 * (o_orderkey % 10) AS mzw_val
    FROM t
    """,
    tags=("functions", "array", "map"),
)
def collection_funcs2(spark, sf_dir):
    """Array set algebra + higher-order map functions over arrays/maps
    derived from order keys (a deterministic 1-in-20 key slice: the
    matrix needs breadth of functions, not rows — array-valued compare
    is the oracle gate's slowest path).  All JVM-side expressions inside
    one whole-stage-codegen projection — no shuffle, no UDF."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    a1 = F.array(ok % 7, ck % 7, ok % 5)
    a2 = F.array(ck % 7, ok % 3)
    m1 = F.create_map(F.lit("k1"), ok % 10, F.lit("k2"), ck % 10)
    return o.select(
        "o_orderkey",
        F.sort_array(F.array_intersect(a1, a2)).alias("inter_sorted"),
        F.sort_array(F.array_except(a1, a2)).alias("except_sorted"),
        F.sort_array(F.array_distinct(F.array_union(a1, a2))).alias("union_sorted"),
        F.arrays_overlap(a1, a2).alias("overlaps"),
        # zip_with product-sum over the 2-element prefixes
        F.aggregate(
            F.zip_with(F.array(ok % 7, ck % 7), F.array(ok % 3, ck % 3),
                       lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("zip_dot"),
        F.element_at(
            F.transform_keys(m1, lambda k, _v: F.upper(k)), F.lit("K1")
        ).alias("tk_val"),
        F.element_at(
            F.transform_values(m1, lambda _k, v: v * 3), F.lit("k2")
        ).alias("tv_val"),
        F.element_at(
            F.map_zip_with(m1, m1, lambda _k, v1, v2: v1 + v2), F.lit("k1")
        ).alias("mzw_val"),
    )
