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
      -- o_custkey NOT NULL (--nullkeys fuzz): a NULL key would put NULL
      -- ELEMENTS into the arrays, and NULL-element set algebra is
      -- engine-divergent by design (Spark's array_intersect matches
      -- NULL = NULL, DuckDB's list ops do not) — out of contract for
      -- this function-matrix demo
      FROM orders WHERE o_orderkey % 20 = 0 AND o_custkey IS NOT NULL
    )
    SELECT o_orderkey,
           -- COALESCE: DuckDB's array_to_string([]) is NULL, Spark's is ''
           COALESCE(array_to_string(
             list_sort(list_distinct(list_intersect(a1, a2))), ','), '')
             AS inter_sorted,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(a1, x -> NOT list_contains(a2, x)))), ','), '')
             AS except_sorted,
           COALESCE(array_to_string(
             list_sort(list_distinct(a1 || a2)), ','), '')
             AS union_sorted,
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
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderkey") % 20 == 0)
        & F.col("o_custkey").isNotNull())  # see oracle NULL-element note
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    a1 = F.array(ok % 7, ck % 7, ok % 5)
    a2 = F.array(ck % 7, ok % 3)
    m1 = F.create_map(F.lit("k1"), ok % 10, F.lit("k2"), ck % 10)

    def joined(arr):
        # array columns are banned in registry output (the driver's
        # canonicalizer can't sort them) — serialize to a csv string
        return F.array_join(
            F.transform(F.sort_array(arr), lambda x: x.cast("string")), ",")

    return o.select(
        "o_orderkey",
        joined(F.array_intersect(a1, a2)).alias("inter_sorted"),
        joined(F.array_except(a1, a2)).alias("except_sorted"),
        joined(F.array_distinct(F.array_union(a1, a2))).alias("union_sorted"),
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


@register(
    "variant_props_extract",
    oracle="""
    WITH j AS (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract(props, '$.k') AS INT) END AS k
      FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(k) AS INT) AS k_min,
           CAST(MAX(k) AS INT) AS k_max,
           ROUND(AVG(k), 3) AS k_avg
    FROM j GROUP BY event_type
    """,
    tags=("functions", "variant", "json"),
)
def variant_props_extract(spark, sf_dir):
    """Semi-structured props via the Spark 4 VARIANT type:
    ``parse_json`` once in the scan projection, then typed
    ``variant_get`` paths — the engine keeps the binary variant
    encoding (no re-parsing per field access), which is the
    100 TB answer to JSON columns: parse cost is paid once per row,
    field access is an O(1) encoded lookup, and the aggregation stays
    whole-stage-codegen.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        # try_parse_json: malformed/NULL props -> NULL variant (the
        # strict parse_json THROWS on malformed JSON; get_json_object/
        # from_json are permissive - found by scripts/fuzz_oracle.py)
        F.variant_get(F.try_parse_json("props"), "$.k", "int").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.round(F.avg("k"), 3).alias("k_avg"),
    )


@register(
    "try_arithmetic_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(100 * CAST(l_extendedprice AS DECIMAL(18,4))
                      / NULLIF(CAST(l_quantity - 25 AS DECIMAL(18,4)), 0))
                AS BIGINT) AS price_per_excess_cents,
           TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                    THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                    ELSE l_returnflag END AS INT) AS instr_num,
           CAST(l_quantity AS BIGINT) * 1000000000000 AS big_product
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    tags=("functions", "ansi", "null"),
)
def try_arithmetic_funcs(spark, sf_dir):
    """Error-safe arithmetic under ANSI mode (Spark 4 default):
    ``try_divide`` returns NULL where ANSI ``/`` would raise
    (division by zero when quantity == 25), ``try_cast`` nulls
    non-numeric strings, and widened multiplication avoids overflow —
    the idioms that keep a 100 TB job from dying at row 3 trillion on
    one bad record.  The DuckDB oracle mirrors each with its own
    NULL-semantics forms (NULLIF-guarded divide, TRY_CAST).
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey", "l_linenumber",
        # decimal division + FLOOR of cents, not double ROUND: floor on
        # an exact decimal quotient has no half-way boundary, so both
        # engines agree bit-for-bit (ROUND tie-breaking differs)
        F.floor(F.try_divide(
            (F.col("l_extendedprice").cast("decimal(18,4)") * 100),
            (F.col("l_quantity") - 25).cast("decimal(18,4)")))
        .cast("long").alias("price_per_excess_cents"),
        F.when(F.col("l_linenumber") % 2 == 0,
               F.col("l_quantity").cast("long").cast("string"))
        .otherwise(F.col("l_returnflag"))
        .try_cast("int").alias("instr_num"),
        (F.col("l_quantity").cast("long") * F.lit(1000000000000).cast("long"))
        .alias("big_product"),
    )
