"""Scalar/aggregate function library wave 4 — the last unclaimed stock
SQL surface: continuous percentiles, ``any_value``, the ``try_*``
null-on-error arithmetic family, ``str_to_map``, and ``from_csv``.

Cross-engine contract notes (each bit the oracle had to own):
Spark's ``try_add``/``try_subtract``/``try_multiply`` return NULL on
int64 overflow while DuckDB either errors or widens — the oracle
computes in HUGEINT and nulls results outside the int64 range;
``try_divide`` nulls division by zero (DuckDB double division would
produce inf) — the oracle CASEs the zero divisor; ``try_to_number``
maps to DuckDB ``TRY_CAST`` for plain digit strings; ``any_value`` is
only deterministic over a functionally-dependent column — the queries
use it exactly there (its honest production use: carrying a dependent
attribute through a group-by without a join-back).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

_I64_MAX = 9223372036854775807
_I64_MIN = -9223372036854775808


@register(
    "percentile_cont_by_group",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("functions", "aggregation", "percentile"),
)
def percentile_cont_by_group(spark, sf_dir):
    """SQL-standard continuous percentiles — ``percentile_cont(p)
    WITHIN GROUP (ORDER BY x)``: linear interpolation between the two
    order statistics around rank ``(n-1)·p`` (the continuous sibling
    of functions3's ``percentile_disc``; DuckDB's ``quantile_cont``
    computes the same SQL-standard interpolation).

    Scale: Spark executes percentile_cont as a sort-based aggregate
    within each group — group-parallel and spill-safe, no global sort;
    for a sketch at 100 TB use ``approx_percentile`` (registered as
    ``agg_approx_quantiles``) — this is the exact form.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr(
            "percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)"), 4
        ).alias("p25"),
        F.round(F.expr(
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)"), 4
        ).alias("p50"),
        F.round(F.expr(
            "percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)"), 4
        ).alias("p75"),
        F.round(F.expr(
            "percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"), 4
        ).alias("price_p90"),
    )


@register(
    "any_value_functional_dep",
    oracle="""
    SELECT o_custkey,
           any_value(c_name) AS c_name,
           any_value(c_mktsegment) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders JOIN customer ON c_custkey = o_custkey
    WHERE o_custkey % 10 = 0
    GROUP BY o_custkey
    """,
    tags=("functions", "aggregation"),
)
def any_value_functional_dep(spark, sf_dir):
    """``any_value`` in its one deterministic (and honest) role:
    carrying a FUNCTIONALLY-DEPENDENT attribute through a group-by.
    Grouped by customer key, every row in the group shares the same
    c_name/c_mktsegment, so "any" value is THE value — the idiom that
    avoids re-joining the dimension after aggregation.  (Applied to a
    non-dependent column, any_value is nondeterministic on BOTH
    engines and has no business in an oracled query.)

    Scale: one shuffle on the group key; the customer dim broadcasts
    into the pre-aggregation join.  any_value is map-side combinable
    (first-seen wins), so it adds no state beyond one value per group.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.where(F.col("o_custkey") % 10 == 0)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("o_custkey")
        .agg(
            F.any_value("c_name").alias("c_name"),
            F.any_value("c_mktsegment").alias("segment"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "try_arithmetic_family",
    oracle=f"""
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             CASE WHEN CAST(9223372036854775800 AS HUGEINT) + l_orderkey
                       <= {_I64_MAX}
                  THEN 9223372036854775800 + l_orderkey END AS try_add_v,
             CASE WHEN CAST(-9223372036854775800 AS HUGEINT) - l_orderkey
                       >= {_I64_MIN}
                  THEN -9223372036854775800 - l_orderkey END AS try_sub_v,
             CASE WHEN CAST(l_orderkey AS HUGEINT) * {_I64_MAX}
                       BETWEEN {_I64_MIN} AND {_I64_MAX}
                  THEN l_orderkey * {_I64_MAX} END AS try_mul_v,
             CASE WHEN l_orderkey % 3 <> 0
                  THEN l_extendedprice / (l_orderkey % 3) END AS try_div_v,
             TRY_CAST(CASE WHEN l_orderkey % 5 = 0
                           THEN 'x' || CAST(l_orderkey AS VARCHAR)
                           ELSE CAST(l_orderkey AS VARCHAR) END
                      AS BIGINT) AS try_num_v
      FROM lineitem
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(try_add_v) AS BIGINT) AS add_ok,
           CAST(COUNT(try_sub_v) AS BIGINT) AS sub_ok,
           CAST(COUNT(try_mul_v) AS BIGINT) AS mul_ok,
           CAST(COUNT(try_div_v) AS BIGINT) AS div_ok,
           CAST(COUNT(try_num_v) AS BIGINT) AS num_ok,
           CAST(MAX(try_add_v) AS BIGINT) AS max_add,
           CAST(MIN(try_sub_v) AS BIGINT) AS min_sub,
           ROUND(MAX(try_div_v), 2) AS max_div,
           CAST(MAX(try_num_v) AS BIGINT) AS max_num
    FROM t
    """,
    tags=("functions", "null-safety"),
)
def try_arithmetic_family(spark, sf_dir):
    """The ``try_*`` null-on-error arithmetic family — ``try_add`` /
    ``try_subtract`` / ``try_multiply`` (NULL on int64 overflow
    instead of an ANSI error), ``try_divide`` (NULL on zero divisor),
    and ``try_to_number`` (NULL on a malformed numeric string).  Each
    is planted with rows on BOTH sides of its failure boundary:
    ``9223372036854775800 + l_orderkey`` overflows exactly when the
    orderkey exceeds 7, division hits every orderkey divisible by 3,
    and every 5th orderkey's string gets a non-digit prefix.

    The oracle computes the same arithmetic in DuckDB HUGEINT
    (128-bit) and nulls results outside the int64 range — the
    definition of what try_* must return, derived independently of
    Spark's implementation.  Outputs are counts and min/max (order-
    independent), never float sums.

    Scale: pure map-side expressions + one scalar aggregate — nothing
    shuffles but the 1-row combine.  This family is the 100 TB
    ingestion posture: a malformed row yields NULL to filter and
    audit, not a job-killing executor exception three hours in.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = F.when(F.col("l_orderkey") % 5 == 0,
               F.concat(F.lit("x"), F.col("l_orderkey").cast("string"))
               ).otherwise(F.col("l_orderkey").cast("string"))
    t = li.select(
        F.expr("try_add(9223372036854775800L, l_orderkey)").alias("try_add_v"),
        F.expr("try_subtract(-9223372036854775800L, l_orderkey)").alias("try_sub_v"),
        F.expr(f"try_multiply(l_orderkey, {_I64_MAX}L)").alias("try_mul_v"),
        F.expr("try_divide(l_extendedprice, l_orderkey % 3)").alias("try_div_v"),
        F.try_to_number(s, F.lit("999999999")).cast("long").alias("try_num_v"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("try_add_v").alias("add_ok"),
        F.count("try_sub_v").alias("sub_ok"),
        F.count("try_mul_v").alias("mul_ok"),
        F.count("try_div_v").alias("div_ok"),
        F.count("try_num_v").alias("num_ok"),
        F.max("try_add_v").alias("max_add"),
        F.min("try_sub_v").alias("min_sub"),
        F.round(F.max("try_div_v"), 2).alias("max_div"),
        F.max("try_num_v").alias("max_num"),
    )


@register(
    "str_to_map_extract",
    oracle="""
    WITH s AS (
      SELECT 'et:' || event_type || ',ub:' ||
             CAST(user_id % 10 AS VARCHAR) || ',vb:' ||
             CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR) AS kv
      FROM events WHERE isfinite(value)
    )
    SELECT regexp_extract(kv, 'et:([^,]*)', 1) AS et,
           CAST(regexp_extract(kv, 'ub:([^,]*)', 1) AS BIGINT) AS ub,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(regexp_extract(kv, 'vb:([^,]*)', 1) AS BIGINT))
                AS BIGINT) AS min_vb,
           CAST(MAX(CAST(regexp_extract(kv, 'vb:([^,]*)', 1) AS BIGINT))
                AS BIGINT) AS max_vb
    FROM s GROUP BY 1, 2
    """,
    tags=("functions", "string"),
)
def str_to_map_extract(spark, sf_dir):
    """``str_to_map`` — parse a ``k:v,k:v`` tag string into a map and
    extract typed fields.  The kv string is BUILT from the event
    columns and then round-tripped through ``str_to_map``, so the
    grade proves the parse (delimiters, key lookup, value typing) is
    lossless; the oracle parses the same string with regexp capture
    groups — two independent parsers must agree on every group.

    Scale: a single scan projection (whole-stage-codegen string ops)
    plus one group-by shuffle on the extracted keys.  The map never
    materializes as a returned column (driver canonicalization can't
    hash maps) — values are extracted and typed in the same select.
    """
    ev = load_table(spark, sf_dir, "events")
    # finite-measure contract (FUZZ.md --nan sweep): the fingerprint
    # floor() cannot bin non-finite values; NULLs drop with them here
    # (both engines' filter is isfinite-only)
    ev = ev.filter(~F.isnan("value")
                   & (F.abs("value") != F.lit(float("inf"))))
    kv = F.concat(
        F.lit("et:"), F.col("event_type"),
        F.lit(",ub:"), (F.col("user_id") % 10).cast("string"),
        F.lit(",vb:"), F.floor("value").cast("long").cast("string"),
    )
    m = F.expr("str_to_map(kv, ',', ':')")
    return (
        ev.select(kv.alias("kv"))
        .select(
            m.getItem("et").alias("et"),
            m.getItem("ub").cast("long").alias("ub"),
            m.getItem("vb").cast("long").alias("vb"),
        )
        .groupBy("et", "ub")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("vb").alias("min_vb"),
             F.max("vb").alias("max_vb"))
    )


@register(
    "from_csv_roundtrip",
    oracle="""
    WITH lines AS (
      SELECT event_id, event_type, ROUND(value, 2) AS v2,
             CASE WHEN event_id % 7 = 0 THEN 'garbage'
                  ELSE CAST(event_id AS VARCHAR) || ',' || event_type
                       || ',' || CAST(ROUND(value, 2) AS VARCHAR)
             END AS line
      FROM events
    ), parsed AS (
      SELECT event_id, event_type, v2,
             TRY_CAST(string_split(line, ',')[1] AS BIGINT) AS p_id,
             CASE WHEN len(string_split(line, ',')) >= 2
                  THEN string_split(line, ',')[2] END AS p_et,
             CASE WHEN len(string_split(line, ',')) >= 3
                  THEN TRY_CAST(string_split(line, ',')[3] AS DOUBLE)
             END AS p_v
      FROM lines
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (p_id = event_id AND p_et = event_type
                                 AND p_v = v2) AS BIGINT) AS n_roundtrip,
           CAST(COUNT(*) FILTER (p_id IS NULL) AS BIGINT) AS n_malformed
    FROM parsed
    """,
    tags=("functions", "formats"),
)
def from_csv_roundtrip(spark, sf_dir):
    """``from_csv`` — parse a CSV line into a typed struct with a DDL
    schema.  Lines are BUILT from the event columns, every 7th one
    replaced by a malformed single-token line; the parse must
    round-trip the well-formed rows exactly (bigint id, string type,
    2-decimal double — Java double→string→double is lossless by
    shortest-roundtrip representation) and yield NULL fields, not an
    error, for the malformed ones (PERMISSIVE mode — the only sane
    posture for 100 TB of scraped CSV).  The oracle parses the same
    lines with string_split + TRY_CAST — an independent CSV reader.

    Scale: scan-projection parsing inside whole-stage codegen; the
    single-row aggregate is the only exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    line = F.when(
        F.col("event_id") % 7 == 0, F.lit("garbage")
    ).otherwise(F.concat(
        F.col("event_id").cast("string"), F.lit(","),
        F.col("event_type"), F.lit(","),
        F.round("value", 2).cast("string"),
    ))
    p = F.from_csv(line, F.lit("id BIGINT, et STRING, v DOUBLE"))
    t = ev.select(
        "event_id", "event_type", F.round("value", 2).alias("v2"),
        p.getField("id").alias("p_id"),
        p.getField("et").alias("p_et"),
        p.getField("v").alias("p_v"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when((F.col("p_id") == F.col("event_id"))
                       & (F.col("p_et") == F.col("event_type"))
                       & (F.col("p_v") == F.col("v2")), 1)
                ).alias("n_roundtrip"),
        F.count(F.when(F.col("p_id").isNull(), 1)).alias("n_malformed"),
    )
