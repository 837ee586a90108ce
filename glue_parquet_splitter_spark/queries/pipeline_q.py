"""Split-pipeline parity queries (reference semantics as relational
programs over the driver fixtures, SURVEY.md §2 O3-O6, O11, O17, O18).

The reference's core data motion — group rows by key, one output per
(key, day), marker manifest per day — expressed as DataFrames on
lineitem (key = l_suppkey, day = l_shipdate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "split_manifest_counts",
    oracle="""
    SELECT l_suppkey AS split_key,
           strftime(l_shipdate, '%Y%m%d') AS file_date,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY 1, 2
    """,
    tags=("pipeline", "parity"),
)
def split_manifest_counts(spark, sf_dir):
    """O11's fan-out manifest: rows per (key, day) output object —
    exactly what each ``<key>/<date>.parquet`` would hold."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_suppkey").alias("split_key"),
            F.date_format("l_shipdate", "yyyyMMdd").alias("file_date"),
        )
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "incremental_missing_days",
    oracle="""
    SELECT DISTINCT strftime(o_orderdate, '%Y%m%d') AS missing_date
    FROM orders
    WHERE o_orderdate IS NOT NULL
      AND strftime(o_orderdate, '%Y%m%d') NOT IN
          (SELECT DISTINCT strftime(l_shipdate, '%Y%m%d') FROM lineitem)
    """,
    tags=("pipeline", "parity"),
)
def incremental_missing_days(spark, sf_dir):
    """O5: the incremental scheduler's anti-join — input days with no
    completion marker (here: order days never shipped against).

    NULL-date contract (--nullkeys fuzz): a NULL date is not a day and
    is never scheduled — pinned explicitly on both sides, because the
    engines' defaults diverge (Spark ``left_anti`` KEEPS a NULL-key row
    as "unmatched", SQL ``NOT IN`` over a NULL probe yields NULL and
    drops it)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    ).select(
        F.date_format("o_orderdate", "yyyyMMdd").alias("missing_date")
    ).distinct()
    done = load_table(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyyMMdd").alias("missing_date")
    ).distinct()
    return o.join(done, "missing_date", "left_anti")


@register(
    "incremental_reopen_changed",
    oracle="""
    WITH inp AS (
      -- NULL-date contract: a NULL date is not a day (see
      -- incremental_missing_days)
      SELECT strftime(o_orderdate, '%Y%m%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS fp
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), done AS (
      SELECT strftime(l_shipdate, '%Y%m%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS fp
      FROM lineitem GROUP BY 1
    )
    SELECT day, reason FROM (
      SELECT i.day AS day, 'missing' AS reason
      FROM inp i LEFT JOIN done d ON i.day = d.day WHERE d.day IS NULL
      UNION ALL
      SELECT i.day AS day, 'changed' AS reason
      FROM inp i JOIN done d ON i.day = d.day WHERE i.fp <> d.fp
    )
    """,
    tags=("pipeline", "parity", "late-data"),
)
def incremental_reopen_changed(spark, sf_dir):
    """The ``reprocess_changed`` scheduler as a relational plan: work
    set = (input days with no marker) ∪ (marked days whose recorded
    fingerprint differs from the listing) — an anti-join plus a
    fingerprint-compare inner join, exactly
    ``pipeline/incremental.py`` ``run_incremental``/``_changed_days``.

    Modeled on the fixtures: "input listing" = orders per order-day
    (fingerprint = row count), "markers" = lineitem per ship-day.
    Scale: two partial aggs then two hash joins on the same short day
    key; both sides of each join are day-cardinality (thousands).
    """
    inp = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()  # NULL date is not a day
    ).groupBy(
        F.date_format("o_orderdate", "yyyyMMdd").alias("day")
    ).agg(F.count("*").alias("fp"))
    done = load_table(spark, sf_dir, "lineitem").groupBy(
        F.date_format("l_shipdate", "yyyyMMdd").alias("day")
    ).agg(F.count("*").alias("fp"))
    missing = (
        inp.join(done, "day", "left_anti")
        .select("day", F.lit("missing").alias("reason"))
    )
    changed = (
        inp.alias("i")
        .join(done.alias("d"), "day")
        .where(F.col("i.fp") != F.col("d.fp"))
        .select("day", F.lit("changed").alias("reason"))
    )
    return missing.unionByName(changed)


@register(
    "marker_manifest_json",
    oracle="""
    SELECT '{"date":"' || file_date || '","output_count":' || n || '}' AS marker_json
    FROM (
      SELECT strftime(l_shipdate, '%Y%m%d') AS file_date,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    )
    """,
    tags=("pipeline", "parity", "json"),
)
def marker_manifest_json(spark, sf_dir):
    """O18: the commit-marker document (kind/date/output_count) built
    with ``to_json(struct(...))`` — one JSON per processed day."""
    li = load_table(spark, sf_dir, "lineitem")
    per_day = li.groupBy(
        F.date_format("l_shipdate", "yyyyMMdd").alias("date")
    ).agg(F.countDistinct("l_suppkey").alias("output_count"))
    return per_day.select(
        F.to_json(F.struct("date", "output_count")).alias("marker_json")
    )


@register(
    "count_distinct_groups",
    oracle="""
    SELECT strftime(l_shipdate, '%Y%m') AS ship_month,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_split_keys,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY 1
    """,
    tags=("pipeline", "parity"),
)
def count_distinct_groups(spark, sf_dir):
    """O17: the success-log cardinality (``nunique`` per processed
    unit, parquet-splitter.py:173)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.date_format("l_shipdate", "yyyyMM").alias("ship_month")).agg(
        F.countDistinct("l_suppkey").alias("n_split_keys"),
        F.count("*").alias("n_rows"),
    )
