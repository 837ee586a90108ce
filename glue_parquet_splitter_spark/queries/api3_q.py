"""Spark 4 SQL surface wave 2: recursive CTEs, SQL scripting
(BEGIN/WHILE), parameterized ``spark.sql``, and NOT IN three-valued
null semantics.

These are engine features a reference user migrating real SQL will
hit: recursion for iteration SQL can't unroll statically, scripting
for multi-statement driver logic, parameter binding instead of string
interpolation, and the NOT-IN-with-NULLs trap that silently empties a
result."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "recursive_cte_day_streaks",
    oracle="""
    WITH RECURSIVE days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ), streak AS (
      SELECT day AS start_day, day AS cur_day, 1 AS len
      FROM days d
      WHERE NOT EXISTS (SELECT 1 FROM days p
                        WHERE p.day = d.day - INTERVAL 1 DAY)
      UNION ALL
      SELECT s.start_day, d.day, s.len + 1
      FROM streak s JOIN days d ON d.day = s.cur_day + INTERVAL 1 DAY
    )
    SELECT strftime(start_day, '%Y-%m-%d') AS start_day,
           CAST(MAX(len) AS BIGINT) AS streak_len
    FROM streak GROUP BY start_day
    """,
    tags=("functions", "recursive", "date"),
)
def recursive_cte_day_streaks(spark, sf_dir):
    """Consecutive-active-day streaks via a RECURSIVE CTE (Spark 4.0
    ``WITH RECURSIVE``): seed every day with no predecessor, extend
    while the next calendar day exists, report each streak's length.
    DuckDB runs the identical recursive SQL, so the oracle is the same
    text modulo interval syntax.

    The recursion is over DISTINCT DAYS — calendar-bounded, never
    event-volume-bounded — which is the discipline that makes
    recursive SQL safe at 100 TB: recurse on a reduced relation, not
    on raw facts (the window-function gaps-and-islands form in
    ``sessionize_events`` is the non-recursive equivalent when the
    engine lacks recursion).
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_rec")
    return spark.sql("""
        WITH RECURSIVE streak AS (
          SELECT day AS start_day, day AS cur_day, 1 AS len
          FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM ev_rec) d
          WHERE NOT EXISTS (
            SELECT 1 FROM (SELECT DISTINCT CAST(ts AS DATE) AS day
                           FROM ev_rec) p
            WHERE p.day = d.day - INTERVAL 1 DAY)
          UNION ALL
          SELECT s.start_day, d.day, s.len + 1
          FROM streak s
          JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day FROM ev_rec) d
            ON d.day = s.cur_day + INTERVAL 1 DAY
        )
        SELECT date_format(start_day, 'yyyy-MM-dd') AS start_day,
               CAST(MAX(len) AS BIGINT) AS streak_len
        FROM streak GROUP BY start_day
    """)


@register(
    "sql_scripting_threshold_search",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS total,
                      CAST(CEIL(0.9 * COUNT(*)) AS BIGINT) AS m
               FROM orders),
    r AS (
      SELECT o_totalprice AS v,
             ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn
      FROM orders
    ), kth AS (SELECT v FROM r, n WHERE rn = n.m)
    SELECT CAST(FLOOR(kth.v) + 1 AS BIGINT) AS threshold,
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_totalprice < FLOOR(kth.v) + 1) AS BIGINT) AS n_below
    FROM kth
    """,
    tags=("functions", "scripting", "subquery"),
)
def sql_scripting_threshold_search(spark, sf_dir):
    """SQL SCRIPTING (Spark 4.0 ``BEGIN … WHILE … END``): BINARY
    SEARCH for the smallest integer price threshold covering ≥ 90 % of
    orders, written as a procedural loop in pure SQL — the
    multi-statement form a migrating warehouse user expects (T-SQL /
    BTEQ style).  Exponential bound-doubling then bisection: ~2·log₂
    iterations, each ONE count aggregate; loop state lives in session
    variables, never in data.  The oracle derives the identical
    threshold order-statistically (m-th smallest price, floored + 1)
    — binary search and order statistic must agree exactly.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_scr")
    return spark.sql("""
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE m BIGINT DEFAULT 0;
          DECLARE lo BIGINT DEFAULT 0;
          DECLARE hi BIGINT DEFAULT 1;
          DECLARE mid BIGINT DEFAULT 0;
          SET total = (SELECT COUNT(*) FROM ord_scr);
          SET m = CAST(CEIL(0.9 * total) AS BIGINT);
          WHILE (SELECT COUNT(*) FROM ord_scr WHERE o_totalprice < hi) < m DO
            SET hi = hi * 2;
          END WHILE;
          WHILE lo < hi DO
            SET mid = (lo + hi) DIV 2;
            IF (SELECT COUNT(*) FROM ord_scr WHERE o_totalprice < mid) >= m
            THEN SET hi = mid;
            ELSE SET lo = mid + 1;
            END IF;
          END WHILE;
          -- empty-corpus contract (--empty fuzz): with zero orders there
          -- is no m-th order statistic, so no threshold row — matches
          -- the oracle's empty kth CTE instead of emitting the seed lo=0
          SELECT lo AS threshold,
                 (SELECT COUNT(*) FROM ord_scr
                  WHERE o_totalprice < lo) AS n_below
          WHERE total > 0;
        END
    """)


@register(
    "parameterized_sql_filter",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-06-01'
      AND o_totalprice >= 1000.0
    GROUP BY o_orderpriority
    """,
    tags=("functions", "api"),
)
def parameterized_sql_filter(spark, sf_dir):
    """Named-parameter ``spark.sql(query, args={...})`` (Spark 3.4+/4):
    the injection-safe binding a reference user should use instead of
    f-string SQL.  Parameters bind as literals BEFORE analysis, so
    predicate pushdown sees constants — same scan pruning as
    hand-written SQL (the graded plan pushes both filters to the
    parquet scan).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_par")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM ord_par
        WHERE o_orderdate >= :cutoff AND o_totalprice >= :min_price
        GROUP BY o_orderpriority
        """,
        # cutoff inside BOTH fixture families' date ranges (driver
        # fixtures: 1995-2001; fuzz fixtures: 2024) so the graded
        # result is non-empty — a zero-row grade proves nothing about
        # the parameter binding (non-emptiness lint, VERDICT r13 #3)
        args={"cutoff": "1995-06-01", "min_price": 1000.0},
    )


@register(
    "not_in_null_semantics",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN
              (SELECT user_id FROM events WHERE event_type = 'error'))
           AS BIGINT) AS n_not_in_clean,
      CAST((SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN
              (SELECT CASE WHEN value < 1 THEN NULL ELSE user_id END
               FROM events WHERE event_type = 'error'))
           AS BIGINT) AS n_not_in_nullable
    """,
    tags=("relational", "subquery", "null"),
)
def not_in_null_semantics(spark, sf_dir):
    """NOT IN under three-valued logic — the classic silent-empty-result
    trap, graded on both sides of it: against a null-free subquery
    NOT IN behaves like an anti join (count > 0); once the subquery
    can produce a single NULL, ``x NOT IN (…, NULL)`` is never TRUE
    and the count collapses to 0.  Both engines must agree on both
    counts in one row.

    Spark plans the nullable side as a null-aware anti join
    (broadcast) — the reason NOT IN on a possibly-null column is also
    a PERFORMANCE trap at scale, and ``join_anti`` /
    ``NOT EXISTS`` is the recommended rewrite.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_nin")
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_nin")
    return spark.sql("""
        SELECT
          CAST((SELECT COUNT(*) FROM ord_nin
                WHERE o_custkey NOT IN
                  (SELECT user_id FROM ev_nin WHERE event_type = 'error'))
               AS BIGINT) AS n_not_in_clean,
          CAST((SELECT COUNT(*) FROM ord_nin
                WHERE o_custkey NOT IN
                  (SELECT CASE WHEN value < 1 THEN NULL ELSE user_id END
                   FROM ev_nin WHERE event_type = 'error'))
               AS BIGINT) AS n_not_in_nullable
    """)


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("api", "sql", "spark4"),
)
def sql_pipe_syntax(spark, sf_dir):
    """SQL pipe operators (Spark 4): the q1 aggregation written as a
    linear ``FROM … |> WHERE … |> EXTEND … |> AGGREGATE`` chain — the
    new-engine SQL dialect a migrating user may bring.  Same logical
    plan as the nested form: Catalyst parses pipes into the identical
    filter→project→aggregate tree, so pushdown/partial-agg behavior
    is unchanged; the oracle is the classic GROUP BY spelling.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe")
    return spark.sql("""
        FROM lineitem_pipe
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     ROUND(SUM(disc_price), 2) AS revenue
           GROUP BY l_returnflag, l_linestatus
    """).select("l_returnflag", "l_linestatus", "n", "revenue")


@register(
    "sql_sugar_group_order_all",
    oracle="""
    SELECT src, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM (
      SELECT 'lo' AS src, event_type, value FROM events WHERE value < 50
      UNION ALL BY NAME
      SELECT value, event_type, 'hi' AS src FROM events WHERE value >= 50
    )
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("api", "sql", "spark4"),
)
def sql_sugar_group_order_all(spark, sf_dir):
    """Spark 4 SQL sugar — ``GROUP BY ALL`` (group on every
    non-aggregate select item) and ``ORDER BY ALL``, over a
    NAME-resolved union whose second branch lists its columns in a
    different order (Spark spells that ``unionByName`` at the
    DataFrame level; DuckDB spells the same thing ``UNION ALL BY
    NAME`` in SQL, which is what the oracle uses).  Catalyst desugars
    to the ordinary union/aggregate/sort tree: both branch filters
    reach their scans and the aggregate still partial-aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    lo = ev.where(F.col("value") < 50).select(
        F.lit("lo").alias("src"), "event_type", "value")
    hi = ev.where(F.col("value") >= 50).select(
        "value", "event_type", F.lit("hi").alias("src"))
    lo.unionByName(hi).createOrReplaceTempView("events_sugar")
    return spark.sql("""
        SELECT src, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(value), 2) AS total
        FROM events_sugar
        GROUP BY ALL
        ORDER BY ALL
    """)


@register(
    "sql_udf_scalar_and_table",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag
    """,
    tags=("api", "sql", "udf", "spark4"),
)
def sql_udf_scalar_and_table(spark, sf_dir):
    """SQL-defined functions (Spark 4): a SCALAR SQL UDF
    (``CREATE TEMPORARY FUNCTION … RETURNS DOUBLE RETURN …``) and a
    SQL TABLE function (``RETURNS TABLE … RETURN SELECT``) — logic
    shared as catalog objects in pure SQL, no Python registration.
    The table function parameterizes the shipdate cutoff; the scalar
    UDF computes the discounted price inside it.  Both are inlined by
    Catalyst at plan time (they are macros, not black boxes), so the
    cutoff filter still pushes to the parquet scan and the aggregate
    still partial-aggregates — zero cost vs writing the expression by
    hand, unlike a Python UDF.  The oracle states the inlined form.

    Scale: catalog-level reuse with no serialization boundary — the
    100 TB-safe way to share business logic across queries (a Python
    UDF here would drop the whole scan out of codegen).
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_sqludf")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION flag_revenue(cutoff DATE)
        RETURNS TABLE(l_returnflag STRING, n BIGINT, revenue DOUBLE)
        RETURN SELECT l_returnflag,
                      CAST(COUNT(*) AS BIGINT),
                      ROUND(SUM(disc_price(l_extendedprice, l_discount)), 2)
               FROM lineitem_sqludf
               WHERE l_shipdate <= cutoff
               GROUP BY l_returnflag
    """)
    return spark.sql("SELECT * FROM flag_revenue(DATE '1998-09-02')")
