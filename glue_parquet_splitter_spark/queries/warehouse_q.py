"""Warehouse-maintenance operators the reference's users reach for
next: CDC MERGE (upsert/delete apply), SCD2 interval builds, batch
sessionization, column profiling, and Markov transition counts.

All are pure DataFrame compositions — one hash-partitioned shuffle on
the natural key each, no driver-side loops — so they hold at 100 TB:
MERGE is a single full-outer hash join on the primary key; SCD2 /
sessionization are per-entity window scans (one shuffle on the entity
key); profiling is a single-pass aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.events import unique_events
from . import register

TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "merge_upsert_apply",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS o_totalprice
      FROM orders WHERE o_orderkey % 4 <> 3
    ), changes AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 9 = 0 THEN 'D' ELSE 'U' END AS op,
             ROUND(o_totalprice + 100.0, 2) AS new_totalprice
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN c.op = 'U' THEN c.new_totalprice
                ELSE b.o_totalprice END AS total_price,
           CASE WHEN c.op = 'U' AND b.o_orderkey IS NOT NULL THEN 'updated'
                WHEN c.op = 'U' THEN 'inserted'
                ELSE 'kept' END AS merge_action
    -- COALESCE keeps NULL-extended base-only rows out of the 'D' test:
    -- a bare  NOT (c.op = 'D')  is NULL for them and would drop every
    -- unchanged base row under three-valued logic
    FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
    WHERE COALESCE(c.op, '') <> 'D'  -- matched delete applied; absent delete no-op
    """,
    tags=("warehouse", "merge", "join"),
)
def merge_upsert_apply(spark, sf_dir):
    """MERGE INTO semantics without a table format: apply a CDC change
    set (upserts + deletes) onto a base snapshot as one full-outer hash
    join on the primary key.  WHEN MATCHED AND op='U' → update; WHEN NOT
    MATCHED AND op='U' → insert; WHEN MATCHED AND op='D' → delete.

    Scale: both sides shuffle once on ``o_orderkey``; with the base
    bucketed by key (``write_partitioned``) the join is co-located and
    only the (small) change set moves.  The change set is derived
    deterministically from ``orders`` so the oracle is SQL-expressible,
    and the %4/%3/%9 slices guarantee every branch fires: matched
    update, unmatched insert (keys ≡3 mod 4 are not in base), matched
    delete, absent delete, and untouched base rows.

    The keep-filter must COALESCE the change op before comparing: on a
    NULL-extended base-only row ``op = 'D'`` is NULL, and a bare
    ``NOT (op = 'D')`` would silently drop every unchanged base row.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 4 != 3).select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    changes = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 9 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.round(F.col("o_totalprice") + 100.0, 2).alias("new_totalprice"),
    )
    j = base.alias("b").join(
        changes.alias("c"), F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer"
    )
    matched = F.col("b.o_orderkey").isNotNull()
    return (
        j.where(F.coalesce(F.col("c.op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("b.o_orderkey"), F.col("c.o_orderkey")).alias("o_orderkey"),
            F.when(F.col("c.op") == "U", F.col("c.new_totalprice"))
            .otherwise(F.col("b.o_totalprice")).alias("total_price"),
            F.when((F.col("c.op") == "U") & matched, F.lit("updated"))
            .when(F.col("c.op") == "U", F.lit("inserted"))
            .otherwise(F.lit("kept")).alias("merge_action"),
        )
    )


@register(
    "scd2_event_type_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type AS state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id),
             '%Y-%m-%d %H:%M:%S'),
             '9999-12-31 00:00:00') AS valid_to
    FROM changes
    """,
    tags=("warehouse", "scd2", "window"),
    unique_events_guard=True,
)
def scd2_event_type_intervals(spark, sf_dir):
    """SCD type-2 history build: collapse each user's event-type stream
    into validity intervals ``[valid_from, valid_to)`` — a change row
    opens an interval, the next change closes it, the current state gets
    the open-ended 9999-12-31 sentinel.

    Scale: two window passes over the same ``user_id`` partitioning —
    one shuffle total (Spark reuses the partitioning for the second
    window), no joins.
    """
    ev = unique_events(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
    )
    # event_id tiebreaker keeps valid_to deterministic when two change
    # rows for one user share a timestamp (same ordering as the change
    # detection window above, and as the oracle).
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", TS_FMT).alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w2), TS_FMT),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
    )


@register(
    "sessionize_events",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL '30 minutes' OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_idx
      FROM gaps
    )
    SELECT user_id, session_idx,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM sess GROUP BY user_id, session_idx
    """,
    tags=("warehouse", "session", "window"),
)
def sessionize_events(spark, sf_dir):
    """Batch sessionization with a 30-minute inactivity timeout: the
    lag-gap → flag → running-sum idiom assigns stable per-user session
    indexes, then one aggregate summarizes each session.  Complements
    ``session_window_agg`` (the built-in session_window) by exposing the
    session *identity*, which downstream joins need.

    Scale: the window and the groupBy share the ``user_id`` hash
    partitioning — one shuffle, then map-side-combinable agg.
    """
    ev = load_table(spark, sf_dir, "events")
    # total-order: ties share (ts, event_id); the window carries only ts
    # (equal across tied rows) — session boundaries and the per-session
    # aggregates are roll-invariant multiset reductions
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0))
    )
    # total-order: ties share (ts, event_id); the window carries only ts
    # (equal across tied rows) — session boundaries and the per-session
    # aggregates are roll-invariant multiset reductions
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.withColumn("session_idx", F.sum("is_new").over(run))
    return sess.groupBy("user_id", "session_idx").agg(
        F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
        F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@register(
    "dq_profile_summary",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           COUNT(*) - COUNT(o_custkey) AS null_count,
           COUNT(DISTINCT o_custkey) AS distinct_count,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR),
           CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           strftime(MIN(o_orderdate), '%Y-%m-%d'), strftime(MAX(o_orderdate), '%Y-%m-%d')
    FROM orders
    """,
    tags=("warehouse", "quality", "profile"),
)
def dq_profile_summary(spark, sf_dir):
    """Data-quality column profile (null count, distinct count, min/max
    as strings) for a fixed column set — the expectations-suite input.

    Scale: ONE pass over the table computing every per-column statistic
    in a single aggregate (not one scan per column as the naive UNION
    oracle spells it); the result unpivots driver-free via ``stack``.
    Distinct counts are exact here to stay oracle-checkable —
    ``agg_approx_distinct_only`` demonstrates the sketch path to use
    when a ±2 % answer is acceptable at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    agg = orders.agg(
        (n - F.count("o_custkey")).alias("nc_custkey"),
        F.countDistinct("o_custkey").alias("dc_custkey"),
        F.min("o_custkey").cast("string").alias("min_custkey"),
        F.max("o_custkey").cast("string").alias("max_custkey"),
        (n - F.count("o_orderstatus")).alias("nc_status"),
        F.countDistinct("o_orderstatus").alias("dc_status"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderstatus").alias("max_status"),
        (n - F.count("o_totalprice")).alias("nc_price"),
        F.countDistinct("o_totalprice").alias("dc_price"),
        F.round(F.min("o_totalprice"), 2).cast("string").alias("min_price"),
        F.round(F.max("o_totalprice"), 2).cast("string").alias("max_price"),
        (n - F.count("o_orderdate")).alias("nc_date"),
        F.countDistinct("o_orderdate").alias("dc_date"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_date"),
    )
    return agg.select(
        F.expr(
            "stack(4, "
            "'o_custkey',     nc_custkey, dc_custkey, min_custkey, max_custkey, "
            "'o_orderstatus', nc_status,  dc_status,  min_status,  max_status, "
            "'o_totalprice',  nc_price,   dc_price,   min_price,   max_price, "
            "'o_orderdate',   nc_date,    dc_date,    min_date,    max_date) "
            "AS (col_name, null_count, distinct_count, min_value, max_value)"
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH steps AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events
    )
    SELECT from_type, to_type, COUNT(*) AS n_transitions
    FROM steps WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    tags=("warehouse", "sequence", "window"),
    unique_events_guard=True,
)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition counts over per-user event streams
    (the from→to matrix behind funnel and next-action models).

    Scale: one ``user_id`` window shuffle, then a tiny (|types|²-row)
    map-side-combined aggregate.
    """
    ev = unique_events(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        steps.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "snapshot_diff_cdf",
    oracle="""
    WITH snap_a AS (
      SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey % 4 <> 3
    ), snap_b AS (
      SELECT o_orderkey,
             ROUND(o_totalprice + CASE WHEN o_orderkey % 6 = 0 THEN 50.0 ELSE 0.0 END,
                   2) AS price
      FROM orders WHERE o_orderkey % 4 <> 1
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                WHEN b.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS action,
           b.price AS new_price
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR a.price <> b.price
    """,
    tags=("warehouse", "cdf", "join"),
)
def snapshot_diff_cdf(spark, sf_dir):
    """Change-data-feed generation: diff two table snapshots into the
    insert/update/delete stream that ``merge_upsert_apply`` consumes —
    the bridge between full-refresh sources and incremental pipelines.
    Unchanged rows (key in both, equal payload) are excluded.

    Scale: one full-outer hash join on the key; with both snapshots
    bucketed by key it is co-located.  Payload comparison happens in
    the join projection — at wide schemas compare a precomputed
    ``hash(*)`` fingerprint column instead of each field (the
    ``dedup_exact_hash`` trick), which this query's price compare
    stands in for.
    """
    orders = load_table(spark, sf_dir, "orders")
    snap_a = orders.where(F.col("o_orderkey") % 4 != 3).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    snap_b = orders.where(F.col("o_orderkey") % 4 != 1).select(
        "o_orderkey",
        F.round(
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 6 == 0, 50.0).otherwise(0.0),
            2,
        ).alias("price"),
    )
    j = snap_a.alias("a").join(
        snap_b.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    a_key, b_key = F.col("a.o_orderkey"), F.col("b.o_orderkey")
    return (
        j.where(a_key.isNull() | b_key.isNull() | (F.col("a.price") != F.col("b.price")))
        .select(
            F.coalesce(a_key, b_key).alias("o_orderkey"),
            F.when(a_key.isNull(), F.lit("insert"))
            .when(b_key.isNull(), F.lit("delete"))
            .otherwise(F.lit("update")).alias("action"),
            F.col("b.price").alias("new_price"),
        )
    )


@register(
    "dq_expectations",
    oracle="""
    WITH checks AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_checked,
        CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT)          AS null_custkey,
        CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
                                                             AS nonpositive_price,
        CAST(COUNT(CASE WHEN o_orderdate < DATE '1992-01-01'
                          OR o_orderdate > DATE '1998-12-31' THEN 1 END)
             AS BIGINT)                                      AS date_out_of_range,
        CAST(COUNT(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END)
             AS BIGINT)                                      AS bad_status
      FROM orders
    ), ref AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS orphan_custkey
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL
    )
    SELECT rule, n_violations, n_checked FROM (
      SELECT 'null_custkey' AS rule, null_custkey AS n_violations, n_checked FROM checks
      UNION ALL
      SELECT 'nonpositive_price', nonpositive_price, n_checked FROM checks
      UNION ALL
      SELECT 'date_out_of_range', date_out_of_range, n_checked FROM checks
      UNION ALL
      SELECT 'bad_status', bad_status, n_checked FROM checks
      UNION ALL
      SELECT 'orphan_custkey', orphan_custkey, n_checked FROM ref, checks
    )
    """,
    tags=("warehouse", "quality", "agg"),
)
def dq_expectations(spark, sf_dir):
    """Expectations suite over the orders feed: one row per rule with
    its violation count — the CI gate a warehouse runs before
    publishing a partition (the assert side of ``dq_profile_summary``'s
    profile).  Rules: non-null key, positive amount, date-in-range,
    enum membership, and referential integrity against the customer
    dim.

    Scale: the four column rules ride ONE scan as conditional counts
    (map-side combine, 1-row output) and unpivot via ``stack`` on that
    single row; the referential rule is a broadcast anti-join against
    the dim, counted without materializing violations.  Total cost: one
    fact scan + one dim broadcast regardless of violation count.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    checks = o.agg(
        F.count("*").alias("n_checked"),
        (F.count("*") - F.count("o_custkey")).alias("null_custkey"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpositive_price"),
        F.count(F.when((F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                       | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date")),
                       1)).alias("date_out_of_range"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1))
        .alias("bad_status"),
    )
    orphans = (
        o.where(F.col("o_custkey").isNotNull())
        .join(c.select("c_custkey"),
              o.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").alias("orphan_custkey"))
    )
    wide = checks.crossJoin(F.broadcast(orphans))
    return wide.select(
        F.expr("stack(5, "
               "'null_custkey', null_custkey, "
               "'nonpositive_price', nonpositive_price, "
               "'date_out_of_range', date_out_of_range, "
               "'bad_status', bad_status, "
               "'orphan_custkey', orphan_custkey) AS (rule, n_violations)"),
        "n_checked",
    )


@register(
    "scd2_temporal_fact_join",
    oracle="""
    WITH dim_ev AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE event_type <> 'purchase'
    ), ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM dim_ev
    ), changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    ), dim AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             COALESCE(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                      TIMESTAMP '9999-12-31') AS valid_to
      FROM changes
    )
    SELECT d.state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(p.value), 2) AS revenue
    FROM events p
    JOIN dim d ON d.user_id = p.user_id
             AND d.valid_from <= p.ts AND p.ts < d.valid_to
    WHERE p.event_type = 'purchase'
    GROUP BY d.state
    """,
    tags=("warehouse", "scd2", "join", "range"),
    unique_events_guard=True,
)
def scd2_temporal_fact_join(spark, sf_dir):
    """POINT-IN-TIME (temporal) fact join — the canonical SCD2 lookup:
    each purchase joins the dimension VERSION that was valid at the
    purchase's own event time (``valid_from <= ts < valid_to``), never
    the current one — revenue attributed to the user's state *as it
    was*.  This is the join every warehouse with versioned dimensions
    runs on every fact load, and the reason SCD2 keeps intervals
    instead of overwriting.

    The dimension is built in-plan from the non-purchase event stream
    (``scd2_event_type_intervals`` algebra); empty intervals produced
    by same-timestamp change pairs match nothing on either engine
    (half-open semantics).  Scale: the interval build is one user_id
    window shuffle; the temporal join is an EQUI join on user_id with
    the interval predicate evaluated inside the matched bucket — never
    a cartesian; per-user version counts are human-bounded, so the
    bucket product stays linear.
    """
    ev = unique_events(load_table(spark, sf_dir, "events"))
    dim_ev = ev.where(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        dim_ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull()
               | (F.col("event_type") != F.col("prev_type")))
    )
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.coalesce(F.lead("ts").over(w),
                   F.lit("9999-12-31").cast("timestamp")).alias("valid_to"),
    )
    p = ev.where(F.col("event_type") == "purchase")
    return (
        p.join(dim, (p.user_id == dim.d_user)
               & (dim.valid_from <= p.ts) & (p.ts < dim.valid_to))
        .groupBy("state")
        .agg(F.count("*").alias("n_purchases"),
             F.round(F.sum("value"), 2).alias("revenue"))
    )


@register(
    "zone_map_pruning_stats",
    oracle="""
    WITH hash_files AS (
      SELECT l_orderkey % 32 AS file_id,
             MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1
    ), date_files AS (
      SELECT EXTRACT(year FROM l_shipdate) * 100
             + EXTRACT(month FROM l_shipdate) AS file_id,
             MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1
    ), u AS (
      SELECT 'hash' AS layout, * FROM hash_files
      UNION ALL
      SELECT 'date_clustered' AS layout, * FROM date_files
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n) AS BIGINT) AS rows_total,
           CAST(COUNT(*) FILTER (WHERE hi >= TIMESTAMP '1995-06-01'
                                   AND lo < TIMESTAMP '1995-07-01')
                AS BIGINT) AS files_scanned,
           CAST(COALESCE(SUM(n) FILTER (WHERE hi >= TIMESTAMP '1995-06-01'
                                          AND lo < TIMESTAMP '1995-07-01'),
                         0) AS BIGINT) AS rows_scanned,
           ROUND(1 - CAST(COUNT(*) FILTER (WHERE hi >= TIMESTAMP '1995-06-01'
                                             AND lo < TIMESTAMP '1995-07-01')
                          AS DOUBLE) / COUNT(*), 6) AS file_prune_frac
    FROM u GROUP BY layout
    """,
    tags=("warehouse", "scale", "agg"),
)
def zone_map_pruning_stats(spark, sf_dir):
    """Zone-map (min/max file-skipping) effectiveness by data layout —
    the Delta/Iceberg/parquet-footer pruning arithmetic, run for two
    candidate layouts of the same table: hash-on-key files (no value
    locality — every file spans the full date range, nothing prunes)
    vs date-clustered files (one month per file — a 1-month predicate
    scans ~1 file).  The number that justifies a one-time clustering
    rewrite at 100 TB: ``file_prune_frac`` IS the fraction of I/O a
    Z-ORDER/cluster-by would eliminate for this predicate family.

    Scale: each layout is one aggregation to file granularity (min/
    max/count — exactly the stats a parquet footer already holds), and
    the pruning evaluation is a fold over FILE-granular rows (a 100 TB
    table is ~10⁵ files — metadata scale).  No joins; the predicate
    range never touches row-level data.

    Determinism: timestamps compare exactly; counts are integers; the
    single fraction is rounded to 6.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lo_p, hi_p = "1995-06-01", "1995-07-01"

    def files(df, key, layout):
        return (df.groupBy(key.alias("file_id"))
                .agg(F.min("l_shipdate").alias("lo"),
                     F.max("l_shipdate").alias("hi"),
                     F.count("*").alias("n"))
                .select(F.lit(layout).alias("layout"), "file_id",
                        "lo", "hi", "n"))

    u = files(li, F.col("l_orderkey") % 32, "hash").unionByName(
        files(li, F.year("l_shipdate") * 100 + F.month("l_shipdate"),
              "date_clustered"))
    scanned = (F.col("hi") >= F.lit(lo_p).cast("timestamp")) & \
              (F.col("lo") < F.lit(hi_p).cast("timestamp"))
    return u.groupBy("layout").agg(
        F.count("*").alias("n_files"),
        F.sum("n").cast("long").alias("rows_total"),
        F.count_if(scanned).alias("files_scanned"),
        F.coalesce(F.sum(F.when(scanned, F.col("n"))), F.lit(0))
         .cast("long").alias("rows_scanned"),
        F.round(1 - F.count_if(scanned).cast("double") / F.count("*"), 6)
         .alias("file_prune_frac"))


from .curation4_q import hex_hash_expr

_TD_H = hex_hash_expr("c_custkey", 4, offset=16)


@register(
    "table_diff_summary",
    oracle=f"""
    WITH a AS (
      SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal,
             {_TD_H} AS h
      FROM customer
    ), b AS (
      -- the simulated next snapshot: h%17=0 deleted, h%11=0 balance
      -- restated (+100), h%19=0 re-segmented, plus synthetic inserts
      SELECT k, CASE WHEN h % 19 = 0 THEN 'RESEGMENTED' ELSE seg END AS seg,
             CASE WHEN h % 11 = 0 THEN bal + 100 ELSE bal END AS bal
      FROM a WHERE h % 17 <> 0
      UNION ALL
      -- inserts use NEGATED keys: c_custkey >= 1 at every SF, so the
      -- synthetic insert namespace can never collide with a real key
      -- (a fixed k+200000 offset collided once 150k*SF passed 200k)
      SELECT -k, seg, bal FROM a WHERE h % 13 = 0
    )
    SELECT CAST(SUM(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(SUM(CASE WHEN b.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(SUM(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                          AND (a.seg <> b.seg OR a.bal <> b.bal)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(SUM(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                          AND a.seg = b.seg AND a.bal = b.bal
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
           CAST(SUM(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                          AND a.seg <> b.seg THEN 1 ELSE 0 END) AS BIGINT)
             AS chg_segment,
           CAST(SUM(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                          AND a.bal <> b.bal THEN 1 ELSE 0 END) AS BIGINT)
             AS chg_acctbal
    FROM (SELECT k, seg, bal FROM a) a
    FULL OUTER JOIN b ON b.k = a.k
    """,
    tags=("warehouse", "agg", "join", "monitoring"),
)
def table_diff_summary(spark, sf_dir):
    """Snapshot diff audit — the datacompy/reconciliation primitive
    every warehouse migration and CDC pipeline validates with: one
    FULL OUTER join of two table snapshots on the primary key,
    classifying every key as added / removed / changed / identical,
    with per-column change counts (which column drifted tells you
    which upstream restated).  The second snapshot is derived
    deterministically (hash-salted deletes, inserts, balance
    restatements, re-segmentations) so every class is non-empty.

    Scale: exactly ONE key-keyed shuffle — the full-outer hash join —
    and a partial-aggregable global count reduction; per-column
    comparators are map-side projections on the joined row.  At
    100 TB both snapshots live bucketed on the key and the join
    co-locates; nothing here is quadratic or broadcast-dependent.

    Determinism: md5-salted class assignment (offset 16 — an
    independent salt), integer keys/counts, exact equality on the
    compared columns (the fixture's decimals compare exactly; a
    float column would take a rounded-compare variant).
    """
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"), F.expr(_TD_H).alias("h"))
    b = (a.filter(F.col("h") % 17 != 0)
         .select("k",
                 F.when(F.col("h") % 19 == 0, F.lit("RESEGMENTED"))
                  .otherwise(F.col("seg")).alias("seg"),
                 F.when(F.col("h") % 11 == 0, F.col("bal") + 100)
                  .otherwise(F.col("bal")).alias("bal"))
         .unionByName(a.filter(F.col("h") % 13 == 0)
                      # negated keys: disjoint from real c_custkey (>= 1)
                      # at ANY scale factor, unlike a fixed additive offset
                      .select((-F.col("k")).alias("k"),
                              "seg", "bal")))
    j = (a.select("k", "seg", "bal")
         .join(b.select(F.col("k").alias("bk"),
                        F.col("seg").alias("bseg"),
                        F.col("bal").alias("bbal")),
               F.col("k") == F.col("bk"), "full_outer"))
    both = F.col("k").isNotNull() & F.col("bk").isNotNull()
    return j.agg(
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("bk").isNull(), 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(both & ((F.col("seg") != F.col("bseg"))
                             | (F.col("bal") != F.col("bbal"))), 1)
              .otherwise(0)).alias("n_changed"),
        F.sum(F.when(both & (F.col("seg") == F.col("bseg"))
                     & (F.col("bal") == F.col("bbal")), 1)
              .otherwise(0)).alias("n_same"),
        F.sum(F.when(both & (F.col("seg") != F.col("bseg")), 1)
              .otherwise(0)).alias("chg_segment"),
        F.sum(F.when(both & (F.col("bal") != F.col("bbal")), 1)
              .otherwise(0)).alias("chg_acctbal"))
