"""Time-series operators over ``events`` (hypertable-style surface):
gap filling (LOCF), fixed-grid resampling, gap detection, share-of-total
windows, cumulative first-seen counts."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.events import unique_events
from . import register

TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "locf_gap_fill",
    oracle="""
    SELECT event_id,
           ROUND(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled_value
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
          FROM events)
    """,
    tags=("timeseries", "window"),
    unique_events_guard=True,
)
def locf_gap_fill(spark, sf_dir):
    """Last-observation-carried-forward: error readings are nulled and
    forward-filled from the user's previous good value."""
    ev = unique_events(load_table(spark, sf_dir, "events"))
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "event_id",
        F.round(F.last(v, ignorenulls=True).over(w), 4).alias("filled_value"),
    )


@register(
    "resample_hourly_locf",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, date_trunc('hour', MAX(ts)) AS t1
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(t0, t1, INTERVAL '1 hour')) AS h
      FROM bounds
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, ROUND(AVG(value), 4) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id AS user_id,
           strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           ROUND(last_value(hourly.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_filled
    FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h
    """,
    tags=("timeseries", "window", "generator"),
)
def resample_hourly_locf(spark, sf_dir):
    """Fixed-grid resampling: per-user dense hourly grid (sequence
    explode between min and max), hourly means joined on, gaps filled
    forward — the hypertable rollup + gap-fill idiom."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(F.avg("value"), 4).alias("v")
    )
    # total-order: at most one row per (user_id, h) — grid is a
    # sequence-exploded hour set left-joined to the hourly aggregate
    w = (Window.partitionBy("user_id").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.date_format("h", TS_FMT).alias("hour_start"),
            F.round(F.last("v", ignorenulls=True).over(w), 4).alias("v_filled"),
        )
    )


@register(
    "missing_hours_detection",
    oracle="""
    WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS t0,
                           date_trunc('hour', MAX(ts)) AS t1 FROM events),
    grid AS (SELECT UNNEST(generate_series(t0, t1, INTERVAL '1 hour')) AS h FROM bounds),
    seen AS (SELECT DISTINCT date_trunc('hour', ts) AS h FROM events)
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS missing_hour
    FROM grid WHERE h NOT IN (SELECT h FROM seen)
    """,
    tags=("timeseries", "generator"),
)
def missing_hours_detection(spark, sf_dir):
    """Dense-grid gap detection: hours inside the observed range with
    zero events (generated series anti-joined against the data)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    seen = ev.select(F.date_trunc("hour", "ts").alias("h")).distinct()
    return grid.join(seen, "h", "left_anti").select(
        F.date_format("h", TS_FMT).alias("missing_hour")
    )


@register(
    "pct_of_total_window",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value), 2) AS type_total,
           ROUND(SUM(SUM(value)) OVER (), 2) AS grand_total,
           ROUND(SUM(value) / SUM(SUM(value)) OVER (), 6) AS share
    FROM events GROUP BY event_type
    """,
    tags=("timeseries", "window", "agg"),
)
def pct_of_total_window(spark, sf_dir):
    """Ratio-to-report: per-type share of the grand total via a window
    over the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy()
    agg = ev.groupBy("event_type").agg(F.sum("value").alias("t"))
    return agg.select(
        "event_type",
        F.round("t", 2).alias("type_total"),
        F.round(F.sum("t").over(w), 2).alias("grand_total"),
        # try_divide: sign-flipped measures can cancel the grand total
        # to exactly zero on a tiny corpus (seed-15 --tiny --negative
        # roll) — ANSI / raises where DuckDB's /0 yields NULL; NULL
        # share on a zero total is the correct degenerate answer
        F.round(F.try_divide(F.col("t"), F.sum("t").over(w)), 6)
        .alias("share"),
    )


@register(
    "cumulative_new_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS d FROM events GROUP BY user_id
    ), per_day AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_seen GROUP BY d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           new_users,
           CAST(SUM(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS total_users
    FROM per_day
    """,
    tags=("timeseries", "window"),
)
def cumulative_new_users(spark, sf_dir):
    """Cumulative distinct users by day — first-seen reduction then a
    running sum (windowed distinct without windowed-distinct cost)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.date_trunc("day", "ts")).alias("d"))
    per_day = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    # bounded: fed by the per-DAY aggregate above — one row per
    # calendar day (decades fit one partition)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("total_users"),
    )
