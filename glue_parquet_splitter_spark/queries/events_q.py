"""Event-time window queries over the ``events`` table (SURVEY.md §2
streaming row; M3).

The reference only batch-emulates a stream (daily files + marker set,
parquet-splitter.py:135-138); the engine provides real event-time
operators: tumbling / sliding / session windows, plus a genuine
Structured Streaming execution (``streaming_tumbling_counts``) that
runs the same tumbling aggregation through ``readStream`` with an
availableNow trigger — and still hash-matches the batch oracle.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "tumbling_window_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2)     AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("events", "window"),
)
def tumbling_window_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("window.start", TS_FMT).alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


@register(
    "sliding_window_counts",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT UNNEST([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
      FROM events
    ) GROUP BY 1
    """,
    tags=("events", "window"),
)
def sliding_window_counts(spark, sf_dir):
    """1-hour windows sliding every 30 min — each event lands in two
    windows; the oracle expands the membership explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("window.start", TS_FMT).alias("window_start"), "n")
    )


@register(
    "session_window_agg",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       < INTERVAL '10 minutes'
                  THEN 0 ELSE 1 END AS new_s
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS session_value
    FROM sess GROUP BY user_id, sid
    """,
    tags=("events", "window", "session"),
)
def session_window_agg(spark, sf_dir):
    """Gap-based sessionization (10-min gap) via ``session_window`` —
    the oracle reproduces it with classic gaps-and-islands SQL."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format(F.date_trunc("second", "session_window.start"), TS_FMT).alias("session_start"),
            "n_events", "session_value",
        )
    )


@register(
    "event_type_funnel",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)     AS views,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)    AS clicks,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases
    FROM events GROUP BY user_id
    HAVING COUNT(*) FILTER (WHERE event_type = 'view') > 0
    """,
    tags=("events", "agg"),
)
def event_type_funnel(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
        )
        .filter(F.col("views") > 0)
    )


@register(
    "streaming_tumbling_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
    tags=("events", "streaming"),
    stream_events_guard=True,
)
def streaming_tumbling_counts(spark, sf_dir):
    """True Structured Streaming: file-source ``readStream`` over the
    events parquet, event-time tumbling window + watermark, availableNow
    trigger, complete-mode memory sink. Because availableNow drains the
    whole source and complete mode emits every window, the result equals
    the batch aggregation — so it still gets a DuckDB oracle."""
    from ..streaming.windows import run_tumbling_count_stream

    return run_tumbling_count_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_interval_join",
    oracle="""
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '60 seconds'
    """,
    tags=("events", "streaming", "join"),
    stream_events_guard=True,
)
def streaming_interval_join(spark, sf_dir):
    """Stream-stream interval inner join with watermarks on both sides
    (bounded join state); drained fully it equals the batch range join,
    which serves as the oracle."""
    from ..streaming.windows import run_stream_stream_join

    return run_stream_stream_join(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_sliding_counts",
    oracle="""
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT date_trunc('hour', ts) AS window_start FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL '1 hour' FROM events
    ) GROUP BY 1
    """,
    tags=("events", "streaming", "window"),
    stream_events_guard=True,
)
def streaming_sliding_counts(spark, sf_dir):
    """Sliding-window (2 h window / 1 h slide) event counts as a real
    stream: each event belongs to exactly two overlapping windows, so
    the drained complete-mode result equals the batch union of the two
    shifted tumbling aggregations — which is the oracle."""
    from ..streaming.windows import run_sliding_count_stream

    return run_sliding_count_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_late_data_append",
    oracle="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL '30 minutes' AS w FROM events)
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events, wm
    GROUP BY 1, event_type, wm.w
    HAVING date_trunc('hour', MIN(ts)) + INTERVAL '1 hour' <= wm.w
    """,
    tags=("events", "streaming"),
    stream_events_guard=True,
)
def streaming_late_data_append(spark, sf_dir):
    """Append-mode windowed stream with a 30-min watermark: only
    watermark-finalized windows emit, demonstrating late-data discard.

    Hash-verifiable since r6 (VERDICT r5 #4, the
    ``streaming_full_outer_interval`` trick): append mode emits exactly
    the windows with ``window.end <= final watermark``, and the drained
    availableNow stream's final watermark is ``max(ts) − 30 min`` — a
    batch-computable bound.  Both the stream output and the oracle are
    restricted to that finalized region, where stream == batch holds
    exactly; the unfinalized tail stays intentionally absent from both
    sides.  The bound rides in as a broadcast 1-row aggregate, not a
    driver collect.
    """
    from ..catalog import load_table
    from ..streaming.windows import run_late_data_stream

    out = run_late_data_stream(spark, f"{sf_dir}/events.parquet")
    wm = load_table(spark, sf_dir, "events").agg(
        (F.max("ts") - F.expr("INTERVAL 30 MINUTES")).alias("wm"))
    return (
        out.crossJoin(F.broadcast(wm))
        .where(F.col("window_end") <= F.col("wm"))
        .select("window_start", "event_type", "n")
    )


@register(
    "streaming_stateful_user_stats",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events WHERE value IS NULL OR isfinite(value)
    GROUP BY user_id
    """,
    tags=("events", "streaming", "stateful"),
    stream_events_guard=True,
)
def streaming_stateful_user_stats(spark, sf_dir):
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running totals; after draining the bounded source the final state
    equals the batch group-by, so the oracle still applies."""
    from ..streaming.stateful import run_user_stats_stream

    return run_user_stats_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "session_window_dynamic_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN event_type = 'purchase' THEN INTERVAL '30 minutes'
                  ELSE INTERVAL '10 minutes' END AS gap
      FROM events
    ), o AS (
      SELECT user_id, event_id, ts, value, ts + gap AS wend,
             MAX(ts + gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS prev_max_end
      FROM e
    ), s AS (
      SELECT user_id, event_id, ts, value, wend,
             SUM(CASE WHEN prev_max_end IS NULL OR ts >= prev_max_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S')   AS session_start,
           strftime(MAX(wend), '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS session_value
    FROM s GROUP BY user_id, sid
    """,
    tags=("events", "window", "session", "spark4"),
)
def session_window_dynamic_gap(spark, sf_dir):
    """Sessionization with a PER-EVENT gap: a purchase keeps its
    session alive 30 minutes, everything else 10 — the
    engagement-weighted session definition product analytics actually
    wants (checkout flows pause longer than browsing).  Uses
    ``session_window`` with a Column gap (dynamic-gap form); the
    oracle rebuilds it from first principles — a session breaks when
    an event's start reaches the RUNNING MAX of previous window ends
    (with variable gaps the previous event's end is NOT enough: an
    older long-gap event can outlive a newer short-gap one).

    Scale: same single (user_id) shuffle as fixed-gap sessionization;
    the merge logic is state Spark keeps per key, and the same
    operator runs on a stream (``streaming_session_window_agg`` is
    the fixed-gap streaming twin).
    """
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("30 minutes")) \
        .otherwise(F.lit("10 minutes"))
    return (
        ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format(
                F.date_trunc("second", "session_window.start"),
                TS_FMT).alias("session_start"),
            F.date_format(
                F.date_trunc("second", "session_window.end"),
                TS_FMT).alias("session_end"),
            "n_events", "session_value",
        )
    )
