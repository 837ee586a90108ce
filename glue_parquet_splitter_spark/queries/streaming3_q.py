"""Streaming wave 3: the left-semi cell of the stream-stream join
matrix and chained (multi-stateful-operator) windowed aggregation.

Same verification contract as the other streaming families: the job
runs as real Structured Streaming (watermarks, state eviction,
availableNow drain); a plain-SQL oracle grades the drained result —
restricted to the watermark-finalized region where stream == batch
when append-mode emission requires it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "streaming_semi_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           strftime(date_trunc('second', p.ts), '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events p
    WHERE p.event_type = 'purchase'
      AND EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL 60 SECONDS)
    """,
    tags=("streaming", "join", "semi"),
    stream_events_guard=True,
)
def streaming_semi_interval_join(spark, sf_dir):
    """Purchases followed by a same-user click within 60 s, as a
    stream-stream LEFT SEMI interval join — each purchase emits at
    most once and leaves state on its first match.  See
    :func:`..streaming.windows.run_semi_interval_stream` for the
    eviction analysis; the batch EXISTS subquery is the oracle.
    """
    load_table(spark, sf_dir, "events")  # ns-ts session conf side effect
    from ..streaming.windows import run_semi_interval_stream

    return run_semi_interval_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_chained_window_agg",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY date_trunc('hour', ts)
    )
    SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS day,
           CAST(MAX(n) AS BIGINT) AS max_hourly,
           CAST(SUM(n) AS BIGINT) AS n_events
    FROM hourly, mx
    GROUP BY date_trunc('day', h), m
    HAVING date_trunc('day', h) + INTERVAL '1 day' <= m - INTERVAL '2 hours'
    """,
    tags=("streaming", "window", "agg"),
    stream_events_guard=True,
)
def streaming_chained_window_agg(spark, sf_dir):
    """Per-day peak hourly rate and total, computed as CHAINED
    streaming window aggregations (hour window re-windowed to day in
    the same query — Spark 3.4+ multiple stateful operators).  Output
    restricted to watermark-finalized days; the equivalent two-level
    batch rollup is the oracle.  See
    :func:`..streaming.windows.run_chained_windows_stream`.
    """
    load_table(spark, sf_dir, "events")  # ns-ts session conf side effect
    from ..streaming.windows import run_chained_windows_stream

    return run_chained_windows_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_session_dynamic_gap",
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
    tags=("streaming", "session", "spark4"),
    stream_events_guard=True,
)
def streaming_session_dynamic_gap(spark, sf_dir):
    """The dynamic-gap session window ON A STREAM: the state store
    tracks each user's open-session end as the running max of
    event-time + that event's own gap (purchase 30 min, else 10).
    Drained with availableNow in complete mode, the result equals the
    batch form — ``session_window_dynamic_gap``'s first-principles SQL
    is the oracle.
    """
    load_table(spark, sf_dir, "events")  # ns-ts session conf side effect
    from ..streaming.windows import run_session_dynamic_gap_stream

    return run_session_dynamic_gap_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_static_enrich_join",
    oracle="""
    -- concat_ws, not ||: a NULL segment column must DROP from the
    -- label (both engines' concat_ws skips NULLs) rather than NULL the
    -- whole label as || would (--nullkeys fuzz)
    SELECT concat_ws('/', n.n_name, c.c_mktsegment) AS segment,
           e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2)   AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
    """,
    tags=("streaming", "join", "enrich"),
    stream_events_guard=True,
)
def streaming_static_enrich_join(spark, sf_dir):
    """Stream-static dimension enrichment — the missing stateless
    member of the stream-join family (the interval-join entries are
    all stream-STREAM and stateful): a streaming event fact joined to
    the static customer⋈nation dim chain, rolled up per
    (nation/segment, event_type).  Spark broadcasts the static side
    into every micro-batch; no state store, no watermark needed for
    the join, and complete-mode drain equals the batch join exactly —
    so the ORDINARY batch SQL is a hard oracle, no finalized-region
    trick required.

    Scale: the streaming side never shuffles for the join (broadcast
    dim, the same plan a batch enrich would pick); only the final
    segment×type rollup keeps (tiny) state.  A dim too big to
    broadcast would instead be pre-bucketed and the join left to
    shuffle each micro-batch — the knob is the same as batch.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    dims = (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.concat_ws("/", "n_name", "c_mktsegment").alias("segment"),
        )
    )
    load_table(spark, sf_dir, "events")  # ns-ts session conf side effect
    from ..streaming.windows import run_stream_static_enrich

    return run_stream_static_enrich(spark, f"{sf_dir}/events.parquet", dims)


@register(
    "streaming_quota_sampler",
    # identity scope is (user_id, event_id), NOT the table-wide
    # event_id contract: the stream keys state by user_id, so a
    # duplicate event_id SPANNING users (a --dupkeys copy whose
    # user_id the --nullkeys injector nulled — seed-15 roll) lands in
    # two independent state groups and each user's quota counts its
    # own copy.  The table-wide unique_events guard instead assigned
    # the event to ONE user and diverged in the other's kept set.
    # Per-user quota semantics make per-user identity the honest
    # contract, and it matches the O(K) state rule exactly (min by
    # (ts, value) within (user, event_id) — user_id is constant in
    # the partition, so the order key is unique_events' minus it).
    oracle="""
    WITH evu AS (
      SELECT * EXCLUDE (_rn) FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_id
            ORDER BY ts ASC NULLS LAST, value ASC NULLS LAST,
                     event_type ASC NULLS LAST, props ASC NULLS LAST)
          AS _rn
        FROM events) WHERE _rn = 1
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           ROUND(value, 2) AS value
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn
          FROM evu)
    WHERE rn <= 3
    """,
    tags=("streaming", "stateful", "sampling", "governance"),
    stream_events_guard=True,
)
def streaming_quota_sampler(spark, sf_dir):
    """Per-user quota sampling AT INGEST — a custom stateful operator
    (``applyInPandasWithState``) that keeps each user's 3 earliest
    events and drops the rest as the stream flows: per-key
    contribution capping (the pre-aggregation clip of DP pipelines,
    and the anti-spam quota of event collectors) applied with O(K)
    state per key instead of a post-hoc batch rank over the full
    history.

    Scale: state per key is the bounded K-item min-heap (merging
    min-k with each micro-batch), so state size is K · |active keys|
    regardless of stream length; the memory-sink snapshot is graded
    on the LAST emission per key.  The min-k merge makes the kept set
    a function of the event SET, not arrival ORDER — micro-batch
    boundaries and source file ordering cannot change the answer,
    which is exactly what lets a batch row_number oracle grade it.

    Determinism: integer (ts_us, event_id) ordering with id
    tiebreaks; values pass through untouched (rounded only for the
    compare).
    """
    from ..streaming.stateful import run_quota_sampler_stream

    out = run_quota_sampler_stream(spark, f"{sf_dir}/events.parquet")
    return out.select("user_id", "event_id",
                      F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
                      F.round("value", 2).alias("value"))
