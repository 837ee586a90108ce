"""Streaming wave 2: gap sessionization and windowed top-k as real
Structured Streaming jobs (availableNow drain ⇒ batch-equal results,
so plain SQL stays the oracle — same contract as the other streaming
queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "streaming_session_window_agg",
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
    tags=("streaming", "session"),
    stream_events_guard=True,
)
def streaming_session_window_agg(spark, sf_dir):
    """Gap-based sessionization on a live stream: ``session_window``
    merges per-user session state across micro-batches, watermark
    bounds the state.  Batch twin: ``session_window_agg`` (same
    oracle).  See :func:`..streaming.windows.run_session_window_stream`.
    """
    load_table(spark, sf_dir, "events")  # ns-ts session conf side effect
    from ..streaming.windows import run_session_window_stream

    return run_session_window_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_windowed_topk",
    oracle="""
    WITH counts AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY n DESC, event_type) AS rk
      FROM counts
    )
    SELECT window_start, event_type, n FROM ranked WHERE rk = 1
    """,
    tags=("streaming", "window", "topk"),
    stream_events_guard=True,
)
def streaming_windowed_topk(spark, sf_dir):
    """Top event type per hour over a stream: watermarked streaming
    counts (the unbounded half), rank-within-window applied after the
    drain where every window is final — Structured Streaming's
    documented two-phase top-k topology.  See
    :func:`..streaming.windows.run_windowed_topk_stream`."""
    load_table(spark, sf_dir, "events")  # ns-ts session conf side effect
    from ..streaming.windows import run_windowed_topk_stream

    return run_windowed_topk_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_left_outer_interval",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS mx FROM events)
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS ts_a_s
    FROM events a
    LEFT JOIN events b
      ON b.user_id = a.user_id AND b.event_id <> a.event_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '60 seconds'
    CROSS JOIN mx
    WHERE strftime(a.ts, '%Y-%m-%d %H:%M:%S')
          < strftime(mx.mx - INTERVAL '11 minutes', '%Y-%m-%d %H:%M:%S')
    """,
    tags=("streaming", "join", "outer"),
    stream_events_guard=True,
)
def streaming_left_outer_interval(spark, sf_dir):
    """Left-outer stream-stream interval join, drained availableNow and
    restricted to the watermark-finalized region where streaming output
    provably equals the batch left range join (the oracle).  See
    ``streaming.windows.run_left_outer_interval_stream`` for the state
    eviction / NULL-emission mechanics.
    """
    from ..streaming.windows import run_left_outer_interval_stream

    load_table(spark, sf_dir, "events")  # session conf side effect
    return run_left_outer_interval_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_dedup_within_watermark",
    oracle="""
    SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique,
           CAST(2 * COUNT(*) AS BIGINT) AS n_arrived
    FROM events
    """,
    tags=("streaming", "dedup", "watermark"),
    stream_events_guard=True,
)
def streaming_dedup_within_watermark(spark, sf_dir):
    """``dropDuplicatesWithinWatermark``: exactly-once dedup whose
    state is TTL'd by the watermark instead of kept forever —
    the 100 TB streaming-dedup answer (plain streaming
    ``dropDuplicates`` holds every key seen, unbounded state; the
    within-watermark form guarantees dedup only for duplicates arriving
    inside the delay and evicts the rest).

    Duplicates are PLANTED by unioning the file stream with itself —
    every event arrives exactly twice, the copies trivially inside the
    watermark — so the assertion is real: 2N arrivals collapse to N
    distinct survivors (vs the fixture's COUNT(DISTINCT), plus the
    arrival count as a second checked column).
    """
    import tempfile
    import uuid

    from ..streaming.windows import events_stream

    load_table(spark, sf_dir, "events")  # session conf side effect
    path = f"{sf_dir}/events.parquet"
    arrivals = events_stream(spark, path).unionAll(events_stream(spark, path))
    deduped = (
        arrivals.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy()
        .agg(F.count("*").alias("n_unique"))
    )
    name = "ddww_" + uuid.uuid4().hex[:10]
    q = (
        deduped.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_ddww_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from . import STREAM_EVENTS_FLOOR
    from ..catalog import load_table as _lt
    # arrival count post-ingest-guard — the guarded stream is what the
    # dedup operator sees (see events_stream / --dates fuzz); loaded
    # through catalog so the ts column decodes like the stream's
    n_arrived = (
        _lt(spark, sf_dir, "events")
        .filter(F.col("ts") >= F.lit(STREAM_EVENTS_FLOOR).cast("timestamp"))
        .groupBy()
        .agg((F.count("*") * 2).cast("long").alias("n_arrived"))
    )
    return (
        spark.table(name)
        .select(F.col("n_unique").cast("long").alias("n_unique"))
        .crossJoin(F.broadcast(n_arrived))
    )


@register(
    "streaming_full_outer_interval",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS mx FROM events),
    j AS (
      SELECT a.event_id AS event_a, b.event_id AS event_b,
             a.ts AS ts_a, b.ts AS ts_b
      FROM events a
      FULL JOIN events b
        ON b.user_id = a.user_id AND b.event_id <> a.event_id
       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '60 seconds'
    )
    SELECT event_a, event_b,
           strftime(ts_a, '%Y-%m-%d %H:%M:%S') AS ts_a_s,
           strftime(ts_b, '%Y-%m-%d %H:%M:%S') AS ts_b_s
    FROM j CROSS JOIN mx
    WHERE strftime(COALESCE(ts_a, ts_b), '%Y-%m-%d %H:%M:%S')
          < strftime(mx.mx - INTERVAL '11 minutes', '%Y-%m-%d %H:%M:%S')
    """,
    tags=("streaming", "join", "outer"),
    stream_events_guard=True,
)
def streaming_full_outer_interval(spark, sf_dir):
    """Full-outer stream-stream interval join (the complete streaming
    join matrix: inner + left-outer + full-outer), drained availableNow
    and restricted to the watermark-finalized region where streaming
    output provably equals the batch full outer range join (the
    oracle).  See ``streaming.windows.run_full_outer_interval_stream``
    for the two-sided state-eviction mechanics.
    """
    from ..streaming.windows import run_full_outer_interval_stream

    load_table(spark, sf_dir, "events")  # session conf side effect
    return run_full_outer_interval_stream(spark, f"{sf_dir}/events.parquet")
