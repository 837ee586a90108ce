"""Structured Streaming window aggregations (M3).

The reference's "stream" is daily files + a marker set; these are the
real event-time equivalents: watermarks bound state, windows assign
event time, availableNow drains a backlog exactly once — the same
catch-up semantics as the reference's anti-join scheduler
(parquet-splitter.py:135-138) but with per-event granularity.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """File-source stream over the events parquet (ns ts → µs).

    The file source wants a directory; when handed a single file we
    stream its parent dir with a glob filter on the basename.
    """
    batch_schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(batch_schema)
    if events_path.endswith(".parquet"):
        parent, base = events_path.rsplit("/", 1)
        stream = reader.option("pathGlobFilter", base).parquet(parent)
    else:
        stream = reader.parquet(events_path)
    ts_type = dict((f.name, f.dataType.simpleString()) for f in batch_schema).get("ts")
    if ts_type == "bigint":
        # integer div — see catalog.load_table (float division loses µs)
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # naive parquet ts → instant; NTZ cannot be a watermark column
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    # Event-time validity floor: Spark's INITIAL watermark is epoch 0,
    # so a pre-epoch event time is late-from-birth and every stateful
    # operator silently drops it in the first micro-batch (--dates
    # fuzz).  Production streams reject/dead-letter invalid event times
    # at ingest; the guard here keeps the whole streaming family's
    # semantics explicit, and every events-reading streaming oracle
    # applies the identical floor (queries.register
    # ``stream_events_guard``).
    from .. import queries as _q
    stream = stream.filter(
        F.col("ts") >= F.lit(_q.STREAM_EVENTS_FLOOR).cast("timestamp"))
    return stream


def run_tumbling_count_stream(spark: SparkSession, events_path: str,
                              window: str = "1 hour",
                              watermark: str = "2 hours") -> DataFrame:
    """Run a tumbling-window count as a real stream to completion.

    availableNow + complete-mode memory sink ⇒ deterministic full
    result (equals the batch aggregation). The watermark is declared so
    the same query runs unbounded in production with bounded state.
    """
    stream = events_stream(spark, events_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("window.start", TS_FMT).alias("window_start"), "n")
    )
    name = "stream_out_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_sliding_count_stream(spark: SparkSession, events_path: str,
                             window: str = "2 hours",
                             slide: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """Sliding-window count stream (window > slide ⇒ each event lands
    in window/slide overlapping windows — Spark replicates the row to
    its window set in the streaming aggregation's projection, the same
    replicate-to-window-ends shape ``rolling_7day_active_users`` uses
    in batch).  availableNow + complete mode ⇒ equals the batch
    aggregation, so the two-shifted-tumbling-unions SQL is the oracle."""
    stream = events_stream(spark, events_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("window.start", TS_FMT).alias("window_start"), "n")
    )
    name = "stream_slide_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_slide_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_stream_stream_join(spark: SparkSession, events_path: str) -> DataFrame:
    """Stream-stream interval inner join: same-user event pairs within
    60 s, both sides watermarked so the join state is bounded. Drained
    with availableNow the emitted matches equal the batch range join —
    so the batch SQL is still the oracle."""
    a = events_stream(spark, events_path).select(
        F.col("event_id").alias("event_a"), F.col("user_id").alias("u_a"),
        F.col("ts").alias("ts_a"),
    ).withWatermark("ts_a", "10 minutes")
    b = events_stream(spark, events_path).select(
        F.col("event_id").alias("event_b"), F.col("user_id").alias("u_b"),
        F.col("ts").alias("ts_b"),
    ).withWatermark("ts_b", "10 minutes")
    joined = a.join(
        b,
        F.expr("""u_a = u_b AND ts_b > ts_a
                  AND ts_b <= ts_a + INTERVAL 60 SECONDS"""),
    ).select(
        "event_a", "event_b",
        (F.unix_timestamp(F.date_trunc("second", "ts_b"))
         - F.unix_timestamp(F.date_trunc("second", "ts_a"))).alias("gap_s"),
    )
    name = "stream_join_" + uuid.uuid4().hex[:10]
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_join_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_left_outer_interval_stream(spark: SparkSession,
                                   events_path: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every event emits — once
    per same-user event within the following 60 s, or with NULLs once
    the watermark proves no match can arrive.  The semantics inner
    joins cannot give: "did a follow-up happen?" per event.

    Drain caveat (and why the result is filtered): an availableNow
    drain's final watermark stops at max(event_time) − watermark, so
    left rows whose 60 s match-window is not yet past that point never
    get their NULL verdict.  Both this runner and the batch oracle
    therefore restrict to rows with ``ts_a < max_ts − (10 min + 60 s)``
    — the region where streaming output provably equals the batch left
    range join.
    """
    a = events_stream(spark, events_path).select(
        F.col("event_id").alias("event_a"), F.col("user_id").alias("u_a"),
        F.col("ts").alias("ts_a"),
    ).withWatermark("ts_a", "10 minutes")
    b = events_stream(spark, events_path).select(
        F.col("event_id").alias("event_b"), F.col("user_id").alias("u_b"),
        F.col("ts").alias("ts_b"),
    ).withWatermark("ts_b", "10 minutes")
    joined = a.join(
        b,
        F.expr("""u_a = u_b AND event_b <> event_a AND ts_b > ts_a
                  AND ts_b <= ts_a + INTERVAL 60 SECONDS"""),
        "leftOuter",
    ).select(
        "event_a", "event_b",
        F.date_format(F.date_trunc("second", "ts_a"),
                      TS_FMT).alias("ts_a_s"),
    )
    name = "stream_loj_" + uuid.uuid4().hex[:10]
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_loj_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    batch = spark.read.parquet(events_path)
    from ..catalog import normalize_ntz

    # Anchor the finalization cutoff on the SAME guarded relation the
    # stream and the guarded oracle read: a pre-epoch ts can never be
    # max(ts) today, but deriving the cutoff from the raw unfiltered
    # parquet would couple correctness to that accident.
    from .. import queries as _q  # local: avoids circular import
    mx = (
        normalize_ntz(batch)
        .where(F.col("ts") >= F.lit(_q.STREAM_EVENTS_FLOOR).cast("timestamp"))
        .agg(F.max("ts").alias("mx"))
    )
    return (
        out.crossJoin(F.broadcast(mx))
        .where(F.col("ts_a_s") < F.date_format(
            F.col("mx") - F.expr("INTERVAL 11 MINUTES"), TS_FMT))
        .select("event_a", "event_b", "ts_a_s")
    )


def run_late_data_stream(spark: SparkSession, events_path: str,
                         window: str = "1 hour",
                         watermark: str = "30 minutes") -> DataFrame:
    """Append-mode variant: only windows finalized by the watermark are
    emitted — demonstrates late-data discard semantics. Rows-only check
    (the unfinalized tail is intentionally absent)."""
    stream = events_stream(spark, events_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        # window.end rides along (raw timestamp) so the caller can
        # restrict to the watermark-finalized region for oracle-equality
        .select(F.date_format("window.start", TS_FMT).alias("window_start"),
                F.col("window.end").alias("window_end"), "event_type", "n")
    )
    name = "stream_late_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_static_enrich_stream(spark: SparkSession, events_path: str,
                             dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: every micro-batch inner-joins the
    event stream against a static (batch) dimension — the standard
    "enrich the firehose with reference data" topology.  The dim side
    is broadcast, so the stream is never shuffled for the join, and
    Spark re-resolves the static side per micro-batch.  Aggregated in
    complete mode and drained with availableNow, the result equals the
    batch join + aggregation, which stays the oracle."""
    stream = events_stream(spark, events_path)
    joined = stream.join(
        # bounded: enrichment-dim contract — caller supplies a bounded dim;
        # broadcast keeps the stream unshuffled per micro-batch
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"]
    )
    agg = joined.groupBy("c_nationkey").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    name = "stream_enrich_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_enrich_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_session_window_stream(spark: SparkSession, events_path: str,
                              gap: str = "10 minutes",
                              watermark: str = "2 hours") -> DataFrame:
    """Streaming gap-sessionization: ``session_window`` merges a user's
    events into variable-length sessions as they arrive.

    NOTE on modes: this runner uses ``outputMode("complete")`` so the
    memory sink holds the full final result of an availableNow drain —
    in complete mode the watermark does NOT evict state, so this exact
    query is only suitable for bounded backlogs.  For a long-running
    unbounded job, switch to ``outputMode("append")``: finalized
    sessions (older than max-event-time − watermark) are emitted once
    and their state dropped, which is the production configuration.
    Drained over a bounded backlog, both modes yield the same finalized
    sessions, so the batch gaps-and-islands SQL stays the oracle."""
    stream = events_stream(spark, events_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format(F.date_trunc("second", "session_window.start"),
                          TS_FMT).alias("session_start"),
            "n_events", "session_value",
        )
    )
    name = "stream_sess_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_sess_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_windowed_topk_stream(spark: SparkSession, events_path: str,
                             window: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """Streaming windowed top-k: the unbounded half (per-window
    per-type counts) runs as a watermarked streaming aggregation; the
    rank-within-window finishing step is applied to the drained result,
    where each window is final.  This is the standard two-phase split —
    Structured Streaming forbids window functions on a live stream, so
    the rank belongs in the finishing/serving layer."""
    from pyspark.sql import Window as W

    stream = events_stream(spark, events_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.date_format("window.start", TS_FMT).alias("window_start"),
                "event_type", "n")
    )
    name = "stream_topk_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_topk_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(name)
    # total-order: drained is one row per (window_start, event_type) —
    # the groupBy output — so event_type is unique within the partition
    rk = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (drained.withColumn("rk", F.row_number().over(rk))
            .where(F.col("rk") == 1).drop("rk"))


def run_full_outer_interval_stream(spark: SparkSession,
                                   events_path: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — the last cell of the
    streaming join matrix (inner / left-outer / full-outer): matched
    pairs emit immediately; an UNMATCHED row on either side emits with
    NULLs once the watermark proves its counterpart cannot arrive.

    Evictability: the interval condition bounds both event times
    (``ts_a < ts_b <= ts_a + 60 s``), so the a-side NULL verdict lands
    when the watermark passes ``ts_a + 60 s`` and the b-side verdict
    when it passes ``ts_b`` — both sides' state is dropped then, which
    is what makes this runnable forever at 100 TB/day (an unbounded
    full-outer join without the interval would hold both streams'
    entire history).

    Same drain caveat as the left-outer runner: availableNow's final
    watermark is ``max(event_time) − 10 min``, so output is restricted
    to the finalized region — per side, anchor ts < max − 11 min —
    where streaming output provably equals the batch full outer range
    join (the oracle applies the identical two-sided filter).
    """
    a = events_stream(spark, events_path).select(
        F.col("event_id").alias("event_a"), F.col("user_id").alias("u_a"),
        F.col("ts").alias("ts_a"),
    ).withWatermark("ts_a", "10 minutes")
    b = events_stream(spark, events_path).select(
        F.col("event_id").alias("event_b"), F.col("user_id").alias("u_b"),
        F.col("ts").alias("ts_b"),
    ).withWatermark("ts_b", "10 minutes")
    # ENGINE FIND (--dates --nullkeys fuzz): in the FULL OUTER cell —
    # and only there — Spark's stream-stream join MATCHES NULL equi-
    # keys to each other.  Outer semantics forbid the usual IsNotNull
    # inference on either side, so NULL-key rows reach the symmetric
    # hash join's state store, whose key comparison is byte-level:
    # NULL = NULL matches, violating SQL equality (inner/semi/left
    # infer the null filter on at least one side and stay correct;
    # reproduced in tests/test_fuzz_harness.py).  Restore SQL
    # semantics by routing NULL-key rows AROUND the join: they are
    # provably unmatched (NULL = x is never true), hence stateless
    # pass-throughs unioned into the same sink.
    a_v, b_v = a.filter(F.col("u_a").isNotNull()), \
        b.filter(F.col("u_b").isNotNull())
    joined = a_v.join(
        b_v,
        F.expr("""u_a = u_b AND event_b <> event_a AND ts_b > ts_a
                  AND ts_b <= ts_a + INTERVAL 60 SECONDS"""),
        "fullOuter",
    ).select(
        "event_a", "event_b",
        F.date_format(F.date_trunc("second", "ts_a"), TS_FMT).alias("ts_a_s"),
        F.date_format(F.date_trunc("second", "ts_b"), TS_FMT).alias("ts_b_s"),
    )
    null_a = a.filter(F.col("u_a").isNull()).select(
        "event_a", F.lit(None).cast("long").alias("event_b"),
        F.date_format(F.date_trunc("second", "ts_a"), TS_FMT).alias("ts_a_s"),
        F.lit(None).cast("string").alias("ts_b_s"))
    null_b = b.filter(F.col("u_b").isNull()).select(
        F.lit(None).cast("long").alias("event_a"), "event_b",
        F.lit(None).cast("string").alias("ts_a_s"),
        F.date_format(F.date_trunc("second", "ts_b"), TS_FMT).alias("ts_b_s"))
    joined = joined.unionByName(null_a).unionByName(null_b)
    name = "stream_foj_" + uuid.uuid4().hex[:10]
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_foj_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    batch = spark.read.parquet(events_path)
    from ..catalog import normalize_ntz

    # Anchor the finalization cutoff on the SAME guarded relation the
    # stream and the guarded oracle read: a pre-epoch ts can never be
    # max(ts) today, but deriving the cutoff from the raw unfiltered
    # parquet would couple correctness to that accident.
    from .. import queries as _q  # local: avoids circular import
    mx = (
        normalize_ntz(batch)
        .where(F.col("ts") >= F.lit(_q.STREAM_EVENTS_FLOOR).cast("timestamp"))
        .agg(F.max("ts").alias("mx"))
    )
    cutoff = F.date_format(F.col("mx") - F.expr("INTERVAL 11 MINUTES"), TS_FMT)
    anchor = F.coalesce(F.col("ts_a_s"), F.col("ts_b_s"))
    return (
        out.crossJoin(F.broadcast(mx))
        .where(anchor < cutoff)
        .select("event_a", "event_b", "ts_a_s", "ts_b_s")
    )


def run_semi_interval_stream(spark: SparkSession,
                             events_path: str) -> DataFrame:
    """Stream-stream LEFT SEMI interval join: each purchase emits (at
    most once) iff a same-user click follows within 60 s — the
    existence-check cell of the streaming join matrix.  Semi is the
    right form when the right side is only a predicate: no match
    columns are carried, and the left row leaves state on its FIRST
    match instead of waiting to pair with every one.

    Both sides are watermarked and the interval bounds both event
    times, so state is evicted once the watermark passes
    ``ts_p + 60 s`` — runnable unbounded.  Drained with availableNow
    the emitted set equals the batch EXISTS subquery, which stays the
    oracle.
    """
    p = events_stream(spark, events_path).where(
        F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("u_p"), F.col("ts").alias("ts_p"),
    ).withWatermark("ts_p", "10 minutes")
    c = events_stream(spark, events_path).where(
        F.col("event_type") == "click").select(
        F.col("user_id").alias("u_c"), F.col("ts").alias("ts_c"),
    ).withWatermark("ts_c", "10 minutes")
    joined = p.join(
        c,
        F.expr("""u_p = u_c AND ts_c > ts_p
                  AND ts_c <= ts_p + INTERVAL 60 SECONDS"""),
        "leftSemi",
    ).select(
        "purchase_id", F.col("u_p").alias("user_id"),
        F.date_format(F.date_trunc("second", "ts_p"), TS_FMT).alias("ts_s"),
    )
    name = "stream_semi_" + uuid.uuid4().hex[:10]
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_semi_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_chained_windows_stream(spark: SparkSession,
                               events_path: str) -> DataFrame:
    """CHAINED streaming aggregation (Spark 3.4+ multiple stateful
    operators): hourly event counts re-aggregated into per-day
    peak/total INSIDE one streaming query — ``window()`` applied to
    the upstream window column.  Pre-3.4 this took two jobs with an
    intermediate sink; chaining keeps it one job, one checkpoint.

    In append mode a day only emits once the watermark passes its end,
    so an availableNow drain (final watermark = max ts − 2 h) never
    finalizes the last partial day.  Output and oracle are therefore
    restricted to days wholly ≤ max ts − 2 h — the finalized region
    where stream equals batch (same contract as the outer-join
    runners).
    """
    stream = events_stream(spark, events_path)
    hourly = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    daily = (
        hourly.groupBy(F.window(F.col("window"), "1 day"))
        .agg(F.max("n").alias("max_hourly"), F.sum("n").alias("n_events"))
        .select(F.date_format("window.start", "yyyy-MM-dd").alias("day"),
                F.col("window.end").alias("day_end"),
                "max_hourly", "n_events")
    )
    name = "stream_chain_" + uuid.uuid4().hex[:10]
    q = (
        daily.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_chain_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    batch = spark.read.parquet(events_path)
    from ..catalog import normalize_ntz

    # Anchor the finalization cutoff on the SAME guarded relation the
    # stream and the guarded oracle read: a pre-epoch ts can never be
    # max(ts) today, but deriving the cutoff from the raw unfiltered
    # parquet would couple correctness to that accident.
    from .. import queries as _q  # local: avoids circular import
    mx = (
        normalize_ntz(batch)
        .where(F.col("ts") >= F.lit(_q.STREAM_EVENTS_FLOOR).cast("timestamp"))
        .agg(F.max("ts").alias("mx"))
    )
    return (
        out.crossJoin(F.broadcast(mx))
        .where(F.col("day_end") <= F.col("mx") - F.expr("INTERVAL 2 HOURS"))
        .select("day", "max_hourly", F.col("n_events").cast("long").alias("n_events"))
    )


def run_session_dynamic_gap_stream(spark: SparkSession, events_path: str,
                                   watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization with a PER-EVENT gap (purchase keeps
    the session alive 30 min, everything else 10): ``session_window``
    with a Column gap runs identically on a stream — the state store
    tracks each key's open session end as the running max of
    event-time + that event's own gap.  Same complete-mode/availableNow
    drain contract as ``run_session_window_stream`` (see its mode
    note); the batch dynamic-gap oracle stays the ground truth."""
    stream = events_stream(spark, events_path)
    gap = (F.when(F.col("event_type") == "purchase", F.lit("30 minutes"))
           .otherwise(F.lit("10 minutes")))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format(F.date_trunc("second", "session_window.start"),
                          TS_FMT).alias("session_start"),
            F.date_format(F.date_trunc("second", "session_window.end"),
                          TS_FMT).alias("session_end"),
            "n_events", "session_value",
        )
    )
    name = "stream_dsess_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_dsess_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_stream_static_enrich(spark: SparkSession, events_path: str,
                             static_dims: DataFrame) -> DataFrame:
    """Stream-static dimension enrichment: the canonical "enrich a
    stream with reference data" pattern — a STREAMING fact joined to a
    BATCH dim table inside the streaming query.  Spark executes the
    static side as a per-micro-batch broadcast: stateless (no
    watermark needed for the join itself, no state store), so at scale
    the streaming side never shuffles for the join and the dim is
    re-resolved each batch (a slowly-changing dim picks up updates
    between batches for free).

    ``static_dims`` must be (user_id, segment)-shaped; the drained
    complete-mode aggregate equals the batch join+group-by exactly
    because every operator here is stateless below the final agg.
    """
    stream = events_stream(spark, events_path)
    # bounded: enrichment-dim contract — caller-bounded static side;
    # broadcast keeps the stream unshuffled per micro-batch
    enriched = stream.join(F.broadcast(static_dims), "user_id")
    agg = (
        enriched.groupBy("segment", "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )
    name = "stream_enrich_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_enrich_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_chunk_index_stream(spark: SparkSession, docs_path: str,
                           width: int = 120, stride: int = 80) -> DataFrame:
    """Streaming chunk-index ingest: documents arriving as files are
    chunked (fixed window/stride, md5 fingerprints) the moment they
    land — the RAG-index build running AT INGEST instead of as a
    nightly batch.  The transform is STATELESS (per-row fan-out, no
    watermark, no state store), so append-mode streaming output equals
    the batch chunking exactly — the strongest stream==batch parity
    cell, complementing the stateful families.  availableNow drains
    the backlog once; at scale the same query tails a landing bucket
    and the file-source checkpoint guarantees each doc is chunked
    exactly once."""
    import tempfile
    import uuid

    batch_schema = spark.read.parquet(docs_path).schema
    reader = spark.readStream.schema(batch_schema)
    if docs_path.endswith(".parquet"):
        parent, base = docs_path.rsplit("/", 1)
        stream = reader.option("pathGlobFilter", base).parquet(parent)
    else:
        stream = reader.parquet(docs_path)
    s = F.col("s")
    chunk = F.substring(F.col("text"), (s + 1).cast("int"), width)
    out = (stream
           # empty/NULL docs chunk to nothing — same contract as the
           # batch twin doc_chunk_fixed_stride (an ANSI sequence(0, -1)
           # would kill the whole stream on one empty doc)
           .filter(F.col("n_chars") >= 1)
           .select("doc_id", "text",
                   F.explode(F.sequence(
                       F.lit(0).cast("long"), F.col("n_chars") - 1,
                       F.lit(stride).cast("long"))).alias("s"))
           .select("doc_id",
                   F.expr(f"s div {stride}").alias("chunk_id"),
                   s.alias("chunk_start"),
                   F.length(chunk).cast("long").alias("chunk_len"),
                   F.md5(chunk).alias("chunk_md5")))
    name = "chunk_index_" + uuid.uuid4().hex[:10]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="ckpt_chunkidx_"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)


def run_cdc_chunk_index_stream(spark: SparkSession, docs_path: str,
                               chunk_list_expr: str | None = None,
                               winners: "DataFrame | None" = None,
                               chunker=None) -> DataFrame:
    """Content-defined chunking AT INGEST: same stateless file-source →
    append-memory-sink shape as :func:`run_chunk_index_stream`, but the
    fan-out is the caller-supplied CDC chunk-struct-list expression
    (queries.tokenizer_q builds it; passed as SQL text so this module
    needs no import from the queries layer).  Stateless ⇒ streamed
    rows equal batch CDC chunking row for row — the parity the batch
    oracle grades.  availableNow drains the backlog once; at scale the
    query tails a landing bucket and the file-source checkpoint
    guarantees each doc is chunked exactly once.

    ``chunker`` (r16, VERDICT r15 #9): an optional callable
    ``df(doc_id, text, n_chars, ...) -> chunk rows`` — the batch
    NumPy/Arrow chunker (queries.tokenizer_q._cdc_chunks), stateless
    ``mapInPandas`` and therefore streaming-legal.  The two chunker
    forms are pinned byte-identical by tests/test_cdc_chunking.py;
    the interpreted-expression form (``chunk_list_expr``) remains the
    dependency-free fallback."""
    import tempfile
    import uuid

    batch_schema = spark.read.parquet(docs_path).schema
    reader = spark.readStream.schema(batch_schema)
    if docs_path.endswith(".parquet"):
        parent, base = docs_path.rsplit("/", 1)
        stream = reader.option("pathGlobFilter", base).parquet(parent)
    else:
        stream = reader.parquet(docs_path)
    if winners is not None:
        # identity hygiene at ingest (--dupkeys): keep only rows whose
        # full payload matches the deterministic per-doc_id winner
        # (operators.text.unique_documents on the static landing
        # table), then collapse exact-duplicate redeliveries — every
        # surviving candidate is byte-identical, so the stateful
        # dropDuplicates pick is value-deterministic.  Production
        # dedups once at the bronze boundary instead.
        # no broadcast hint: winners is the CORPUS-sized deduped
        # landing table — at 100 TB the static side would be the
        # narrow (doc_id, content hash) projection and Catalyst picks
        # the stream-static join strategy per micro-batch
        w = winners.select(
            F.col("doc_id").alias("w_id"), F.col("text").alias("w_text"),
            F.col("lang").alias("w_lang"),
            F.col("source").alias("w_src"),
            F.col("n_chars").alias("w_nc"))
        stream = (stream.join(
            w, F.col("doc_id").eqNullSafe(F.col("w_id"))
            & F.col("text").eqNullSafe(F.col("w_text"))
            & F.col("lang").eqNullSafe(F.col("w_lang"))
            & F.col("source").eqNullSafe(F.col("w_src"))
            & F.col("n_chars").eqNullSafe(F.col("w_nc")))
            .select("doc_id", "text", "lang", "source", "n_chars")
            .dropDuplicates(["doc_id"]))
    if chunker is not None:
        out = chunker(stream)
    else:
        out = (stream.filter(F.col("n_chars") >= 1)
               .select("doc_id", "text",
                       F.posexplode(F.expr(chunk_list_expr))
                       .alias("chunk_idx", "c"))
               .select("doc_id", "chunk_idx",
                       F.col("c.s").alias("chunk_start"),
                       F.col("c.l").alias("chunk_len"),
                       F.md5(F.expr("substr(text, CAST(c.s + 1 AS INT),"
                                    " CAST(c.l AS INT))"))
                       .alias("chunk_md5")))
    name = "cdc_chunk_index_" + uuid.uuid4().hex[:10]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="ckpt_cdcidx_"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)


def run_ingest_dedup_stream(spark: SparkSession,
                            docs_path: str) -> DataFrame:
    """Exact dedup at the ingest boundary: a file-source stream of
    documents (the doc_id % 10 >= 8 slice plays the landing batch) is
    content-hashed and stream-static LEFT ANTI joined against the
    history's md5 set (docs with doc_id % 10 < 8) — only
    genuinely-new documents are emitted.  Stateless on the stream side
    (no watermark, no state store; the static side carries all the
    memory and is re-planned per micro-batch), so append-mode output
    equals the batch anti join row for row.  availableNow drains the
    backlog once; the file-source checkpoint guarantees each landing
    file is deduped exactly once."""
    import tempfile
    import uuid

    batch = spark.read.parquet(docs_path)
    hist = (batch.filter(F.col("doc_id") % 10 < 8)
            .select(F.md5("text").alias("h")).distinct())
    reader = spark.readStream.schema(batch.schema)
    if docs_path.endswith(".parquet"):
        parent, base = docs_path.rsplit("/", 1)
        stream = reader.option("pathGlobFilter", base).parquet(parent)
    else:
        stream = reader.parquet(docs_path)
    incoming = (stream.filter(F.col("doc_id") % 10 >= 8)
                .select("doc_id", "lang", F.md5("text").alias("h")))
    out = incoming.join(hist, "h", "left_anti")
    name = "ingest_dedup_" + uuid.uuid4().hex[:10]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="ckpt_ingestdd_"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)
