"""Analytics compositions: retention, conversion latency, dedup
survivors, normalization, grouped top-k lists, streaming dedup."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as D
from . import register


@register(
    "hour_over_hour_retention",
    oracle="""
    WITH active AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events)
    SELECT strftime(a.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users,
           CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS retained_next_hour
    FROM active a LEFT JOIN active b
      ON b.user_id = a.user_id AND b.h = a.h + INTERVAL '1 hour'
    GROUP BY a.h
    """,
    tags=("events", "retention"),
)
def hour_over_hour_retention(spark, sf_dir):
    """Hour-over-hour retention: distinct active users per hour joined
    against themselves one bucket later."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select("user_id", F.date_trunc("hour", "ts").alias("h")).distinct()
    nxt = active.select(F.col("user_id").alias("u2"), F.col("h").alias("h2"))
    return (
        active.join(
            nxt,
            (F.col("u2") == F.col("user_id"))
            & (F.col("h2") == F.col("h") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy("h")
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.countDistinct("u2").alias("retained_next_hour"),
        )
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "active_users", "retained_next_hour",
        )
    )


@register(
    "conversion_latency_histogram",
    oracle="""
    WITH sign AS (SELECT user_id, MIN(ts) AS s_ts FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
    conv AS (
      SELECT s.user_id, MIN(e.ts) AS p_ts, MIN(s.s_ts) AS s_ts
      FROM sign s JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase' AND e.ts > s.s_ts
      GROUP BY s.user_id
    )
    SELECT CAST((CAST(epoch(date_trunc('second', p_ts)) AS BIGINT)
                 - CAST(epoch(date_trunc('second', s_ts)) AS BIGINT)) // 3600 AS BIGINT)
             AS latency_hours,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM conv GROUP BY 1
    """,
    tags=("events", "funnel"),
)
def conversion_latency_histogram(spark, sf_dir):
    """Signup→purchase latency distribution in whole hours."""
    ev = load_table(spark, sf_dir, "events")
    sign = (ev.filter(F.col("event_type") == "signup")
            .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    pur = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    conv = (
        sign.join(pur, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.min("s_ts").alias("s_ts"))
    )
    secs = (F.unix_timestamp(F.date_trunc("second", "p_ts"))
            - F.unix_timestamp(F.date_trunc("second", "s_ts")))
    return (
        conv.select(F.floor(secs / 3600).cast("long").alias("latency_hours"))
        .groupBy("latency_hours").agg(F.count("*").alias("n_users"))
    )


@register(
    "dedup_survivors",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, GREATEST(array_length(t) - 1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
    ), mh AS (
      SELECT doc_id,
             MIN(substr(md5(tok), 1, 8))  AS m0, MIN(substr(md5(tok), 9, 8))  AS m1,
             MIN(substr(md5(tok), 17, 8)) AS m2, MIN(substr(md5(tok), 25, 8)) AS m3,
             MIN(substr(md5('x' || tok), 1, 8))  AS m4, MIN(substr(md5('x' || tok), 9, 8))  AS m5,
             MIN(substr(md5('x' || tok), 17, 8)) AS m6, MIN(substr(md5('x' || tok), 25, 8)) AS m7
      FROM toks GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS sig FROM mh UNION ALL
      SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh UNION ALL
      SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh UNION ALL
      SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
                               AND a.doc_id < b.doc_id
    )
    SELECT d.doc_id AS doc_id, d.lang AS lang
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_b FROM pairs)
    """,
    tags=("dedup", "pipeline"),
)
def dedup_survivors(spark, sf_dir):
    """End-to-end fuzzy-dedup survivor set: drop every doc that appears
    as the larger id of an LSH candidate pair (keep-first policy)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.candidate_pairs(D.lsh_bands(D.minhash_signatures(d)))
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return d.join(losers, "doc_id", "left_anti").select("doc_id", "lang")


@register(
    "text_normalization",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                   ' +', ' ', 'g'))) AS norm_hash,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                           ' +', ' ', 'g'))) AS BIGINT) AS norm_len
    FROM documents
    """,
    tags=("text",),
)
def text_normalization(spark, sf_dir):
    """Canonical text-cleaning chain: lowercase → strip non-alnum →
    collapse whitespace → trim, fingerprinted."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "))
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@register(
    "grouped_topk_list",
    oracle="""
    SELECT lang,
           array_to_string((list_sort(list(DISTINCT source)))[1:3], ',') AS top_sources
    FROM documents GROUP BY lang
    """,
    tags=("text", "agg"),
)
def grouped_topk_list(spark, sf_dir):
    """First-k of a sorted distinct collection per group (bounded
    collect — the safe pattern vs unbounded collect_list at scale)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.concat_ws(",", F.slice(F.array_sort(F.collect_set("source")), 1, 3)).alias("top_sources")
    )


@register(
    "streaming_dedup_ids",
    oracle="""
    SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    """,
    tags=("events", "streaming", "dedup"),
    stream_events_guard=True,
)
def streaming_dedup_ids(spark, sf_dir):
    """Streaming exactly-once dedup: ``dropDuplicates`` with a
    watermark over the drained source; unique count equals the batch
    distinct (state bounded by the watermark in production)."""
    import tempfile
    import uuid

    from ..streaming.windows import events_stream

    stream = (
        events_stream(spark, f"{sf_dir}/events.parquet")
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy()
        .agg(F.count("*").alias("n"))
    )
    name = "dedup_" + uuid.uuid4().hex[:10]
    q = (
        stream.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_dd_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # splice the drained 1-row stream result in-plan (broadcast) instead
    # of a driver-side collect — same convention as operators/text.py.
    unique = spark.table(name).select(F.col("n").cast("long").alias("n_unique"))
    from . import STREAM_EVENTS_FLOOR
    # arrival count post-ingest-guard: every number in the output
    # describes the guarded stream (see events_stream / --dates fuzz)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit(STREAM_EVENTS_FLOOR).cast("timestamp"))
    return (
        ev.agg(F.count("*").alias("n_rows"))
        # bounded: unique is the drained 1-row stream aggregate
        .crossJoin(F.broadcast(unique))
        .select("n_unique", "n_rows")
    )


@register(
    "cohort_retention_matrix",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
      GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
    tags=("analytics", "retention", "cohort"),
)
def cohort_retention_matrix(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, active
    user counts at each day offset 0..7 — the (cohort × offset) grid a
    growth dashboard renders.

    Scale shape (verified in the executed plan): the per-user MIN
    aggregates map-side before its one small shuffle, then joins BACK
    as the broadcast side — raw events are never shuffled for the
    join.  The distinct + count run over (user, cohort, offset) rows,
    day-granular: cardinality is users × ≤8, never raw events.  When
    the user dimension itself outgrows broadcast, AQE falls back to a
    sort-merge join — the window-min alternative would shuffle raw
    events unconditionally, so this form dominates either way.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day"))
    firsts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        days.join(firsts, "user_id")
        .select("user_id", "cohort_day",
                F.datediff("day", "cohort_day").alias("day_offset"))
        .where(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
    ).agg(F.count("*").alias("n_active"))


@register(
    "rolling_7day_active_users",
    oracle="""
    WITH day_users AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM day_users)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN day_users u
      ON u.day BETWEEN d.day - INTERVAL '6 days' AND d.day
    GROUP BY d.day
    """,
    tags=("analytics", "window", "distinct"),
)
def rolling_7day_active_users(spark, sf_dir):
    """Rolling 7-day distinct active users (WAU) per day.  COUNT
    DISTINCT over a sliding window has no partial-aggregate form, so
    the scale answer is granularity reduction THEN replication: dedup
    raw events to (day, user) rows — the only pass over full data, one
    map-side-combinable shuffle — and replicate each such row to the ≤7
    window-end days it serves via an ``explode`` in the projection (no
    join, no per-row state).  The final distinct count runs on
    days × users rows, independent of event volume.  (The same shape
    with HLL sketches per day — ``hll_union_daily`` — drops the
    distinct entirely when estimates suffice.)

    ``n_days`` is an explicit ``F.broadcast``: its cardinality is the
    number of calendar days — bounded at any data volume — so the
    day-spine join must never degrade to a sort-merge that shuffles
    the replicated rows.  Profiled in r6: 0.83 s warm min-of-3 at
    sf0.1 (2 scans / 4 exchanges, all but the first over day-granular
    rows) — the 4.83 s in BENCH_r05 was host CPU-steal during the
    driver run, not plan cost (this host reproduced 3.4 s first-run
    spikes on unrelated queries).
    """
    ev = load_table(spark, sf_dir, "events")
    day_users = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id").distinct()
    n_days = day_users.select("day").distinct()
    served = day_users.select(
        "user_id", "day",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
    ).select(
        "user_id",
        F.date_add("day", F.col("k")).alias("window_end"),
    )
    return (
        # bounded: n_days is one row per calendar day (O(days), not O(events))
        served.join(F.broadcast(n_days), served.window_end == n_days.day,
                    "inner")
        .groupBy(F.date_format("window_end", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@register(
    "ordered_funnel_conversion",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT)
        AS n_view,
      CAST(COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      THEN 1 END) AS BIGINT)  AS n_view_then_click,
      CAST(COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                       AND t_purchase > t_click
                      THEN 1 END) AS BIGINT)  AS n_full_funnel
    FROM steps
    """,
    tags=("analytics", "funnel", "agg"),
)
def ordered_funnel_conversion(spark, sf_dir):
    """ORDER-aware funnel: users counted at each stage only if the
    stages happened in sequence (first view before first click before
    first purchase) — the conversion metric `event_type_funnel`'s
    order-blind counts cannot express.  NULL semantics do the
    step-gating: a missing step's MIN is NULL and the `>` comparison
    is never true, so no explicit NULL checks are needed past the
    first step.

    Scale: one map-side-combinable groupBy(user) computing three
    conditional MINs (the only full-data shuffle), then a 1-row global
    conditional count — no joins, no windows, no per-user event
    ordering materialized.
    """
    ev = load_table(spark, sf_dir, "events")
    steps = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return steps.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("t_view").isNotNull()
                       & (F.col("t_click") > F.col("t_view")), 1))
        .alias("n_view_then_click"),
        F.count(F.when(F.col("t_view").isNotNull()
                       & (F.col("t_click") > F.col("t_view"))
                       & (F.col("t_purchase") > F.col("t_click")), 1))
        .alias("n_full_funnel"),
    )


@register(
    "exp_decay_trending_score",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    scored AS (
      SELECT e.user_id,
             e.value * EXP(-0.1 * date_diff('day', CAST(e.ts AS DATE),
                                            CAST(mx.m AS DATE))) AS s
      FROM events e, mx WHERE e.event_type = 'purchase'
    )
    SELECT user_id, ROUND(SUM(s), 4) AS trend_score,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM scored GROUP BY user_id
    """,
    tags=("analytics", "timeseries", "agg"),
)
def exp_decay_trending_score(spark, sf_dir):
    """Exponential time-decay popularity (half-life ≈ 7 days at
    λ=0.1/day): recent purchases count nearly fully, month-old ones a
    twentieth — the trending/ranking score every feed and
    recommender warehouse maintains.  Day-granular age keeps the
    decay factor engine-exact (both engines compute EXP of the same
    small integers).  Scale: the anchor max(ts) is a 1-row broadcast;
    scoring is a scan projection; one map-side-combinable groupBy.
    Incremental maintenance note (the reason decay beats windows):
    yesterday's score times exp(-λ) plus today's events IS today's
    score — a merge, not a recompute.
    """
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("m"))
    p = ev.where(F.col("event_type") == "purchase").crossJoin(F.broadcast(mx))
    s = F.col("value") * F.exp(-0.1 * F.datediff("m", F.col("ts").cast("date")))
    return (
        p.groupBy("user_id")
        .agg(F.round(F.sum(s), 4).alias("trend_score"),
             F.count("*").alias("n_purchases"))
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT CAST(MAX(ts) AS DATE) AS m FROM events),
    per_user AS (
      SELECT user_id,
             date_diff('day', CAST(MAX(ts) AS DATE), (SELECT m FROM mx))
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(value) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), scored AS (
      SELECT user_id,
             -- user_id NULLS FIRST explicit: the anonymous-purchaser
             -- group (NULL user_id) must tie-break identically in both
             -- engines (--nullkeys fuzz)
             NTILE(5) OVER (ORDER BY recency_days DESC,
                            user_id NULLS FIRST) AS r,
             NTILE(5) OVER (ORDER BY frequency, user_id NULLS FIRST) AS f,
             NTILE(5) OVER (ORDER BY monetary NULLS FIRST,
                            user_id NULLS FIRST) AS m
      FROM per_user
    )
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM scored GROUP BY r, f, m
    """,
    tags=("analytics", "window", "segmentation"),
)
def rfm_segmentation(spark, sf_dir):
    """RFM segmentation — the classic marketing model: every purchaser
    scored 1-5 on Recency, Frequency, Monetary via NTILE quintiles,
    reported as segment-cell sizes.  The user_id tiebreak inside each
    NTILE ordering pins identical quintile boundaries on both engines.

    Scale note: the quintile windows here are global (one ordering
    over PER-USER rows — audience-sized, thousands-not-billions, and
    already reduced from raw events by the groupBy).  If the user
    dimension itself outgrows a partition, the histogram-cumulative
    form (``quality_decile_mix_histogram``) replaces each NTILE.
    """
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("mxd"))
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(F.datediff(F.max("mxd"), F.max(F.col("ts").cast("date")))
             .alias("recency_days"),
             F.count("*").alias("frequency"),
             F.sum("value").alias("monetary"))
    )
    from pyspark.sql import Window
    # bounded: fed by the per-user groupBy above — audience-sized
    # (thousands, not corpus rows); histogram-cumulative substitute
    # (quality_decile_mix_histogram) is the registered scale form
    uid = F.asc_nulls_first("user_id")  # explicit: see oracle note
    # bounded: fed by the per-user groupBy above — audience-sized
    r = F.ntile(5).over(Window.orderBy(F.col("recency_days").desc(), uid))
    f = F.ntile(5).over(Window.orderBy(F.col("frequency").asc(), uid))  # bounded: ^
    # NULLS FIRST explicit: a purchaser whose every purchase value is
    # NULL has unknown spend and ranks below the lowest known spender —
    # Spark's bare ASC already does this; DuckDB's default is NULLS
    # LAST (fuzz_oracle.py)
    m = F.ntile(5).over(Window.orderBy(F.asc_nulls_first("monetary"),
                                       uid))  # bounded: ^
    return (
        per_user.select(r.cast("long").alias("r"), f.cast("long").alias("f"),
                        m.cast("long").alias("m"))
        .groupBy("r", "f", "m").agg(F.count("*").alias("n_users"))
    )


@register(
    "key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
      GROUP BY user_id
    ), t AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM c),
    top AS (
      SELECT n FROM c ORDER BY n DESC, user_id LIMIT 10
    )
    SELECT CAST(t.n_keys AS BIGINT) AS n_keys,
           CAST(t.total AS BIGINT) AS n_rows,
           CAST((SELECT MAX(n) FROM c) AS BIGINT) AS hottest_key_rows,
           ROUND(CAST((SELECT SUM(n) FROM top) AS DOUBLE) / t.total, 4)
             AS top10_share
    FROM t
    """,
    tags=("analytics", "skew", "agg"),
)
def key_skew_profile(spark, sf_dir):
    """Shuffle-key skew PROFILE — the diagnostic run before choosing a
    partitioning strategy: key cardinality, hottest-key row count, and
    the share of rows held by the top-10 keys.  top10_share near 1.0
    says "salt this key" (``salted_skew_join``); near 10/n_keys says
    the key is safe.  One map-side-combinable count per key; the
    top-10 is a TakeOrdered over key-count rows, never raw data.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"), F.count("*").alias("n_keys"),
              F.max("n").alias("hottest_key_rows"))
    top = (c.orderBy(F.col("n").desc(), "user_id").limit(10)
           .agg(F.sum("n").alias("top_n")))
    return (
        t.crossJoin(F.broadcast(top))
        .select(F.col("n_keys").cast("long").alias("n_keys"),
                F.col("total").cast("long").alias("n_rows"),
                F.col("hottest_key_rows").cast("long").alias("hottest_key_rows"),
                F.round(F.col("top_n") / F.col("total"), 4)
                .alias("top10_share"))
    )


@register(
    "session_scoped_funnel",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_type,
             CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                       - CAST(FLOOR(epoch(LAG(ts) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id)))
                         AS BIGINT) <= 600
                  THEN 0 ELSE 1 END AS new_s,
             event_id
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), steps AS (
      SELECT user_id, sid, MIN(ts) AS t0,
             MIN(CASE WHEN event_type = 'view' THEN ts END)     AS tv,
             MIN(CASE WHEN event_type = 'click' THEN ts END)    AS tc,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM sess GROUP BY user_id, sid
    )
    SELECT strftime(t0, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(CASE WHEN tv IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_view_sessions,
           CAST(COUNT(CASE WHEN tv IS NOT NULL AND tc > tv AND tp > tc
                           THEN 1 END) AS BIGINT)
             AS n_ordered_conversions
    FROM steps GROUP BY 1
    """,
    tags=("analytics", "funnel", "session"),
)
def session_scoped_funnel(spark, sf_dir):
    """The ordered view→click→purchase funnel evaluated WITHIN a
    session (10-min inactivity gap) and reported per session-start
    day: conversions must happen in one visit, the definition product
    analytics actually bills as "session conversion rate" —
    ``ordered_funnel_conversion``'s lifetime-scoped variant.  The
    same first-step MIN gating applies, scoped to (user, session):
    NULL step MINs fail the ``>`` chain, so missing steps need no
    explicit checks.

    Scale: the lag-gap window, the per-session conditional MINs, and
    the two rollups all derive from ONE shuffle on ``user_id`` (the
    day rollup runs on session-granular rows).  The gap compare is
    floor-second on both engines (Spark ``cast long`` truncates;
    DuckDB ``FLOOR(epoch(...))`` matches — a raw ``CAST(double AS
    BIGINT)`` would round-half-even and disagree on boundaries).
    """
    ev = load_table(spark, sf_dir, "events")
    # total-order: ties share (ts, event_id); the windows carry only ts
    # (equal across tied rows), so gaps, flags and session ids are
    # roll-invariant and the rollups aggregate multisets order-free
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > 600), F.lit(1)).otherwise(F.lit(0)))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("sid", F.sum("new_s").over(run))
    steps = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("tc"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("tp"),
    )
    ordered = (F.col("tv").isNotNull()
               & (F.col("tc") > F.col("tv"))
               & (F.col("tp") > F.col("tc")))
    return steps.groupBy(
        F.date_format("t0", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_sessions"),
        F.count_if(F.col("tv").isNotNull()).alias("n_view_sessions"),
        F.count_if(ordered).alias("n_ordered_conversions"),
    )


@register(
    "basket_pair_lift",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
    ), nb AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n FROM b),
    item AS (SELECT p, COUNT(*) AS s FROM b GROUP BY p),
    pairs AS (
      SELECT a.p AS pa, c.p AS pb, COUNT(*) AS s_ab
      FROM b a JOIN b c ON a.k = c.k AND a.p < c.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT pa, pb, CAST(s_ab AS BIGINT) AS s_ab,
           ROUND(CAST(s_ab AS DOUBLE) / ia.s, 6) AS confidence,
           ROUND(CAST(s_ab AS DOUBLE) * nb.n / (ia.s * ib.s), 6) AS lift
    FROM pairs JOIN item ia ON ia.p = pairs.pa
    JOIN item ib ON ib.p = pairs.pb
    CROSS JOIN nb
    ORDER BY lift DESC, pa, pb
    LIMIT 20
    """,
    tags=("analytics", "join", "topk"),
)
def basket_pair_lift(spark, sf_dir):
    """Market-basket association mining — top-20 item pairs by LIFT
    (support ≥ 3): confidence = P(b|a), lift = P(a,b)/(P(a)·P(b)) —
    the Apriori first pass every recommender / store-layout /
    co-purchase analysis starts with, over order baskets.

    Scale: the pair join is SELF-JOIN ON THE BASKET KEY, so the work
    is Σ |basket|² — bounded by the basket-size cap (order lines,
    ~single digits), never items × items; item supports and the
    basket total are one aggregation each, joined back at PAIR
    granularity (item side is catalog-bounded).  Min-support prunes
    before the stats joins; the top-20 is TakeOrderedAndProject.
    A-priori's candidate explosion lives in longer itemsets — pairs
    are the production 90 % and stay quadratic only per basket.

    Determinism: integer supports; confidence/lift are single
    divisions of integers rounded to 6; order ties break on
    (pa, pb).
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_partkey").alias("p")).distinct()
    nb = b.agg(F.count_distinct("k").alias("n"))
    item = b.groupBy("p").agg(F.count("*").alias("s"))
    a = b.select("k", F.col("p").alias("pa"))
    c = b.select("k", F.col("p").alias("pb"))
    pairs = (a.join(c, "k")
             .filter(F.col("pa") < F.col("pb"))
             .groupBy("pa", "pb")
             .agg(F.count("*").alias("s_ab"))
             .filter(F.col("s_ab") >= 3))
    ia = item.select(F.col("p").alias("pa"), F.col("s").alias("sa"))
    ib = item.select(F.col("p").alias("pb"), F.col("s").alias("sb"))
    return (pairs.join(ia, "pa").join(ib, "pb")
            .crossJoin(F.broadcast(nb))  # bounded: 1-row basket total
            .select("pa", "pb", F.col("s_ab").cast("long").alias("s_ab"),
                    F.round(F.col("s_ab").cast("double") / F.col("sa"), 6)
                     .alias("confidence"),
                    F.round(F.col("s_ab").cast("double") * F.col("n")
                            / (F.col("sa") * F.col("sb")), 6).alias("lift"))
            .orderBy(F.desc("lift"), "pa", "pb")
            .limit(20))
