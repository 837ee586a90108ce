"""Sketch wave 2: count-min-sketch heavy hitters (the bounded-memory
frequency estimator a 100 TB stream can actually afford) plus the SCD2
current-state snapshot that completes the warehouse interval family.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.events import unique_events
from . import register

CMS_W = 128  # bucket width per row
CMS_HASHES = ((31, 7), (97, 3), (193, 11))  # (multiplier, shift) rows


def _bucket_sql(expr: str, mult: int, shift: int) -> str:
    return f"(({expr} * {mult} + {shift}) % {CMS_W})"


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events GROUP BY user_id
    ),
    r0 AS (SELECT {_bucket_sql('user_id', 31, 7)} AS b,
                  CAST(SUM(exact_n) AS BIGINT) AS n FROM per_user GROUP BY 1),
    r1 AS (SELECT {_bucket_sql('user_id', 97, 3)} AS b,
                  CAST(SUM(exact_n) AS BIGINT) AS n FROM per_user GROUP BY 1),
    r2 AS (SELECT {_bucket_sql('user_id', 193, 11)} AS b,
                  CAST(SUM(exact_n) AS BIGINT) AS n FROM per_user GROUP BY 1),
    top AS (
      SELECT user_id, exact_n FROM per_user
      ORDER BY exact_n DESC, user_id LIMIT 10
    )
    SELECT t.user_id, t.exact_n,
           CAST(LEAST(r0.n, r1.n, r2.n) AS BIGINT) AS cms_est,
           CAST(LEAST(r0.n, r1.n, r2.n) - t.exact_n AS BIGINT)
             AS overestimate
    FROM top t
    JOIN r0 ON r0.b = {_bucket_sql('t.user_id', 31, 7)}
    JOIN r1 ON r1.b = {_bucket_sql('t.user_id', 97, 3)}
    JOIN r2 ON r2.b = {_bucket_sql('t.user_id', 193, 11)}
    """,
    tags=("scale", "approx", "sketch"),
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch over per-user event counts: three hash rows of
    128 buckets each; a key's estimate is the MIN of its three bucket
    totals (only collisions inflate, never deflate — so
    ``overestimate ≥ 0`` always, asserted by the oracle diff column).
    Estimates are reported for the exact top-10 users so sketch error
    is measured where it matters.

    Scale: the sketch is 3×128 counters — kilobytes, mergeable across
    partitions/days exactly like the HLL rollup (``hll_union_daily``).
    The only data-scale shuffle is the per-user pre-aggregation; every
    sketch row then re-aggregates a user-cardinality relation.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))

    def bucket(col, mult, shift):
        return (col * mult + shift) % CMS_W

    rows = []
    for mult, shift in CMS_HASHES:
        rows.append(
            per_user.groupBy(
                bucket(F.col("user_id"), mult, shift).alias("b"))
            .agg(F.sum("exact_n").alias("n"))
        )
    top = (per_user.orderBy(F.desc("exact_n"), "user_id").limit(10))
    out = top
    for i, ((mult, shift), r) in enumerate(zip(CMS_HASHES, rows)):
        out = out.join(
            # bounded: r is one CMS register row per bucket (fixed width)
            F.broadcast(r.withColumnRenamed("n", f"n{i}")),
            bucket(F.col("user_id"), mult, shift) == F.col("b"),
        ).drop("b")
    est = F.least("n0", "n1", "n2").cast("long")
    return out.select(
        "user_id", "exact_n",
        est.alias("cms_est"),
        (est - F.col("exact_n")).cast("long").alias("overestimate"),
    )


@register(
    "scd2_current_snapshot",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    ), hist AS (
      SELECT user_id, event_type, ts,
             -- event_id DESC tie-break (--nullkeys fuzz): several
             -- change rows can share the max ts under the tie-storm
             -- fixtures, and an untied pick is engine-nondeterministic
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_states
    FROM changes
    )
    SELECT user_id, event_type AS current_state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS state_since,
           CAST(n_states AS BIGINT) AS n_state_changes
    FROM hist WHERE rn = 1
    """,
    tags=("warehouse", "scd2", "window"),
    unique_events_guard=True,
)
def scd2_current_snapshot(spark, sf_dir):
    """The "current view" every SCD2 table is queried for: each user's
    latest state, when it began, and how many state changes the history
    holds — the serving-side complement of
    ``scd2_event_type_intervals`` (whose open 9999-12-31 interval this
    row materializes).

    Scale: same single ``user_id`` shuffle as the interval build; the
    change-compression happens before the latest-row reduce, so the
    top-1 pass sees only state transitions, not raw events.
    """
    ev = unique_events(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull()
               | (F.col("event_type") != F.col("prev_type")))
    )
    # event_id tie-break: see the oracle's hist-CTE note
    wdesc = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                                  F.desc("event_id"))
    wall = Window.partitionBy("user_id")
    hist = changes.select(
        "user_id", "event_type", "ts",
        F.row_number().over(wdesc).alias("rn"),
        F.count("*").over(wall).alias("n_states"),
    )
    return hist.where(F.col("rn") == 1).select(
        "user_id",
        F.col("event_type").alias("current_state"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("state_since"),
        F.col("n_states").cast("long").alias("n_state_changes"),
    )


@register(
    "bitmap_exact_distinct_rollup",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY CAST(ts AS DATE)
    UNION ALL
    SELECT 'ALL' AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
    tags=("sketch", "agg", "scale", "bitmap"),
)
def bitmap_exact_distinct_rollup(spark, sf_dir):
    """EXACT mergeable distinct counts via Spark's bitmap aggregate
    family (``bitmap_construct_agg`` / ``bitmap_or_agg``): per-day
    distinct users, plus the full-period count computed by OR-merging
    the stored day bitmaps — never re-touching raw events.

    This is the exact counterpart of ``hll_union_daily``: when the key
    is a dense integer id, RoaringBitmap-style buckets give EXACT
    distinct counts that still merge associatively, so day bitmaps
    materialize once and any rollup period (week/month/all) is a
    cheap OR over kilobyte blobs.  The plan has one map-side-
    combinable groupBy on (day, bucket); the merge level runs on
    day×bucket bitmap rows, independent of event volume.  The oracle
    is plain COUNT(DISTINCT) at both grains — exactness IS the
    contract (no ±band needed).
    """
    ev = load_table(spark, sf_dir, "events")
    ev.select(F.col("ts").cast("date").alias("day"), "user_id") \
        .createOrReplaceTempView("ev_bm")
    return spark.sql("""
        WITH day_buckets AS (
          SELECT day, bitmap_bucket_number(user_id) AS bk,
                 bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          FROM ev_bm GROUP BY day, bitmap_bucket_number(user_id)
        ), per_day AS (
          SELECT date_format(day, 'yyyy-MM-dd') AS day,
                 SUM(bitmap_count(bm)) AS n_users
          FROM day_buckets GROUP BY day
        ), merged AS (
          SELECT bk, bitmap_or_agg(bm) AS bm FROM day_buckets GROUP BY bk
        ), total AS (
          -- COALESCE: on an empty corpus the global agg still emits one
          -- row and SUM is NULL, but COUNT(DISTINCT) in the oracle is 0
          SELECT 'ALL' AS day,
                 COALESCE(SUM(bitmap_count(bm)), 0) AS n_users FROM merged
        )
        SELECT day, CAST(n_users AS BIGINT) AS n_users FROM per_day
        UNION ALL
        SELECT day, CAST(n_users AS BIGINT) AS n_users FROM total
    """)


@register(
    "hll_intersection_estimate",
    oracle="""
    -- user_id IS NOT NULL (--nullkeys fuzz): an audience is a set of
    -- IDENTIFIED users — COUNT(*) over a DISTINCT including NULL would
    -- count the anonymous row, while Spark's COUNT(DISTINCT CASE ...)
    -- skips NULL
    WITH v AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view' AND user_id IS NOT NULL),
    p AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase' AND user_id IS NOT NULL),
    x AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both
          FROM v JOIN p USING (user_id))
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase,
           x.n_both,
           TRUE AS est_within_10pct
    FROM x
    """,
    tags=("sketch", "approx", "setop"),
)
def hll_intersection_estimate(spark, sf_dir):
    """Audience-overlap estimation from SKETCHES: HLL supports union
    natively but not intersection, so the standard move is
    inclusion-exclusion — est|A∩B| = est|A| + est|B| − est|A∪B|, all
    three from mergeable per-audience sketches.  The sketch row a
    platform stores per (segment, day) answers ANY pairwise overlap
    question without rescanning events — the reach/overlap dashboard
    pattern.

    Graded with the registry's sketch convention: exact audience
    sizes and exact intersection (one hash join of the two distinct
    user sets) plus a boolean asserting the inclusion-exclusion
    estimate lands within ±10 % of the exact overlap — computed
    in-query, so the driver hash-verifies it.  (Caveat the docstring
    owns: the error of a DIFFERENCE of estimates grows as the overlap
    shrinks relative to the union — inclusion-exclusion is for
    overlaps that matter, not needles.)
    """
    ev = load_table(spark, sf_dir, "events")
    ev.select("event_type", "user_id").createOrReplaceTempView("ev_hll")
    return spark.sql("""
        WITH sk AS (
          SELECT hll_sketch_agg(CASE WHEN event_type = 'view'
                                     THEN user_id END) AS sk_v,
                 hll_sketch_agg(CASE WHEN event_type = 'purchase'
                                     THEN user_id END) AS sk_p
          FROM ev_hll
        ), est AS (
          SELECT hll_sketch_estimate(sk_v) AS e_v,
                 hll_sketch_estimate(sk_p) AS e_p,
                 hll_sketch_estimate(hll_union(sk_v, sk_p)) AS e_u
          FROM sk
        ), exact AS (
          SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'view'
                                          THEN user_id END) AS BIGINT)
                   AS n_view,
                 CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                          THEN user_id END) AS BIGINT)
                   AS n_purchase
          FROM ev_hll
        ), both AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_both FROM (
            SELECT DISTINCT user_id FROM ev_hll WHERE event_type = 'view'
          ) v JOIN (
            SELECT DISTINCT user_id FROM ev_hll WHERE event_type = 'purchase'
          ) p USING (user_id)
        )
        SELECT exact.n_view, exact.n_purchase, both.n_both,
               ABS((est.e_v + est.e_p - est.e_u) - both.n_both)
                 <= 0.1 * both.n_both AS est_within_10pct
        FROM exact, both, est
    """)


@register(
    "wau_bitmap_rolling",
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
    tags=("sketch", "window", "distinct", "bitmap"),
)
def wau_bitmap_rolling(spark, sf_dir):
    """EXACT rolling 7-day active users from mergeable day bitmaps —
    the third point on the sliding-distinct design spectrum the
    registry now covers end to end:

    - ``rolling_7day_active_users``: exact, replicates (day, user)
      rows to window ends — rows scale with users × 7;
    - ``wau_hll_rolling``: approximate, merges kB HLL sketches;
    - this: EXACT *and* sketch-shaped — one bitmap per (day, bucket)
      materializes once from the only full-data pass, each window end
      ORs ≤ 7 day-bitmaps per bucket, and the count is exact because
      bitmaps don't approximate.  For dense integer keys this
      dominates both: HLL's error without HLL's bias, the exact
      form's answer without its row replication.

    The replication unit here is the (day, bucket) BITMAP row (≤ 7
    copies of a kilobyte blob), never per-user rows — at 100 TB the
    window aggregation input is days × buckets, independent of user
    activity volume.
    """
    ev = load_table(spark, sf_dir, "events")
    ev.select(F.col("ts").cast("date").alias("day"), "user_id") \
        .createOrReplaceTempView("ev_wbm")
    return spark.sql("""
        WITH day_buckets AS (
          SELECT day, bitmap_bucket_number(user_id) AS bk,
                 bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          FROM ev_wbm GROUP BY day, bitmap_bucket_number(user_id)
        ), spine AS (SELECT DISTINCT day FROM day_buckets),
        served AS (
          SELECT s.day AS window_end, b.bk, b.bm
          FROM day_buckets b
          JOIN spine s
            ON s.day BETWEEN b.day AND b.day + INTERVAL 6 DAYS
        ), merged AS (
          SELECT window_end, bk, bitmap_or_agg(bm) AS bm
          FROM served GROUP BY window_end, bk
        )
        SELECT date_format(window_end, 'yyyy-MM-dd') AS day,
               CAST(SUM(bitmap_count(bm)) AS BIGINT) AS wau
        FROM merged GROUP BY window_end
    """)


@register(
    "approx_top_k_event_types",
    oracle="""
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type
    """,
    tags=("sketch", "approx", "topk"),
)
def approx_top_k_event_types(spark, sf_dir):
    """Spark 4's ``approx_top_k`` (Misra-Gries-style bounded-state
    heavy hitters) over the event-type stream.  The aggregate tracks
    at most ``maxItemsTracked`` counters; when the true cardinality
    fits inside k AND the tracking budget (k=32 ≫ the fixture's type
    cardinality — the --dupkeys conflict mutator mints extra types,
    and ties at k's boundary would rank engine-arbitrarily) the
    counts are provably EXACT, so the plain GROUP BY is the oracle with no
    ±band — the same "exact in the graded regime, bounded-state at
    scale" contract as ``cms_heavy_hitters``, via the built-in
    aggregate instead of a hand-rolled sketch.  At 100 TB the value
    is the fixed-size state: one pass, kB of memory, mergeable across
    partitions — where an exact GROUP BY on a hot key domain is fine,
    but on an unbounded domain (user agents, URLs) the sketch is the
    only bounded answer.
    """
    ev = load_table(spark, sf_dir, "events")
    ev.select("event_type").createOrReplaceTempView("ev_atk")
    return spark.sql("""
        SELECT t.item AS item, CAST(t.count AS BIGINT) AS cnt
        FROM (SELECT explode(approx_top_k(event_type, 32)) AS t FROM ev_atk)
    """)


from .curation4_q import hex_hash_expr

_KMV_K = 64
_U12 = 16 ** 12  # 48-bit uniform-hash range for KMV


@register(
    "kmv_sketch_set_ops",
    oracle=f"""
    WITH hset AS (
      SELECT DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS s,
             {hex_hash_expr("o_custkey", 12)} AS h
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
    ), counts AS (
      SELECT s, COUNT(*) AS n FROM hset GROUP BY s
    ), cand AS (
      SELECT s, h FROM (
        SELECT s, h, ROW_NUMBER() OVER (PARTITION BY s, h % 64
                                        ORDER BY h) AS rn
        FROM hset) WHERE rn <= {_KMV_K}
    ), sk AS (
      SELECT s, h, ROW_NUMBER() OVER (PARTITION BY s ORDER BY h) AS rn
      FROM cand
    ), est AS (
      SELECT sk.s, counts.n,
             CASE WHEN counts.n > {_KMV_K}
                  THEN ROUND(({_KMV_K} - 1) * {_U12}.0 / (sk.h + 1), 6)
                  ELSE CAST(counts.n AS DOUBLE) END AS est
      FROM sk JOIN counts ON counts.s = sk.s
      WHERE sk.rn = LEAST({_KMV_K}, counts.n)
    ), uh AS (SELECT DISTINCT h FROM hset),
    ucand AS (
      SELECT h FROM (
        SELECT h, ROW_NUMBER() OVER (PARTITION BY h % 64 ORDER BY h) AS rn
        FROM uh) WHERE rn <= {_KMV_K}
    ), usk AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM ucand
    ), un AS (SELECT COUNT(*) AS n_u FROM uh),
    uest AS (
      SELECT un.n_u,
             CASE WHEN un.n_u > {_KMV_K}
                  THEN ROUND(({_KMV_K} - 1) * {_U12}.0 / (usk.h + 1), 6)
                  ELSE CAST(un.n_u AS DOUBLE) END AS est_u
      FROM usk CROSS JOIN un
      WHERE usk.rn = LEAST({_KMV_K}, un.n_u)
    ), flags AS (
      SELECT usk.h,
             MAX(CASE WHEN hset.s = 1995 THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN hset.s = 1996 THEN 1 ELSE 0 END) AS in_b
      FROM usk JOIN hset USING (h)
      WHERE usk.rn <= {_KMV_K}
      GROUP BY usk.h
    ), jac AS (
      SELECT ROUND(CAST(SUM(in_a * in_b) AS DOUBLE) / COUNT(*), 6) AS est_j
      FROM flags
    ), ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_i
      FROM (SELECT h FROM hset WHERE s = 1995) a
      JOIN (SELECT h FROM hset WHERE s = 1996) b USING (h)
    )
    SELECT ea.n AS exact_a, ea.est AS est_a,
           eb.n AS exact_b, eb.est AS est_b,
           uest.n_u AS exact_union, uest.est_u AS est_union,
           jac.est_j AS est_jaccard,
           ROUND(jac.est_j * uest.est_u, 6) AS est_intersection,
           ex.exact_i AS exact_intersection
    FROM (SELECT * FROM est WHERE s = 1995) ea
    CROSS JOIN (SELECT * FROM est WHERE s = 1996) eb
    CROSS JOIN uest CROSS JOIN jac CROSS JOIN ex
    """,
    tags=("sketch", "approx", "setop", "agg"),
)
def kmv_sketch_set_ops(spark, sf_dir):
    """KMV (k-minimum-values) distinct sketch with UNION, INTERSECTION
    and JACCARD estimates — the sketch family HLL cannot give you:
    HLL unions but never intersects; KMV's k smallest hashes support
    all three (Beyer et al., "On Synopses for Distinct-Value
    Estimation").  Sets: customers active in 1995 vs 1996, so the
    intersection estimate is year-over-year retention.  Estimator:
    DV ≈ (k−1)/u_k (u_k = k-th smallest hash as a unit uniform);
    Jaccard ≈ the fraction of the UNION sketch's k minima present in
    both sets; intersection ≈ J · DV_union.  Std error ~1/√k (12.5 %
    at k=64) — the output carries exact counts alongside.

    Scale: min-k per set is the salted two-phase top-k
    (``topk_per_group_salted``'s shape): phase 1 ranks within
    (set, h%64) groups — a distributed sort of 1/64th slices — and
    phase 2 ranks the ≤ 64·64 survivors.  Membership flags are an
    equi join of the 64-row union sketch against the hash sets.  A
    sketch is O(k) — merge/ship/store costs never grow with N.

    Determinism: the hash is md5-derived (``hex_hash_expr``, 12 hex
    chars — collision-free at fixture scale, 48-bit range), so every
    minimum, estimate and flag is a pure function of the data.
    """
    from pyspark.sql import Window as W

    K = _KMV_K
    o = load_table(spark, sf_dir, "orders")
    hset = (o.filter(F.year("o_orderdate").isin(1995, 1996))
            .select(F.year("o_orderdate").cast("long").alias("s"),
                    F.expr(hex_hash_expr("o_custkey", 12)).alias("h"))
            .distinct())

    def min_k(df, part_cols):
        # total-order: hset is distinct over (s, h), so h is unique within
        # every (s, salt-bucket) partition
        w1 = W.partitionBy(*part_cols, F.col("h") % 64).orderBy("h")
        cand = (df.withColumn("rn", F.row_number().over(w1))
                .filter(F.col("rn") <= K).drop("rn"))
        # bounded: the global arm only ever sees `cand`, already cut to
        # <= 64 salt buckets x K rows by the w1 row_number filter
        # total-order: h unique per s (distinct input, see w1)
        w2 = (W.partitionBy(*part_cols).orderBy("h") if part_cols
              else W.orderBy("h"))
        return (cand.withColumn("rn", F.row_number().over(w2))
                .filter(F.col("rn") <= K))

    counts = hset.groupBy("s").agg(F.count("*").alias("n"))
    sk = min_k(hset, ["s"])
    est = (sk.join(counts, "s")
           .filter(F.col("rn") == F.least(F.lit(K), F.col("n")))
           .select("s", "n",
                   F.when(F.col("n") > K,
                          F.round((K - 1) * float(_U12) / (F.col("h") + 1), 6))
                   .otherwise(F.col("n").cast("double")).alias("est")))

    uh = hset.select("h").distinct()
    un = uh.agg(F.count("*").alias("n_u"))
    usk = min_k(uh, [])
    uest = (usk.crossJoin(F.broadcast(un))  # bounded: 1-row count
            .filter(F.col("rn") == F.least(F.lit(K), F.col("n_u")))
            .select("n_u",
                    F.when(F.col("n_u") > K,
                           F.round((K - 1) * float(_U12) / (F.col("h") + 1), 6))
                    .otherwise(F.col("n_u").cast("double")).alias("est_u")))
    flags = (usk.filter(F.col("rn") <= K).select("h")
             .join(hset, "h")
             .groupBy("h")
             .agg(F.max(F.when(F.col("s") == 1995, 1).otherwise(0))
                  .alias("in_a"),
                  F.max(F.when(F.col("s") == 1996, 1).otherwise(0))
                  .alias("in_b")))
    jac = flags.agg(
        F.round(F.sum(F.col("in_a") * F.col("in_b")).cast("double")
                / F.count("*"), 6).alias("est_j"))
    ex = (hset.filter(F.col("s") == 1995).select("h")
          .join(hset.filter(F.col("s") == 1996).select("h"), "h")
          .agg(F.count("*").alias("exact_i")))

    ea = est.filter(F.col("s") == 1995).select(
        F.col("n").alias("exact_a"), F.col("est").alias("est_a"))
    eb = est.filter(F.col("s") == 1996).select(
        F.col("n").alias("exact_b"), F.col("est").alias("est_b"))
    # bounded: every side below is a 1-row aggregate/sketch scalar
    return (ea.crossJoin(F.broadcast(eb))
            .crossJoin(F.broadcast(
                uest.select(F.col("n_u").alias("exact_union"),
                            F.col("est_u").alias("est_union"))))
            .crossJoin(F.broadcast(jac))
            .crossJoin(F.broadcast(ex))
            .select("exact_a", "est_a", "exact_b", "est_b",
                    "exact_union", "est_union",
                    F.col("est_j").alias("est_jaccard"),
                    F.round(F.col("est_j") * F.col("est_union"), 6)
                     .alias("est_intersection"),
                    F.col("exact_i").cast("long").alias("exact_intersection")))


@register(
    "approx_quantile_error_by_group",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(c_acctbal, 0.5), 2) AS median_exact,
           TRUE AS approx_within_5pct
    FROM customer GROUP BY segment
    """,
    tags=("sketch", "approx", "agg", "stats"),
)
def approx_quantile_error_by_group(spark, sf_dir):
    """Quantile-sketch error audit — exact median per segment
    alongside a measured bound on ``approx_percentile``'s error (the
    mergeable GK-style sketch that replaces the exact sort at 100 TB:
    exact percentiles need a per-group sort of raw values; the sketch
    is O(accuracy) memory, map-side combinable, and shuffles only
    sketch summaries).  Graded the sketch way (``hll_union_daily``'s
    pattern): the oracle pins the exact value and asserts the
    flag TRUE; Spark computes the flag from its own sketch at
    accuracy=1000 as a RANK-band check (approx between the exact DISCRETE 45th
    and 55th percentile values — the GK guarantee is rank error <=
    n/accuracy, and a value-relative band is ill-defined near
    zero-crossing medians; the --nan fuzz sweep's tie-heavy draw
    proved it).

    Determinism: Spark's approx_percentile is a deterministic
    function of the value multiset at fixed accuracy (merge order
    cannot change the GK summary's rank guarantees past the round);
    the exact median uses the same interpolation parity as
    ``percentile_cont_by_group``.
    """
    cust = load_table(spark, sf_dir, "customer")
    # the flag asserts the sketch's ACTUAL guarantee — rank error —
    # not a relative-value band: |approx − exact| ≤ 5 %·|exact| is
    # meaningless when the median sits near a zero crossing (a
    # tie-heavy fuzz draw put the exact median at −5.25 between
    # actual values −10.5 and 0.0, and the flag flipped).  The GK
    # sketch guarantees the returned value's RANK is within n/accuracy
    # of the target, so the honest check is approx ∈ [p45, p55].
    return (cust.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("n"),
                 F.round(F.percentile("c_acctbal", F.lit(0.5)), 2)
                  .alias("median_exact"),
                 F.approx_percentile("c_acctbal", F.lit(0.5), F.lit(1000))
                 # DISCRETE band edges: the sketch returns an ACTUAL
                 # value, and interpolated p45/p55 can sit strictly
                 # between two actual values, excluding a rank-correct
                 # answer (the tie-heavy draw again)
                 .between(F.expr("percentile_disc(0.45) WITHIN GROUP "
                                 "(ORDER BY c_acctbal)"),
                          F.expr("percentile_disc(0.55) WITHIN GROUP "
                                 "(ORDER BY c_acctbal)"))
                 .alias("approx_within_5pct")))
