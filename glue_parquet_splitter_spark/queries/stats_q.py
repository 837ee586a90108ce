"""Distribution-statistics monitoring: exact two-sample KS drift test,
robust (median/MAD) outlier detection, and last-touch marketing
attribution.

Complements ``quality_q``'s PSI gate: PSI is the bucketed drift score a
pipeline thresholds cheaply; the KS statistic here is the exact
distribution-free test run when a PSI alarm needs confirmation.  The
MAD family is the robust counterpart of ``zscore_daily_anomaly`` —
mean/stddev move with the outliers they are supposed to find; the
median/MAD center does not.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "ks_drift_test",
    oracle="""
    WITH pts AS (
      SELECT event_type, round(value, 1) AS v,
             CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END AS ref
      FROM events
      WHERE value IS NOT NULL
    ), cnt AS (
      SELECT event_type, v,
             SUM(ref) AS na, SUM(1 - ref) AS nb
      FROM pts GROUP BY event_type, v
    ), cum AS (
      SELECT event_type,
             SUM(na) OVER (PARTITION BY event_type ORDER BY v) AS ca,
             SUM(nb) OVER (PARTITION BY event_type ORDER BY v) AS cb,
             SUM(na) OVER (PARTITION BY event_type) AS ta,
             SUM(nb) OVER (PARTITION BY event_type) AS tb
      FROM cnt
    )
    SELECT event_type,
           CAST(MAX(ta) AS BIGINT) AS n_ref,
           CAST(MAX(tb) AS BIGINT) AS n_cur,
           ROUND(MAX(ABS(ca / ta - cb / tb)), 4) AS ks_stat,
           ROUND(MAX(ABS(ca / ta - cb / tb)), 4) >
             ROUND(1.358 * SQRT((MAX(ta) + MAX(tb)) /
                                (MAX(ta) * MAX(tb))), 4) AS drift
    FROM cum GROUP BY event_type
    """,
    tags=("quality", "drift", "stats", "window"),
)
def ks_drift_test(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov statistic of ``value``,
    reference week (before 2024-01-08) vs the rest, per event type —
    the distribution-free confirmation test a pipeline runs when the
    cheap bucketed gate (``psi_feature_drift``) raises an alarm.
    ``drift`` applies the large-sample alpha=0.05 critical value
    1.358*sqrt((n+m)/(n*m)); both sides of the comparison are rounded
    so the boolean hashes deterministically across engines.

    With ties, D = max over distinct values v of |F_a(v) - F_b(v)|
    evaluated at the pooled support — exactly what the cumulative-sum
    form computes.

    Scale: the full-data pass is one map-side-combinable groupBy on
    (type, quantized value); values are quantized to 0.1 so the
    per-type support is bounded by the value domain (~5k points), not
    by event volume, and the per-type ordered window runs on that
    bounded support.  Same shape as ``quality_decile_mix_histogram``:
    granularity reduction first, exact order statistics on the reduced
    relation.
    """
    ev = load_table(spark, sf_dir, "events")
    # a value distribution has no NULL support point; and NULL v would
    # land at opposite ends of the two engines' cumulative windows
    # (fuzz_oracle.py)
    pts = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round("value", 1).alias("v"),
        F.when(F.col("ts") < F.lit("2024-01-08").cast("timestamp"), 1)
        .otherwise(0).alias("ref"),
    )
    cnt = pts.groupBy("event_type", "v").agg(
        F.sum("ref").alias("na"),
        F.sum(1 - F.col("ref")).alias("nb"),
    )
    w_ord = Window.partitionBy("event_type").orderBy("v")
    w_all = Window.partitionBy("event_type")
    cum = cnt.select(
        "event_type",
        F.sum("na").over(w_ord).alias("ca"),
        F.sum("nb").over(w_ord).alias("cb"),
        F.sum("na").over(w_all).alias("ta"),
        F.sum("nb").over(w_all).alias("tb"),
    )
    # try_divide: an empty reference or current sample leaves the KS
    # statistic NULL (DuckDB's /0 -> NULL does the same; ANSI division
    # would kill the query — fuzz_oracle.py)
    diff = F.abs(F.try_divide(F.col("ca"), F.col("ta"))
                 - F.try_divide(F.col("cb"), F.col("tb")))
    ks = F.round(F.max(diff), 4)
    crit = F.round(
        1.358 * F.sqrt(F.try_divide(F.max("ta") + F.max("tb"),
                                    F.max("ta") * F.max("tb"))), 4)
    return cum.groupBy("event_type").agg(
        F.max("ta").cast("long").alias("n_ref"),
        F.max("tb").cast("long").alias("n_cur"),
        ks.alias("ks_stat"),
        (ks > crit).alias("drift"),
    )


@register(
    "mad_robust_outliers",
    oracle="""
    WITH fin AS (
      SELECT * FROM events WHERE value IS NULL OR isfinite(value)
    ), med AS (
      SELECT event_type, median(value) AS med FROM fin GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS ad
      FROM fin e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(MAX(d.med), 4) AS med,
           ROUND(MAX(m.mad), 4) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ABS(d.value - d.med) > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    tags=("quality", "stats", "agg"),
)
def mad_robust_outliers(spark, sf_dir):
    """Robust outlier counts per event type: |value - median| >
    3 * 1.4826 * MAD (the consistency constant that makes MAD estimate
    sigma under normality).  The robust counterpart of
    ``zscore_daily_anomaly`` — mean/stddev are dragged by the very
    outliers they score, the median/MAD center is not.

    Scale: exact medians need rank information, so this is the
    multi-pass exact form — three parallel scans (median, MAD, count),
    each a map-side-combinable per-type aggregate, with the 5-row
    median/MAD relations broadcast back.  No per-type window over raw
    rows, so no single-partition bottleneck at any volume.  When one
    pass matters more than exactness, swap ``median`` for
    ``approx_percentile`` (see ``approx_percentile_stats``) — the plan
    collapses to one scan.
    """
    ev = load_table(spark, sf_dir, "events")
    # finite-measure contract (see woe_information_value / FUZZ.md)
    ev = ev.filter(F.col("value").isNull()
                   | (~F.isnan("value")
                      & (F.abs("value") != F.lit(float("inf")))))
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    # bounded: med/mad are one row per event_type (bounded enum)
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("event_type").agg(F.median("ad").alias("mad"))
    # bounded: one row per event_type (bounded enum)
    joined = dev.join(F.broadcast(mad), "event_type")
    outlier = F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
    return joined.groupBy("event_type").agg(
        F.round(F.max("med"), 4).alias("med"),
        F.round(F.max("mad"), 4).alias("mad"),
        F.count("*").alias("n_events"),
        F.sum(F.when(outlier, 1).otherwise(0)).cast("long")
        .alias("n_outliers"),
    )


@register(
    "attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type IN ('view','click','signup')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id,
                                                   event_type NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(value), 2) AS revenue
    FROM seq WHERE event_type = 'purchase'
    GROUP BY COALESCE(channel, 'direct')
    """,
    tags=("analytics", "window", "attribution"),
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch revenue attribution: each purchase credits its full
    value to the most recent preceding touch event (view/click/signup)
    of the same user; purchases with no prior touch fall to 'direct'.
    The workhorse marketing query every event warehouse runs.

    The strictly-preceding frame (UNBOUNDED PRECEDING .. 1 PRECEDING,
    ordered by (ts, event_id, event_type) — event_type appended in r15
    because duplicate event_ids make (ts, event_id) alone non-total)
    means a touch sharing the purchase's timestamp attributes only if
    its sort key is earlier — deterministic on both engines.

    Scale: one shuffle on user_id for the per-user ordered window (the
    same partitioning ``sessionize_events`` uses), then a 4-row final
    aggregate.  Per-user event counts are human-bounded, so no skew
    mitigation is needed on this key.
    """
    ev = load_table(spark, sf_dir, "events")
    touch = F.when(
        F.col("event_type").isin("view", "click", "signup"),
        F.col("event_type"))
    # total-order: the pick carries a value derived from event_type,
    # so the order key ends with it — a duplicate event_id with a
    # mutated event_type (--dupkeys) is otherwise tied on
    # (ts, event_id) and the attributed channel rolls dice (r15
    # window-totality lint).  Residual ties are equal in event_type
    # (the only column the pick reads); revenue aggregates the value
    # multiset order-free.  No-op on identity-clean data.
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "event_id", F.asc_nulls_last("event_type"))
         .rowsBetween(Window.unboundedPreceding, -1))
    seq = ev.select(
        "user_id", "event_type", "value",
        F.last(touch, ignorenulls=True).over(w).alias("channel"),
    )
    return (
        seq.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(F.count("*").alias("n_purchases"),
             F.round(F.sum("value"), 2).alias("revenue"))
    )


@register(
    "woe_information_value",
    oracle="""
    WITH base AS (
      SELECT LEAST(CAST(FLOOR(value / 10) AS BIGINT), 9) AS bin,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS bad
      FROM events WHERE value IS NULL OR isfinite(value)
    ), tot AS (
      SELECT SUM(1 - bad) AS g_tot, SUM(bad) AS b_tot FROM base
    ), bins AS (
      SELECT bin, COUNT(*) AS n, SUM(bad) AS n_bad,
             SUM(1 - bad) AS n_good
      FROM base GROUP BY bin
    )
    SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_bad AS BIGINT) AS n_bad,
           ROUND(ln(((n_good + 0.5) / (g_tot + 5.0))
                    / ((n_bad + 0.5) / (b_tot + 5.0))), 6) AS woe,
           ROUND(((n_good + 0.5) / (g_tot + 5.0)
                  - (n_bad + 0.5) / (b_tot + 5.0))
                 * ln(((n_good + 0.5) / (g_tot + 5.0))
                      / ((n_bad + 0.5) / (b_tot + 5.0))), 6) AS iv_term
    FROM bins CROSS JOIN tot
    """,
    tags=("stats", "monitoring", "agg"),
)
def woe_information_value(spark, sf_dir):
    """Weight-of-evidence / information-value feature screening — the
    credit-scoring-standard univariate scan run before any feature
    enters a model: bin the feature, and per bin WOE =
    ln(share_of_goods / share_of_bads); IV = Σ (pg − pb)·WOE
    (IV < 0.02 useless, > 0.5 suspiciously strong).  Label here:
    event_type = 'error'; feature: the event value, 10 fixed-width
    bins capped at the top.  Laplace 0.5 smoothing keeps empty-side
    bins finite (the +5.0 in the denominators is 10 bins x 0.5).

    Scale: one scan, map-side bin assignment, a 10-group
    partial-aggregable groupBy, and a 2-scalar total cross-joined
    back — the cheapest possible shape.  Binning strategy is
    orthogonal: at 100 TB swap fixed bins for approx_percentile
    edges (a mergeable sketch) with the identical WOE/IV math.

    Determinism: integer counts; smoothed ratios are exact dyadic
    fractions of integers; one ln per output, ROUND(.,6) after —
    identical association order in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    # finite-measure contract: IEEE specials (NaN/±Inf) are
    # un-binnable/un-fittable and their ordering/cast semantics are
    # engine-divergent — dropped on BOTH sides, NULLs kept (they carry
    # their usual aggregate-skip/own-group semantics).  Found by the
    # --nan fuzz sweep (FUZZ.md).
    e = e.filter(F.col("value").isNull()
                 | (~F.isnan("value")
                    & (F.abs("value") != F.lit(float("inf")))))
    base = e.select(
        F.least(F.floor(F.col("value") / 10).cast("long"),
                F.lit(9).cast("long")).alias("bin"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("bad"))
    tot = base.agg(F.sum(1 - F.col("bad")).alias("g_tot"),
                   F.sum("bad").alias("b_tot"))
    bins = base.groupBy("bin").agg(
        F.count("*").alias("n"), F.sum("bad").alias("n_bad"),
        F.sum(1 - F.col("bad")).alias("n_good"))
    pg = (F.col("n_good") + 0.5) / (F.col("g_tot") + 5.0)
    pb = (F.col("n_bad") + 0.5) / (F.col("b_tot") + 5.0)
    return (bins.crossJoin(F.broadcast(tot))  # bounded: 1-row totals
            .select("bin", F.col("n").cast("long").alias("n"),
                    F.col("n_bad").cast("long").alias("n_bad"),
                    F.round(F.log(pg / pb), 6).alias("woe"),
                    F.round((pg - pb) * F.log(pg / pb), 6).alias("iv_term")))


@register(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT event_type, day, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS run,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS t,
             AVG(n) OVER (PARTITION BY event_type) AS mu,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days
      FROM daily
    ), cs AS (
      SELECT event_type, day, n_days, mu,
             ROUND(run - t * mu, 6) AS cusum
      FROM seq
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS change_day,
           ROUND(ABS(cusum), 6) AS max_abs_cusum,
           ROUND(mu, 6) AS mean_daily,
           CAST(n_days AS BIGINT) AS n_days
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY ABS(cusum) DESC, day) AS rn
          FROM cs)
    WHERE rn = 1
    """,
    tags=("stats", "monitoring", "timeseries", "window"),
)
def cusum_changepoint(spark, sf_dir):
    """CUSUM change-point localization per event type — the classic
    Page statistic: the running sum of deviations from the series
    mean, whose |maximum| marks the most likely level-shift point (a
    drifting metric accumulates one-sided deviations; a stable one
    oscillates around zero).  The monitoring rung between a PSI/KS
    ALARM ("the distribution moved") and diagnosis ("it moved HERE"):
    run this on the alarmed metric to get the date to bisect deploys
    against.

    Scale: the corpus reduces to (type, day) granularity map-side
    (the one real shuffle); every window — running sum, mean, argmax
    — runs over day-granular rows partitioned by type, so partition
    sizes are calendar-bounded regardless of event volume.  CUSUM is
    computed as S_t − t·μ (one integer running sum, one multiply)
    rather than accumulating float deviations.

    Determinism: integer daily counts and running sums; μ is one
    division; the argmax orders by ROUND(|cusum|, 6) with
    earliest-day tiebreak.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count("*").alias("n")))
    wt = W.partitionBy("event_type")
    # total-order: day is unique per event_type — daily is the
    # groupBy(event_type, day) output
    wrun = wt.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    seq = daily.select(
        "event_type", "day", "n",
        F.sum("n").over(wrun).alias("run"),
        # total-order: day unique per event_type (groupBy output, see wrun)
        F.row_number().over(wt.orderBy("day")).alias("t"),
        F.avg("n").over(wt).alias("mu"),
        F.count("*").over(wt).alias("n_days"))
    cs = seq.select(
        "event_type", "day", "n_days", "mu",
        F.round(F.col("run") - F.col("t") * F.col("mu"), 6).alias("cusum"))
    # total-order: day is unique per event_type (daily groupBy output),
    # so the argmax tiebreak is total
    warg = wt.orderBy(F.desc(F.abs(F.col("cusum"))), "day")
    return (cs.withColumn("rn", F.row_number().over(warg))
            .filter(F.col("rn") == 1)
            .select("event_type",
                    F.date_format("day", "yyyy-MM-dd").alias("change_day"),
                    F.round(F.abs(F.col("cusum")), 6).alias("max_abs_cusum"),
                    F.round("mu", 6).alias("mean_daily"),
                    F.col("n_days").cast("long").alias("n_days")))


@register(
    "winsorized_robust_stats",
    oracle="""
    WITH bounds AS (
      -- bounds quantized to cents BEFORE the clamp: the raw
      -- interpolated percentile differs between engines in the last
      -- ulp, which flipped a 2-decimal ROUND of the clamped mean on a
      -- half boundary (--dupkeys fuzz draw)
      SELECT c_mktsegment AS segment,
             ROUND(quantile_cont(c_acctbal, 0.05), 2) AS p05,
             ROUND(quantile_cont(c_acctbal, 0.95), 2) AS p95
      FROM customer GROUP BY c_mktsegment
    ), cl AS (
      SELECT c.c_mktsegment AS segment, b.p05, b.p95,
             CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_c,
             CAST(ROUND(LEAST(GREATEST(c.c_acctbal, b.p05), b.p95)
                        * 100) AS BIGINT) AS win_c
      FROM customer c JOIN bounds b ON b.segment = c.c_mktsegment
    ), ag AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(bal_c) * 2 + COUNT(*) AS yr,
             SUM(win_c) * 2 + COUNT(*) AS yw,
             2 * COUNT(*) AS d,
             MIN(p05) AS p05, MIN(p95) AS p95
      FROM cl GROUP BY segment
    )
    -- integer-cents half-up mean, floor-division made sign-symmetric
    -- by exact-multiple arithmetic (the q5_region_revenue pattern)
    SELECT segment, n,
           ((yr - ((yr % d) + d) % d) // d) / 100.0 AS mean_raw,
           ((yw - ((yw % d) + d) % d) // d) / 100.0 AS mean_winsorized,
           p05, p95
    FROM ag
    """,
    tags=("stats", "agg", "monitoring"),
)
def winsorized_robust_stats(spark, sf_dir):
    """Winsorized mean per group — the robust-aggregation rung between
    the raw mean (one whale account moves it arbitrarily) and the
    median (throws away all magnitude information): clamp each value
    into its GROUP's [p5, p95] band, then average.  The gap
    ``mean_raw − mean_winsorized`` is itself the tail-influence
    diagnostic: a large gap says the metric everyone dashboards is
    driven by outliers.

    Scale: group bounds are one percentile aggregation to group
    granularity; the clamp rides the second scan map-side after a
    group-keyed join of the bounds (both sides group-granular /
    co-partitioned); at 100 TB the exact percentiles swap for
    ``approx_percentile`` sketch bounds
    (``approx_quantile_error_by_group`` measures exactly that
    substitution's error).

    Determinism: the clamp bounds are quantized to CENTS before use —
    raw interpolated percentiles differ between engines in the last
    ulp, which flipped a 2-decimal ROUND of the clamped mean sitting
    on a half boundary (--dupkeys fuzz draw); the means are exact
    integer-cents half-up divisions (floor made sign-symmetric by
    exact-multiple arithmetic, the ``q5_region_revenue`` pattern), so
    no float accumulation ever reaches a ROUND.
    """
    cust = load_table(spark, sf_dir, "customer")
    bounds = (cust.groupBy(F.col("c_mktsegment").alias("segment"))
              .agg(F.round(F.percentile("c_acctbal", F.lit(0.05)), 2)
                   .alias("p05"),
                   F.round(F.percentile("c_acctbal", F.lit(0.95)), 2)
                   .alias("p95")))
    clamped = F.least(F.greatest(F.col("c_acctbal"), F.col("p05")),
                      F.col("p95"))
    ag = (cust.join(bounds, cust["c_mktsegment"] == bounds["segment"])
          .select("segment", "p05", "p95",
                  F.round(F.col("c_acctbal") * 100).cast("long")
                  .alias("bal_c"),
                  F.round(clamped * 100).cast("long").alias("win_c"))
          .groupBy("segment")
          .agg(F.count("*").alias("n"),
               (F.sum("bal_c") * 2 + F.count("*")).alias("yr"),
               (F.sum("win_c") * 2 + F.count("*")).alias("yw"),
               (F.count("*") * 2).alias("d"),
               F.min("p05").alias("p05"), F.min("p95").alias("p95")))
    half_up = lambda y: F.expr(  # noqa: E731 — shared floor form
        f"(({y} - (({y} % d) + d) % d) div d) / CAST(100.0 AS DOUBLE)")
    return ag.select("segment", "n",
                     half_up("yr").alias("mean_raw"),
                     half_up("yw").alias("mean_winsorized"),
                     "p05", "p95")
