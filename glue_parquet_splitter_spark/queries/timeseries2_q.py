"""Time-series wave 2: smoothing and anomaly scoring, expressed as
closed-form window algebra so the recursive definitions stay JVM-side
(no iterative loop, no UDF) and the DuckDB oracle can replay them.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.events import unique_events
from . import register

ALPHA = 0.1  # EWMA smoothing factor


@register(
    "ewma_user_value",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), acc AS (
      SELECT user_id, rn,
             SUM(value * power(1 - {ALPHA}, -rn)) OVER w AS num,
             SUM(power(1 - {ALPHA}, -rn)) OVER w AS den
      FROM ordered
      WINDOW w AS (PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n_events,
           ROUND(MAX_BY(num / den, rn), 4) AS ewma_value
    FROM acc GROUP BY user_id
    """,
    tags=("timeseries", "window", "smoothing"),
    unique_events_guard=True,
)
def ewma_user_value(spark, sf_dir):
    """Exponentially-weighted moving average of each user's event
    values (α=0.1, pandas ``adjust=True`` form), reported at the last
    event.  The recursion ``s_n = αx_n + (1-α)s_{n-1}`` is rewritten as
    a ratio of two running sums with weights ``(1-α)^(-k)`` — one
    window pass, whole-stage codegen, no iterative driver loop.  The
    factor ``(1-α)^(-k)`` stays ≤ e^(0.105·n) and per-user event counts
    are bounded (~100 here); for unbounded keys use
    ``operators.timeseries.ewma`` — the block-rebased form with bounded
    exponents (property-tested at 10⁵ events/key against pandas).

    Scale: one shuffle on ``user_id``; the final per-user reduce reuses
    the same partitioning.
    """
    ev = unique_events(load_table(spark, sf_dir, "events"))
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
    ordered = ev.select("user_id", "value", rn.alias("rn"))
    # total-order: rn is the row number over the identity-deduped events
    # (unique_events upstream) — unique per user by construction
    w = (Window.partitionBy("user_id").orderBy("rn")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    decay = F.pow(F.lit(1 - ALPHA), -F.col("rn"))
    acc = ordered.select(
        "user_id", "rn",
        F.sum(F.col("value") * decay).over(w).alias("num"),
        F.sum(decay).over(w).alias("den"),
    )
    return acc.groupBy("user_id").agg(
        F.max("rn").cast("long").alias("n_events"),
        F.round(F.max_by(F.col("num") / F.col("den"), F.col("rn")), 4)
         .alias("ewma_value"),
    )


@register(
    "ewma_user_value_rebased",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), acc AS (
      SELECT user_id, rn,
             SUM(value * power(1 - {ALPHA}, -rn)) OVER w AS num,
             SUM(power(1 - {ALPHA}, -rn)) OVER w AS den
      FROM ordered
      WINDOW w AS (PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n_events,
           ROUND(MAX_BY(num / den, rn), 4) AS ewma_value
    FROM acc GROUP BY user_id
    """,
    tags=("timeseries", "window", "smoothing"),
    unique_events_guard=True,
)
def ewma_user_value_rebased(spark, sf_dir):
    """Same EWMA contract as ``ewma_user_value``, computed by the
    unbounded-history operator (``operators.timeseries.ewma``): block
    re-based exponents, finite at ANY per-key event count — the form a
    100 TB deployment must use, here hash-verified against the exact
    closed-form oracle on the bounded fixture (the two agree to double
    precision wherever the closed form doesn't overflow)."""
    from ..operators.timeseries import ewma

    ev = unique_events(load_table(spark, sf_dir, "events"))
    s = ewma(ev, ["user_id"], ["ts", "event_id"], "value", ALPHA)
    return s.groupBy("user_id").agg(
        F.max("rn").cast("long").alias("n_events"),
        F.round(F.max_by("ewma", "rn"), 4).alias("ewma_value"),
    )


@register(
    "zscore_daily_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, day, n,
             (n - AVG(n) OVER (PARTITION BY event_type))
               / stddev_samp(n) OVER (PARTITION BY event_type) AS z
      FROM daily
    )
    SELECT event_type, day, n, ROUND(z, 3) AS zscore
    FROM scored WHERE abs(z) > 1.5
    """,
    tags=("timeseries", "anomaly", "window"),
)
def zscore_daily_anomaly(spark, sf_dir):
    """Volume-anomaly detection: daily event counts per type, z-scored
    against that type's own mean/stddev; days beyond ±1.5σ surface.
    The monitoring query a pipeline runs over its own ingest counts.

    Scale: the daily pre-aggregation shrinks the input to
    (types × days) rows before the window — the stats pass never sees
    raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    # try_divide: a type whose daily counts are all equal has stddev 0
    # (the --dupkeys --dates draw minted one) — ANSI `/` throws, while
    # the oracle's DuckDB division by zero is NULL, which the
    # abs(z) > 1.5 filter then drops; NULL z matches that exactly
    # (a zero-variance series has no meaningful z-score anyway)
    scored = daily.select(
        "event_type", "day", "n",
        F.try_divide(F.col("n") - F.avg("n").over(w),
                     F.stddev_samp("n").over(w)).alias("z"),
    )
    return (scored.where(F.abs("z") > 1.5)
            .select("event_type", "day", "n", F.round("z", 3).alias("zscore")))


@register(
    "capped_running_balance",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type IN ('purchase', 'signup') THEN value
                  ELSE -value END AS delta
      FROM events
    ), s AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn,
             SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS ps
      FROM d
    )
    SELECT user_id,
           ROUND(MAX_BY(ps, rn) - LEAST(MIN(ps), 0), 2) AS final_balance,
           ROUND(MIN(ps), 2) AS lowest_prefix,
           MIN(ps) < 0 AS clamp_engaged
    FROM s GROUP BY user_id
    """,
    tags=("timeseries", "window", "algebra"),
    unique_events_guard=True,
)
def capped_running_balance(spark, sf_dir):
    """Floor-clamped running balance — b_t = max(0, b_{t-1} + delta_t)
    (credits from purchases/signups, debits from everything else) —
    WITHOUT the per-row recurrence: for a lower clamp at zero the
    closed form is  b_t = S_t − min(0, min_{j≤t} S_j)  over plain
    prefix sums S, because every clamp event simply resets the
    effective baseline to the running minimum.  Reported per user:
    final balance, the lowest unclamped prefix, and whether the clamp
    ever engaged.

    Scale: the naive formulation is a non-associative sequential scan
    (the ``applyInPandas``-per-key trap); the identity turns it into
    two stacked windows over ONE ``user_id`` shuffle — an associative
    scan any engine parallelizes.  Same family as the EWMA window
    algebra (``ewma_user_value_rebased``): find the closed form before
    reaching for per-key Python.  Float-deterministic across engines
    because EVERY float the output depends on — the prefix sums and
    the final total (= max_by(ps, rn), the last prefix in the same
    deterministic (ts, event_id) order) — is accumulated in one fixed
    order on both sides.  Re-summing delta in a plain agg would be
    partition-arrival-ordered and flips ROUND on half-cent boundaries
    (the r6 driver caught exactly that).
    """
    ev = unique_events(load_table(spark, sf_dir, "events"))
    delta = F.when(F.col("event_type").isin("purchase", "signup"),
                   F.col("value")).otherwise(-F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.sum(delta).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("ps"),
    )
    # the FINAL prefix (total) is the ps at the max rn — a
    # deterministically-ordered value, unlike a re-summed SUM(delta)
    return s.groupBy("user_id").agg(
        F.round(F.max_by("ps", "rn") - F.least(F.min("ps"), F.lit(0.0)), 2)
        .alias("final_balance"),
        F.round(F.min("ps"), 2).alias("lowest_prefix"),
        (F.min("ps") < 0).alias("clamp_engaged"),
    )


@register(
    "seasonal_dow_decomposition",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(strftime(CAST(ts AS DATE), '%w') AS BIGINT) AS dow,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE value IS NULL OR isfinite(value)
      GROUP BY 1, 2
    ), base AS (
      SELECT dow, SUM(cents) AS sum_cents,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY dow
    ), bl AS (
      SELECT dow,
             CAST(CASE WHEN sum_cents < 0
                  THEN -((n_days - 2 * sum_cents) // (2 * n_days))
                  ELSE (2 * sum_cents + n_days) // (2 * n_days)
                  END AS BIGINT) AS base_cents
      FROM base
    )
    SELECT strftime(daily.day, '%Y-%m-%d') AS day,
           CAST(daily.dow AS BIGINT) AS dow,
           daily.cents / 100.0 AS total,
           bl.base_cents / 100.0 AS dow_baseline,
           (daily.cents - bl.base_cents) / 100.0 AS residual,
           2 * ABS(daily.cents - bl.base_cents) > bl.base_cents AS anomalous
    FROM daily JOIN bl ON bl.dow = daily.dow
    """,
    tags=("timeseries", "seasonality", "monitoring"),
)
def seasonal_dow_decomposition(spark, sf_dir):
    """Day-of-week seasonal decomposition — the additive-seasonality
    baseline behind every ops dashboard: daily totals split into a
    per-weekday mean (the seasonal component) and a residual, with
    days whose residual exceeds 50 % of their weekday baseline flagged
    anomalous.  Weekday ids are normalized to 0=Sunday on both
    engines (Spark's dayofweek is 1-based-Sunday, DuckDB's %w is
    0-based).  All money math runs in INTEGER CENTS
    (floor(value*100 + 0.5) per row — floor+0.5, not round, because
    the engines' half-tie rules differ): integer sums are
    order-independent, the weekday baseline is a sign-safe
    HALF-AWAY-FROM-ZERO INTEGER division (±((2*|sum| + n) div (2n)),
    non-negative operands so Spark div == DuckDB //), and the residual is an integer
    difference — the final /100.0 conversions are the only float ops
    and they never round, so no accumulation order OR ROUND
    tie-handling difference can flip a boundary on either engine —
    the capped_running_balance lesson applied at design time.  Comparing Monday to the Monday-mean
    instead of the
    global mean is what stops weekly rhythm from drowning real
    anomalies (the z-score variant ``volume_zscore_anomalies`` ignores
    seasonality; this is its seasonal sibling.)

    Scale: the full-data pass is one map-side-combinable groupBy to
    day-granular cells; the weekday baseline is a 7-row aggregate OF
    those cells, joined back as a broadcast — raw events shuffle once,
    the seasonality join never touches them.
    """
    ev = load_table(spark, sf_dir, "events")
    # finite-measure contract (FUZZ.md --nan sweep): non-finite values
    # are un-binnable and engine-divergent; NULLs keep their usual
    # semantics
    ev = ev.filter(F.col("value").isNull()
                   | (~F.isnan("value")
                      & (F.abs("value") != F.lit(float("inf")))))
    cents_row = F.floor(F.col("value") * 100 + 0.5).cast("long")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        (F.dayofweek(F.col("ts").cast("date")) - 1).cast("long").alias("dow"),
    ).agg(F.sum(cents_row).alias("cents"))
    base = daily.groupBy("dow").agg(
        F.sum("cents").alias("sum_cents"),
        F.count(F.lit(1)).alias("n_days"))
    # half-AWAY-FROM-ZERO integer division on |sum|: round(sum/n) =
    # sign(sum) * ((2*|sum| + n) div (2*n)).  Baseline and residual
    # stay in integer cents until the final /100, so there is NO double
    # rounding anywhere a boundary could flip.  The abs keeps every
    # division operand non-negative, where Spark's truncating ``div``
    # and DuckDB's flooring ``//`` agree — a negative weekday sum
    # (possible with refund-style values) would otherwise diverge both
    # in the division semantics and in the half-up formula itself.
    base_cents = F.expr(
        "CASE WHEN sum_cents < 0"
        " THEN -((n_days - 2 * sum_cents) div (2 * n_days))"
        " ELSE (2 * sum_cents + n_days) div (2 * n_days) END")
    return (
        # bounded: base is the 7-row day-of-week baseline
        daily.join(F.broadcast(base), "dow")
        .withColumn("base_cents", base_cents)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dow").cast("long").alias("dow"),
            (F.col("cents") / 100.0).alias("total"),
            (F.col("base_cents") / 100.0).alias("dow_baseline"),
            ((F.col("cents") - F.col("base_cents")) / 100.0).alias("residual"),
            (2 * F.abs(F.col("cents") - F.col("base_cents"))
             > F.col("base_cents")).alias("anomalous"),
        )
    )
