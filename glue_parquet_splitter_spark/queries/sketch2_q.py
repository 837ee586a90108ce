"""Sketch wave 2: count-min-sketch heavy hitters (the bounded-memory
frequency estimator a 100 TB stream can actually afford) plus the SCD2
current-state snapshot that completes the warehouse interval family.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
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
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    ), hist AS (
      SELECT user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_states
    FROM changes
    )
    SELECT user_id, event_type AS current_state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS state_since,
           CAST(n_states AS BIGINT) AS n_state_changes
    FROM hist WHERE rn = 1
    """,
    tags=("warehouse", "scd2", "window"),
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
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull()
               | (F.col("event_type") != F.col("prev_type")))
    )
    wdesc = Window.partitionBy("user_id").orderBy(F.desc("ts"))
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
