"""Scalar/aggregate function library wave 3: linear-regression
aggregates, explicit-moment distribution shape, bit aggregates,
discrete percentiles, width_bucket histograms, and deterministic mode.

Cross-engine contract notes (each bit the oracle had to own):
DuckDB's ``skewness``/``kurtosis`` are SAMPLE-corrected while Spark's
are population moments — the oracle computes the population formulas
from raw moments; ``quantile_disc`` index selection differs from
Spark's ``percentile_disc`` — the oracle derives the SQL-standard
"smallest value with cume_dist ≥ p" directly; ``mode`` tie-breaking is
engine-arbitrary — Spark's two-arg deterministic form and an explicit
rank-then-pick oracle pin the same answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "linear_regression_aggs",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, hour(ts)) AS BIGINT) AS n,
           ROUND(regr_slope(value, hour(ts)), 4) AS slope,
           ROUND(regr_intercept(value, hour(ts)), 4) AS intercept,
           ROUND(regr_r2(value, hour(ts)), 6) AS r2
    FROM events WHERE value IS NULL OR isfinite(value)
    GROUP BY event_type
    """,
    tags=("functions", "stats", "agg"),
)
def linear_regression_aggs(spark, sf_dir):
    """The SQL-standard bivariate regression aggregates
    (``regr_slope/intercept/r2/count``): value regressed on
    hour-of-day per event type — the one-pass OLS every OLAP engine
    ships so a trend fit never needs an ML library round-trip.
    Map-side-combinable (sums of x, y, xy, x², y²), one exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    # finite-measure contract: IEEE specials (NaN/±Inf) are
    # un-binnable/un-fittable and their ordering/cast semantics are
    # engine-divergent — dropped on BOTH sides, NULLs kept (they carry
    # their usual aggregate-skip/own-group semantics).  Found by the
    # --nan fuzz sweep (FUZZ.md).
    ev = ev.filter(F.col("value").isNull()
                   | (~F.isnan("value")
                      & (F.abs("value")
                         != F.lit(float("inf")))))
    x = F.hour("ts")
    return ev.groupBy("event_type").agg(
        F.regr_count("value", x).cast("long").alias("n"),
        F.round(F.regr_slope("value", x), 4).alias("slope"),
        F.round(F.regr_intercept("value", x), 4).alias("intercept"),
        F.round(F.regr_r2("value", x), 6).alias("r2"),
    )


@register(
    "distribution_shape_stats",
    oracle="""
    WITH m AS (
      SELECT event_type, AVG(value) AS mu FROM events GROUP BY event_type
    ), mom AS (
      SELECT e.event_type,
             AVG(POW(e.value - m.mu, 2)) AS m2,
             AVG(POW(e.value - m.mu, 3)) AS m3,
             AVG(POW(e.value - m.mu, 4)) AS m4
      -- null-safe join (--nullkeys fuzz): groupBy keeps the NULL
      -- event_type group in both engines, so the decomposed-moments
      -- join must not lose it to NULL <> NULL
      FROM events e JOIN m
        ON e.event_type IS NOT DISTINCT FROM m.event_type
      GROUP BY e.event_type
    )
    SELECT event_type,
           ROUND(m3 / POW(m2, 1.5), 4) AS skew,
           ROUND(m4 / (m2 * m2) - 3, 4) AS kurt
    FROM mom
    """,
    tags=("functions", "stats", "agg"),
)
def distribution_shape_stats(spark, sf_dir):
    """Population skewness and excess kurtosis of ``value`` per event
    type — the shape statistics a drift monitor records next to
    mean/stddev (``agg_stats``) because two distributions can share
    both and still differ.  Spark's ``skewness``/``kurtosis`` ARE the
    population moment formulas; DuckDB's carry sample-bias correction,
    so the oracle computes raw moments explicitly — the cross-engine
    contract is the formula, not the function name.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.skewness("value"), 4).alias("skew"),
        F.round(F.kurtosis("value"), 4).alias("kurt"),
    )


@register(
    "bit_aggregates",
    oracle="""
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS band,
           CAST(bit_or(user_id) AS BIGINT)  AS bor,
           CAST(bit_xor(user_id) AS BIGINT) AS bxor
    FROM events GROUP BY event_type
    """,
    tags=("functions", "agg"),
)
def bit_aggregates(spark, sf_dir):
    """``bit_and`` / ``bit_or`` / ``bit_xor`` aggregates — the
    flag-mask rollups (capability intersection, permission union,
    parity check) that are integer-exact and fully map-side
    combinable on both engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
    )


@register(
    "percentile_disc_stats",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
      FROM events
      WHERE value IS NOT NULL
    )
    SELECT event_type,
           ROUND(MIN(CASE WHEN cd >= 0.5 THEN value END), 2) AS p50_disc,
           ROUND(MIN(CASE WHEN cd >= 0.9 THEN value END), 2) AS p90_disc
    FROM ranked GROUP BY event_type
    """,
    tags=("functions", "stats", "agg"),
)
def percentile_disc_stats(spark, sf_dir):
    """DISCRETE percentiles (``percentile_disc``): the smallest actual
    data value whose cumulative distribution reaches p — the variant a
    latency SLO wants (a real observed value, never an interpolated
    one that no request experienced; contrast ``percentile_stats``).
    DuckDB's ``quantile_disc`` picks its index differently at
    boundaries, so the oracle encodes the SQL-standard definition
    itself via ``cume_dist``.
    """
    ev = load_table(spark, sf_dir, "events")
    # drop NULL values BEFORE grouping (not just in the aggregate): a
    # group whose values are ALL NULL must vanish in both engines —
    # the oracle's ranked CTE already filters (fuzz seed-3)
    ev = ev.filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"),
                2).alias("p50_disc"),
        F.round(F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)"),
                2).alias("p90_disc"),
    )


@register(
    "width_bucket_histogram",
    oracle="""
    SELECT event_type,
           CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 500 THEN 11
                     ELSE FLOOR(value / 50) + 1 END AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE value IS NULL OR isfinite(value)
    GROUP BY event_type, bucket
    """,
    tags=("functions", "agg", "histogram"),
)
def width_bucket_histogram(spark, sf_dir):
    """``width_bucket(value, 0, 500, 10)`` equi-width histogram per
    event type, with the standard under/overflow buckets 0 and n+1 —
    the SQL-native binning primitive (the ``psi_feature_drift`` family
    hand-rolls the same arithmetic; this is the built-in).  The oracle
    spells out width_bucket's contract in arithmetic, making the
    engine-independent definition explicit.
    """
    ev = load_table(spark, sf_dir, "events")
    # finite-measure contract: IEEE specials (NaN/±Inf) are
    # un-binnable/un-fittable and their ordering/cast semantics are
    # engine-divergent — dropped on BOTH sides, NULLs kept (they carry
    # their usual aggregate-skip/own-group semantics).  Found by the
    # --nan fuzz sweep (FUZZ.md).
    ev = ev.filter(F.col("value").isNull()
                   | (~F.isnan("value")
                      & (F.abs("value")
                         != F.lit(float("inf")))))
    return (
        ev.groupBy(
            "event_type",
            F.width_bucket("value", F.lit(0), F.lit(500), F.lit(10))
            .cast("long").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "deterministic_mode_agg",
    oracle="""
    WITH c AS (
      -- user_id IS NOT NULL (--nullkeys fuzz): Spark's mode() skips
      -- NULL values, so NULL must not be a mode candidate here either
      SELECT event_type, user_id, COUNT(*) AS cnt
      FROM events WHERE user_id IS NOT NULL
      GROUP BY event_type, user_id
    ), r AS (
      SELECT event_type, user_id, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, user_id) AS rn
      FROM c
    )
    SELECT event_type, CAST(user_id AS BIGINT) AS top_user,
           CAST(cnt AS BIGINT) AS n_events
    FROM r WHERE rn = 1
    """,
    tags=("functions", "agg", "topk"),
)
def deterministic_mode_agg(spark, sf_dir):
    """``mode(expr, true)`` — the DETERMINISTIC mode (Spark 3.4+
    two-arg form: lowest value among tied modes).  Tie-breaking is
    where single-arg ``mode`` diverges between engines and between
    runs; the deterministic form plus an explicit rank-then-pick
    oracle pin one answer.  (The count column comes from a max_by-
    style re-aggregation — mode itself returns only the value.)
    """
    ev = load_table(spark, sf_dir, "events")
    modes = ev.groupBy("event_type").agg(
        F.mode("user_id", True).cast("long").alias("top_user"))
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n_events"))
    return modes.join(
        per_user,
        # eqNullSafe: the NULL event_type GROUP is legitimate (its mode
        # is over known users) and must survive the re-join
        modes.event_type.eqNullSafe(per_user.event_type)
        & (modes.top_user == per_user.user_id),
    ).select(modes.event_type, "top_user", "n_events")


@register(
    "xml_funcs_roundtrip",
    oracle="""
    WITH xml AS (
      SELECT event_id,
             '<e><t>' || event_type || '</t><v>' ||
             CAST(ROUND(value, 2) AS VARCHAR) || '</v></e>' AS doc
      FROM events
    ), parsed AS (
      SELECT regexp_extract(doc, '<t>(.*?)</t>', 1) AS t,
             CAST(regexp_extract(doc, '<v>(.*?)</v>', 1) AS DOUBLE) AS v
      FROM xml
    )
    SELECT t AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(v), 2) AS total
    FROM parsed GROUP BY t
    """,
    tags=("functions", "xml", "string"),
)
def xml_funcs_roundtrip(spark, sf_dir):
    """XML ingestion surface (Spark 4 built-in ``from_xml``): events
    serialized to XML documents, schema-parsed back, and aggregated —
    the feed-ingestion shape for the XML world (sitemaps, RSS, SOAP
    exports) that previously needed spark-xml.  The oracle parses the
    identical documents with regexes — the contract is the recovered
    values, not the parser.  Parsing is a JVM scan-stage projection;
    the only exchange is the final rollup.

    The ``ROUND(value, 2)`` INSIDE the serialized document pins the
    string form cross-engine (DuckDB and Spark format full-precision
    doubles differently).
    """
    ev = load_table(spark, sf_dir, "events")
    xml = ev.select(
        F.concat(F.lit("<e><t>"), F.col("event_type"), F.lit("</t><v>"),
                 F.round("value", 2).cast("string"),
                 F.lit("</v></e>")).alias("doc"))
    parsed = xml.select(
        F.from_xml("doc", "t string, v double").alias("x"))
    return (
        parsed.groupBy(F.col("x.t").alias("event_type"))
        .agg(F.count("*").alias("n"),
             F.round(F.sum("x.v"), 2).alias("total"))
    )
