"""Remaining taxonomy coverage: map type, null-safe equality, rolling
(order-sensitive) fingerprints, vectorized scalar pandas UDF, extra
event-time analytics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "map_funcs",
    oracle="""
    SELECT doc_id,
           map(['lang', 'source'], [lang, source])['lang'][1]  AS lang_val,
           CAST(cardinality(map(['lang', 'source'], [lang, source])) AS BIGINT) AS n_keys
    FROM documents
    """,
    tags=("scalar", "map"),
)
def map_funcs(spark, sf_dir):
    """MapType construction + key lookup + cardinality."""
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.size(m).cast("long").alias("n_keys"),
    )


@register(
    "nullsafe_join",
    oracle="""
    WITH a AS (SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS nk
               FROM customer),
         b AS (SELECT s_suppkey, CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END AS nk
               FROM supplier)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) FILTER (WHERE a.nk IS NULL) AS BIGINT) AS null_pairs
    FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
    """,
    tags=("join", "null"),
)
def nullsafe_join(spark, sf_dir):
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM):
    NULL keys match each other instead of dropping out."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_nationkey")).alias("nk_a"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_acctbal") < 0, F.lit(None)).otherwise(F.col("s_nationkey")).alias("nk_b"),
    )
    j = c.join(s, F.col("nk_a").eqNullSafe(F.col("nk_b")))
    return j.agg(
        F.count("*").alias("n_pairs"),
        F.count(F.when(F.col("nk_a").isNull(), 1)).alias("null_pairs"),
    )


@register(
    "doc_fingerprint_rolling",
    oracle="""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL ELSE
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              t -> CAST(ascii(t) * 1000 + length(t) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) END AS rolling_hash
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def doc_fingerprint_rolling(spark, sf_dir):
    """Order-SENSITIVE rolling hash over the token stream (left fold of
    (h*31 + tok_code) mod p) — distinguishes permuted docs that the bag
    fingerprint (doc_fingerprint_bag) deliberately collapses."""
    d = load_table(spark, sf_dir, "documents")
    code = lambda t: (F.ascii(t) * 1000 + F.length(t)).cast("long")  # noqa: E731
    fold = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + code(t)) % 1000000007,
    )
    return d.select("doc_id", fold.alias("rolling_hash"))


@register(
    "hourly_distinct_users",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
    tags=("events", "window"),
)
def hourly_distinct_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"))
        .agg(F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_users", "n_events",
        )
    )


@register(
    "top_event_type_per_hour",
    oracle="""
    SELECT window_start, event_type, n FROM (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY date_trunc('hour', ts), event_type
    ) WHERE rn = 1
    """,
    tags=("events", "window", "topk"),
)
def top_event_type_per_hour(spark, sf_dir):
    """Argmax per time bucket: window-agg + rank-1 (top-k composed with
    event-time bucketing)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    # total-order: one row per (h, event_type) — the groupBy output —
    # so event_type is unique within the partition
    w = Window.partitionBy("h").orderBy(F.desc("n"), "event_type")
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n",
        )
    )


@register(
    "multimodal_resize_stub",
    oracle="""
    WITH nb AS (
      SELECT doc_id, octet_length(encode(text)) AS n
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(64 + (n % 512) AS INT)         AS width,
           CAST((64 + (n % 512)) // 2 AS INT)  AS thumb_w,
           CAST((64 + ((n * 7) % 512)) // 2 AS INT) AS thumb_h
    FROM nb
    """,
    tags=("multimodal", "pandas_udf"),
)
def multimodal_resize_stub(spark, sf_dir):
    """Vectorized scalar ``@pandas_udf`` (Arrow columnar batches) for
    the resize step — a real resizer would swap the arithmetic for
    PIL.thumbnail over the payload; the batch shape is the deliverable."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def half(v: pd.Series) -> pd.Series:
        return (v // 2).astype("int32")

    from ..operators import multimodal as M

    decoded = M.decode_metadata(M.pack_binary(load_table(spark, sf_dir, "documents")))
    return decoded.select(
        "doc_id", "width",
        half("width").alias("thumb_w"),
        half("height").alias("thumb_h"),
    )
