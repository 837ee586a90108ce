"""Scalar function library queries (SURVEY.md §2 taxonomy rows:
string / date-time / math / JSON / array / hash functions).

The reference's only scalar work is filename string surgery
(parquet-splitter.py:62-81) and JSON serialization (:112); the engine
exposes the full Spark function lattice. Every expression here is a
built-in ``pyspark.sql.functions`` call — JVM-side, codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                          AS brand_u,
           lower(p_type)                           AS type_l,
           CAST(length(p_name) AS BIGINT)          AS name_len,
           substr(p_name, 1, 6)                    AS name_pre,
           left(p_type, 4)                         AS type_left,
           right(p_brand, 2)                       AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 4, '0')   AS size_pad,
           concat_ws('|', p_brand, p_type)         AS brand_type,
           replace(p_name, ' ', '_')               AS name_snake,
           reverse(p_brand)                        AS brand_rev,
           CAST(strpos(p_type, 'a') AS BIGINT)     AS a_pos,
           trim(p_name)                            AS name_trim
    FROM part
    """,
    tags=("scalar", "string"),
)
def string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 6).alias("name_pre"),
        F.expr("left(p_type, 4)").alias("type_left"),
        F.expr("right(p_brand, 2)").alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_type", "a").cast("long").alias("a_pos"),
        F.trim("p_name").alias("name_trim"),
    )


@register(
    "string_split_extract",
    oracle="""
    SELECT p_partkey,
           string_split(p_type, ' ')[1]                       AS first_word,
           string_split(p_type, ' ')[-1]                      AS last_word,
           CAST(array_length(string_split(p_name, ' ')) AS BIGINT) AS n_words
    FROM part
    """,
    tags=("scalar", "string"),
)
def string_split_extract(spark, sf_dir):
    """Split/extract — the reference's basename surgery idiom
    (``k.rsplit('/', 1)[-1]``, parquet-splitter.py:66)."""
    p = _t(spark, sf_dir, "part")
    toks = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        toks.getItem(0).alias("first_word"),
        F.element_at(toks, -1).alias("last_word"),
        F.size(F.split(F.col("p_name"), " ")).cast("long").alias("n_words"),
    )


@register(
    "regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '([0-9]+)', 1)             AS brand_digits,
           regexp_matches(p_type, '^[ab]')                    AS starts_ab,
           regexp_replace(p_name, '[aeiou]', '.', 'g')        AS name_dots
    FROM part
    """,
    tags=("scalar", "regexp"),
)
def regexp_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_digits"),
        F.col("p_type").rlike("^[ab]").alias("starts_ab"),
        F.regexp_replace("p_name", "[aeiou]", ".").alias("name_dots"),
    )


@register(
    "filename_date_extract",
    oracle="""
    SELECT DISTINCT
           substr(fname, 1, length(fname) - 8) AS file_date
    FROM (SELECT strftime(o_orderdate, '%Y%m%d') || '.parquet' AS fname FROM orders)
    WHERE fname LIKE '%.parquet'
    """,
    tags=("scalar", "string", "parity"),
)
def filename_date_extract(spark, sf_dir):
    """O3 parity: ``YYYYMMDD.parquet`` basename → date key, dedup via
    distinct (parquet-splitter.py:62-69), expressed relationally over a
    filename column derived from orders."""
    o = _t(spark, sf_dir, "orders")
    fname = F.concat(F.date_format("o_orderdate", "yyyyMMdd"), F.lit(".parquet"))
    return (
        o.select(fname.alias("fname"))
        .filter(F.col("fname").endswith(".parquet"))
        .select(F.expr("substr(fname, 1, length(fname) - 8)").alias("file_date"))
        .distinct()
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)      AS yr,
           CAST(month(o_orderdate) AS BIGINT)     AS mo,
           CAST(day(o_orderdate) AS BIGINT)       AS dom,
           CAST(quarter(o_orderdate) AS BIGINT)   AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')   AS plus30,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT) AS days_to_99
    FROM orders
    """,
    tags=("scalar", "date"),
)
def date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).cast("long").alias("days_to_99"),
    )


@register(
    "timestamp_funcs",
    oracle="""
    SELECT event_id,
           CAST(hour(ts) AS BIGINT)    AS hr,
           CAST(minute(ts) AS BIGINT)  AS mi,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket
    FROM events
    """,
    tags=("scalar", "date"),
)
def timestamp_funcs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").cast("long").alias("hr"),
        F.minute("ts").cast("long").alias("mi"),
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("epoch_s"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
    )


@register(
    "json_funcs",
    oracle="""
    WITH j AS (
      SELECT event_id,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS k
      FROM events)
    SELECT event_id, k AS k_str,
           CAST(k AS BIGINT)      AS k_int,
           CAST(k AS BIGINT) % 10 AS k_mod
    FROM j
    """,
    tags=("scalar", "json"),
)
def json_funcs(spark, sf_dir):
    """JSON scalar fns (reference O18 serializes a marker dict with
    json.dumps, parquet-splitter.py:112; here: the parse direction)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_int"),
        (k.cast("long") % 10).alias("k_mod"),
    )


@register(
    "json_struct_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN json_valid(props)
                         THEN CAST(json_extract_string(props, '$.k')
                                   AS BIGINT) END) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def json_struct_roundtrip(spark, sf_dir):
    """from_json into a typed struct, then aggregate over the parsed field."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("j", F.from_json("props", "k long"))
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("j.k")).alias("sum_k"),
    )


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(array_length(embedding) AS BIGINT)        AS dim,
           ROUND(embedding[1], 4)                         AS first_val,
           ROUND(list_sum(embedding), 4)                  AS vec_sum,
           ROUND(list_min(embedding), 4)                  AS vec_min,
           ROUND(list_max(embedding), 4)                  AS vec_max,
           CAST(array_length(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def array_funcs(spark, sf_dir):
    """Scalar array-function demo over RAW embeddings (deliberately no
    well-formedness gate — these are the functions a hygiene audit
    itself would use), so the empty/NULL-component semantics are
    EXPLICIT on both engines (--malformed --dupkeys fuzz): first_val
    via try_element_at (ANSI element_at THROWS on an empty array;
    DuckDB emb[1] is NULL), and the sum/min/max fold over the
    NULL-stripped components with an empty/all-NULL vector yielding
    NULL (DuckDB's list_sum/list_min skip NULLs and return NULL on
    empty, while Spark's aggregate would propagate NULL and return
    0.0 on empty)."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    nn = F.filter(emb, lambda x: x.isNotNull())
    has = F.size(nn) > 0
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.round(F.try_element_at(emb, F.lit(1)), 4).alias("first_val"),
        F.when(has, F.round(F.aggregate(nn, F.lit(0.0),
                                        lambda a, x: a + x), 4))
        .alias("vec_sum"),
        F.when(has, F.round(F.array_min(nn), 4)).alias("vec_min"),
        F.when(has, F.round(F.array_max(nn), 4)).alias("vec_max"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
    )


@register(
    "array_explode_agg",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           ROUND(SUM(v), 2)         AS total,
           ROUND(AVG(v), 4)         AS mean_v
    FROM (SELECT label, UNNEST(embedding) AS v FROM embeddings)
    GROUP BY label
    """,
    tags=("scalar", "array"),
)
def array_explode_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.explode("embedding").alias("v"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_values"),
            F.round(F.sum("v"), 2).alias("total"),
            F.round(F.avg("v"), 4).alias("mean_v"),
        )
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_extendedprice - 30000), 2)   AS abs_diff,
           CAST(FLOOR(l_quantity) AS BIGINT)        AS qty_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT)   AS disc_pct_ceil,
           ROUND(sqrt(CASE WHEN l_extendedprice >= 0
                           THEN l_extendedprice END), 4) AS price_sqrt,
           ROUND(ln(CASE WHEN l_extendedprice + 1 > 0
                        THEN l_extendedprice + 1 END), 4) AS price_ln,
           ROUND(log10(CASE WHEN l_extendedprice + 1 > 0
                           THEN l_extendedprice + 1 END), 4)
                                                    AS price_log10,
           ROUND(pow(l_tax, 2), 6)                  AS tax_sq,
           CAST(l_orderkey % 7 AS BIGINT)           AS key_mod,
           CAST(sign(l_extendedprice - 30000) AS BIGINT) AS over_30k
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def math_funcs(spark, sf_dir):
    """Scalar math surface.  sqrt/ln/log10 of an out-of-domain value
    (negative price — real since the --negative fuzz dimension flips
    measure signs) is explicitly NULL on BOTH engines: Spark returns
    NaN (sqrt) / NULL (log) where DuckDB RAISES an Out of Range Error,
    so the domain guard must be named, not left to engine defaults —
    the try_divide contract, applied to roots and logarithms."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.abs(price - 30000), 2).alias("abs_diff"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.round(F.sqrt(F.when(price >= 0, price)), 4).alias("price_sqrt"),
        F.round(F.log(F.when(price + 1 > 0, price + 1)), 4)
        .alias("price_ln"),
        F.round(F.log10(F.when(price + 1 > 0, price + 1)), 4)
        .alias("price_log10"),
        F.round(F.pow("l_tax", F.lit(2)), 6).alias("tax_sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        F.signum(price - 30000).cast("long").alias("over_30k"),
    )


@register(
    "hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text)          AS text_md5,
           sha256(text)       AS text_sha256,
           md5(lower(trim(text))) AS norm_fingerprint
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def hash_funcs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("norm_fingerprint"),
    )
