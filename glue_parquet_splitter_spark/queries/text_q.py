"""Text-analysis queries over ``documents`` (north-star, M4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import text as T
from ..operators.text import unique_documents
from . import register


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@register(
    "token_stats",
    oracle="""
    SELECT doc_id,
           CAST(array_length(t) AS BIGINT)                 AS n_tokens,
           CAST(array_length(list_distinct(t)) AS BIGINT)  AS n_distinct,
           ((list_sum(list_transform(t, x -> CAST(length(x) AS BIGINT)))
              * 20000 + array_length(t)) // (2 * array_length(t)))
             / 10000.0                                     AS avg_tok_len
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    """,
    tags=("text",),
)
def token_stats(spark, sf_dir):
    return T.token_stats(_docs(spark, sf_dir))


@register(
    "doc_quality_score",
    oracle="""
    SELECT doc_id,
           ((CAST(array_length(list_filter(t,
                 x -> list_contains(['the','a','of','and','to','in'], x)))
                  AS BIGINT) * 20000 + array_length(t))
             // (2 * array_length(t))) / 10000.0    AS stopword_ratio,
           ((CAST(array_length(list_distinct(t)) AS BIGINT) * 20000
             + array_length(t)) // (2 * array_length(t))) / 10000.0
                                                    AS type_token_ratio,
           CASE WHEN n_chars < 100 THEN 'short'
                WHEN n_chars < 300 THEN 'medium'
                ELSE 'long' END                                               AS len_bucket
    FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS t FROM documents)
    """,
    tags=("text", "quality"),
)
def doc_quality_score(spark, sf_dir):
    return T.quality_score(_docs(spark, sf_dir))


# shared by language_id_heuristic and its confusion-matrix eval —
# one definition so the two cannot drift
_LANGID_ORACLE = """
    SELECT doc_id, lang,
           CAST(array_length(list_filter(t, x -> list_contains(['the','a','order','fast'], x))) AS BIGINT)      AS score_en,
           CAST(array_length(list_filter(t, x -> list_contains(['table','data','row','value'], x))) AS BIGINT)  AS score_es,
           CAST(array_length(list_filter(t, x -> list_contains(['window','batch','stream','merge'], x))) AS BIGINT) AS score_de,
           CASE WHEN array_length(list_filter(t, x -> list_contains(['the','a','order','fast'], x)))
                     >= array_length(list_filter(t, x -> list_contains(['table','data','row','value'], x)))
                 AND array_length(list_filter(t, x -> list_contains(['the','a','order','fast'], x)))
                     >= array_length(list_filter(t, x -> list_contains(['window','batch','stream','merge'], x)))
                THEN 'en'
                WHEN array_length(list_filter(t, x -> list_contains(['table','data','row','value'], x)))
                     >= array_length(list_filter(t, x -> list_contains(['window','batch','stream','merge'], x)))
                THEN 'es' ELSE 'de' END AS predicted_lang
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
"""


@register(
    "language_id_heuristic",
    oracle=_LANGID_ORACLE,
    tags=("text", "langid"),
)
def language_id_heuristic(spark, sf_dir):
    return T.language_id(_docs(spark, sf_dir))


@register(
    "lang_source_rollup",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
    tags=("text", "agg"),
)
def lang_source_rollup(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "term_frequency_top20",
    oracle="""
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok ORDER BY n DESC, tok LIMIT 20
    """,
    tags=("text",),
)
def term_frequency_top20(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok").limit(20)
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
           FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tok, ROUND(tf * ln(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark, sf_dir):
    return T.tf_idf_top_terms(_docs(spark, sf_dir), top_k=3)


@register(
    "regex_tokenizer_counts",
    oracle="""
    SELECT doc_id,
           CAST(array_length(regexp_extract_all(text, '[a-z]+')) AS BIGINT)   AS n_alpha,
           CAST(array_length(regexp_extract_all(text, '[0-9]+')) AS BIGINT)   AS n_num,
           CAST(array_length(regexp_extract_all(text, '[a-z]{5,}')) AS BIGINT) AS n_long
    FROM documents
    """,
    tags=("text", "regexp"),
)
def regex_tokenizer_counts(spark, sf_dir):
    """BPE-ish regex tokenization: class-based token counts."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).cast("long").alias("n_alpha"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("long").alias("n_num"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{5,}"), 0)).cast("long").alias("n_long"),
    )


@register(
    "doc_fingerprint_bag",
    oracle="""
    SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY tok)) AS bag_fingerprint
    FROM (SELECT DISTINCT doc_id, tok FROM
           (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents))
    GROUP BY doc_id
    """,
    tags=("text", "fingerprint"),
    unique_docs_guard=True,
)
def doc_fingerprint_bag(spark, sf_dir):
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token bag — catches shuffled near-identical docs that
    defeat raw-text hashing."""
    d = unique_documents(_docs(spark, sf_dir))
    # NULL text = no bag (concat_ws would silently collapse NULL to ''
    # while the oracle's UNNEST drops the doc — fuzz_oracle.py)
    return d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))).alias("bag_fingerprint"),
    )


@register(
    "url_domain_rollup",
    oracle="""
    WITH urls AS (
      SELECT doc_id, n_chars,
             'https://www.' || source || '-cdn' || CAST(doc_id % 3 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR)
               || '?ref=' || CAST(doc_id % 5 AS VARCHAR) AS url
      FROM documents
    ), parsed AS (
      SELECT doc_id, n_chars,
             regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
             regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path
      FROM urls
    )
    SELECT regexp_replace(host, '^www\\.', '') AS host_norm,
           regexp_extract(regexp_replace(host, '^www\\.', ''),
                          '([^.]+\\.[^.]+)$', 1) AS registered_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           CAST(SUM(CASE WHEN path LIKE '/p/%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_p_paths
    FROM parsed
    GROUP BY host_norm, registered_domain
    """,
    tags=("text", "curation", "url"),
)
def url_domain_rollup(spark, sf_dir):
    """URL normalization + per-domain rollup — the curation step that
    precedes domain capping/mixing in a crawl pipeline: parse host and
    path (``F.parse_url``, JVM-side), strip the ``www.`` prefix,
    reduce to the registered domain, and aggregate doc/char counts per
    domain.  URLs are synthesized deterministically from (source,
    doc_id) because the fixture carries none — the derivation is plain
    string concat, so the DuckDB oracle (regexp-based parsing: it has
    no parse_url) reproduces it exactly.

    Scale: parsing is a scan-side projection (whole-stage codegen, no
    UDF); the rollup is one map-side-combinable groupBy on the domain —
    the same plan at any corpus size.  Real-world registered-domain
    extraction needs the public-suffix list (broadcast it as a small
    dim and join on the host suffix); the last-two-labels rule here
    keeps the fixture self-contained.
    """
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id", "n_chars",
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit("-cdn"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
            F.lit("?ref="), (F.col("doc_id") % 5).cast("string"),
        ).alias("url"),
    )
    parsed = urls.select(
        "doc_id", "n_chars",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
    )
    host_norm = F.regexp_replace("host", r"^www\.", "")
    return (
        parsed.select(
            "n_chars", "path",
            host_norm.alias("host_norm"),
            F.regexp_extract(host_norm, r"([^.]+\.[^.]+)$", 1)
            .alias("registered_domain"),
        )
        .groupBy("host_norm", "registered_domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum(F.when(F.col("path").startswith("/p/"), 1).otherwise(0))
            .cast("long").alias("n_p_paths"),
        )
    )


@register(
    "vocab_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS d FROM toks
      WHERE tok <> '' GROUP BY tok
    ), vocab AS (
      SELECT tok FROM df ORDER BY d DESC, tok LIMIT 1000
    ), flagged AS (
      SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
      FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
      WHERE t.tok <> ''
    ), per_doc AS (
      SELECT f.doc_id, d.lang,
             CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_rate
      FROM flagged f JOIN documents d ON d.doc_id = f.doc_id
      GROUP BY f.doc_id, d.lang
    )
    SELECT lang,
           ROUND(AVG(oov_rate), 4) AS avg_oov_rate,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM per_doc GROUP BY lang
    """,
    tags=("text", "curation", "topk"),
)
def vocab_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate against a corpus-derived top-1000-df
    vocabulary, averaged per language — the tokenizer-coverage metric
    a training pipeline checks before committing to a vocab (high OOV
    in one language = that language will fragment into bytes).

    The vocabulary is built IN-PLAN (document frequency, TakeOrdered
    1000 with the (df, token) tiebreak pinning the boundary on both
    engines) and broadcast back onto the token stream — vocab-sized,
    not corpus-sized, exactly how a fitted artifact should flow
    through a plan.  One token-stream shuffle for df, one for the
    per-doc rate; the final rollup is language-sized.
    """
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", "lang",
        F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    df_counts = toks.groupBy("tok").agg(
        F.count_distinct("doc_id").alias("d"))
    vocab = (df_counts.orderBy(F.col("d").desc(), "tok").limit(1000)
             .select("tok"))
    flagged = toks.join(F.broadcast(vocab.withColumn("in_v", F.lit(1))),
                        "tok", "left")
    per_doc = flagged.groupBy("doc_id", "lang").agg(
        (F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
         / F.count("*")).alias("oov_rate"))
    return per_doc.groupBy("lang").agg(
        F.round(F.avg("oov_rate"), 4).alias("avg_oov_rate"),
        F.count("*").alias("n_docs"))


@register(
    "doc_length_log_histogram",
    oracle="""
    SELECT source,
           CAST(FLOOR(LOG2(n_chars)) AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents WHERE n_chars > 0
    GROUP BY source, FLOOR(LOG2(n_chars))
    """,
    tags=("text", "curation", "histogram"),
)
def doc_length_log_histogram(spark, sf_dir):
    """Power-of-two document-length histogram per source — the
    log-scale view every corpus dashboard uses because lengths span
    orders of magnitude (a linear histogram puts 99 % of mass in one
    bin).  Integer bucket of log2 is engine-exact away from exact
    powers of two; ``n_chars`` values here are lengths of generated
    text, never exactly at a float boundary.  Pure map-side bucketing
    plus one combinable groupBy.
    """
    d = _docs(spark, sf_dir)
    return (
        d.where(F.col("n_chars") > 0)
        .groupBy("source",
                 F.floor(F.log2("n_chars")).cast("long")
                 .alias("log2_bucket"))
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "dup_cluster_size_histogram",
    oracle="""
    WITH clusters AS (
      SELECT md5(text) AS h, COUNT(*) AS sz FROM documents GROUP BY md5(text)
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM clusters GROUP BY sz
    """,
    tags=("dedup", "curation", "histogram"),
)
def dup_cluster_size_histogram(spark, sf_dir):
    """Duplicate-cluster SIZE distribution (how many exact-content
    clusters of size 1, 2, 3, …) — the dedup report a curation run
    publishes: total duplicate mass = Σ (sz−1)·n_clusters, and a
    heavy tail here is what motivates the near-dup (MinHash) pass.
    Two stacked map-side-combinable groupBys — content-hash then
    size — each output strictly smaller than its input; the classic
    aggregation-of-aggregation shape that never revisits raw text.
    """
    d = _docs(spark, sf_dir)
    clusters = d.groupBy(F.md5("text").alias("h")).agg(
        F.count("*").alias("sz"))
    return clusters.groupBy(F.col("sz").cast("long").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"))


@register(
    "pmi_adjacent_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), uni AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT UNNEST(t) AS w FROM toks) GROUP BY w
    ), nu AS (SELECT SUM(c) AS n_u FROM uni),
    big AS (
      SELECT t[i] AS w1, t[i + 1] AS w2, COUNT(*) AS c12
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
      GROUP BY 1, 2
    ), nb AS (SELECT SUM(c12) AS n_b FROM big)
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
           ROUND(log2((CAST(c12 AS DOUBLE) * n_u * n_u)
                      / (CAST(n_b AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
    FROM big
    JOIN uni u1 ON u1.w = big.w1
    JOIN uni u2 ON u2.w = big.w2
    CROSS JOIN nu CROSS JOIN nb
    WHERE c12 >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
    tags=("text", "stats", "topk"),
    unique_docs_guard=True,
)
def pmi_adjacent_bigrams(spark, sf_dir):
    """Top-20 collocations by pointwise mutual information over
    adjacent token pairs — PMI(w1,w2) = log2(p(w1,w2)/(p(w1)p(w2))),
    the classic collocation/phrase-mining statistic (Church & Hanks):
    high-PMI bigrams are multi-word units a tokenizer or phrase table
    should treat as one symbol.  A minimum bigram count (5) applies —
    raw PMI is degenerate on hapax pairs.

    Scale: bigrams come from a per-document window (lead over token
    position — one shuffle keyed on doc_id, never a self-join);
    unigram/bigram counts are partial-aggregable groupBys to VOCAB
    granularity; the two totals are 1-row aggregates.  The final
    top-20 is orderBy+limit — TakeOrderedAndProject's per-partition
    heaps, no global sort.  The count-count joins are vocab-keyed
    (bounded by vocab size, not corpus size).

    Determinism: all counts are integers; the PMI double is computed
    with an IDENTICAL product/divide shape in both engines (single
    log2, same association order), then ROUND(.,6); ordering ties
    break on (w1, w2).
    """
    from pyspark.sql import Window as W

    d = unique_documents(_docs(spark, sf_dir))
    toks = d.select("doc_id",
                    F.posexplode(F.split("text", " ")).alias("pos", "w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    nu = uni.agg(F.sum("c").alias("n_u"))
    # total-order: pos is unique per doc_id — posexplode over the
    # identity-deduped documents (unique_documents upstream)
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    big = (toks.withColumn("w2", F.lead("w").over(wdoc))
           .filter(F.col("w2").isNotNull())
           .groupBy(F.col("w").alias("w1"), "w2")
           .agg(F.count("*").alias("c12")))
    nb = big.agg(F.sum("c12").alias("n_b"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (big.filter(F.col("c12") >= 5)
            .join(u1, "w1").join(u2, "w2")
            .crossJoin(F.broadcast(nu))   # bounded: 1-row total
            .crossJoin(F.broadcast(nb))   # bounded: 1-row total
            .select("w1", "w2", F.col("c12").cast("long").alias("c12"),
                    F.round(F.log2((F.col("c12").cast("double")
                                    * F.col("n_u") * F.col("n_u"))
                                   / (F.col("n_b").cast("double")
                                      * F.col("c1") * F.col("c2"))), 6)
                     .alias("pmi"))
            .orderBy(F.desc("pmi"), "w1", "w2")
            .limit(20))


@register(
    "langid_confusion_eval",
    oracle="WITH pred AS (" + _LANGID_ORACLE + """)
    , act AS (SELECT lang, COUNT(*) AS n_act FROM pred GROUP BY lang)
    SELECT p.lang AS actual_lang, p.predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MIN(act.n_act), 6) AS frac,
           (p.lang = p.predicted_lang) AS correct
    FROM pred p JOIN act ON act.lang = p.lang
    GROUP BY p.lang, p.predicted_lang
    """,
    tags=("text", "langid", "eval", "agg"),
)
def langid_confusion_eval(spark, sf_dir):
    """Confusion matrix of the language-ID heuristic against the
    ground-truth label — the eval that turns "we have a lang-ID
    stage" into "our lang-ID mislabels X % of Spanish as German":
    per (actual, predicted) cell, the count, its share of the actual
    class (row-normalized — the diagonal IS per-class recall), and
    the correctness flag.  Run before trusting any per-language
    sampling/mixture decision downstream (a biased classifier skews
    ``domain_mixture_weights``' natural shares silently).  Composes
    the production classifier unchanged (``operators.text
    .language_id``); the oracle wraps the SAME shared SQL, so
    classifier and eval cannot drift.

    Scale: classification is map-side array arithmetic in the scan
    projection; the matrix is a partial-aggregable groupBy to
    (class x class) granularity joined against class totals — both
    sides bounded by the label domain.

    Determinism: integer counts; class shares are single divisions
    rounded to 6; key-complete grouped output.
    """
    pred = T.language_id(_docs(spark, sf_dir))
    act = pred.groupBy("lang").agg(F.count("*").alias("n_act"))
    return (pred.join(act, "lang")
            .groupBy("lang", "predicted_lang")
            .agg(F.count("*").alias("n"),
                 F.round(F.count("*").cast("double") / F.min("n_act"), 6)
                  .alias("frac"))
            .select(F.col("lang").alias("actual_lang"), "predicted_lang",
                    "n", "frac",
                    (F.col("lang") == F.col("predicted_lang"))
                    .alias("correct")))
