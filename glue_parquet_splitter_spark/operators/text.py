"""Text-analysis operators for training-data pipelines (M4).

All built-in expressions (split/explode/agg/window) — the per-token
work is map-side; the only shuffles are the (doc, token) group-bys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Tiny marker-word lists for the n-gram/keyword language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "a", "order", "fast"),
    "es": ("table", "data", "row", "value"),
    "de": ("window", "batch", "stream", "merge"),
}


def token_table(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) with multiplicity — whitespace tokenization."""
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))


def token_stats(docs: DataFrame) -> DataFrame:
    # ratios are integer-HALF-UP to 4 digits ((num·2e4 + den) div 2den):
    # a float ROUND sits on a half-ulp boundary whenever num·10⁴ is an
    # exact multiple of den/2 — a 20k-token fuzz doc hit
    # 88807/20000 = 4.44035 and the engines' accumulate-then-round
    # paths split (FUZZ.md --big); integer arithmetic is boundary-free
    toks = F.split("text", " ")
    sum_len = F.aggregate(F.transform(toks, lambda t: F.length(t)),
                          F.lit(0).cast("long"),
                          lambda a, x: a + x.cast("long"))
    return (docs
            .select("doc_id", sum_len.alias("_sl"),
                    F.size(toks).cast("long").alias("n_tokens"),
                    F.size(F.array_distinct(toks)).cast("long")
                    .alias("n_distinct"))
            .select("doc_id", "n_tokens", "n_distinct",
                    (F.expr("(_sl * 20000 + n_tokens) div (2 * n_tokens)")
                     / 1e4).alias("avg_tok_len")))


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality signals: stopword ratio, type-token ratio,
    length bucket — the usual cheap pre-filters before expensive dedup."""
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    # integer half-up ratios — see token_stats (FUZZ.md --big)
    return (docs
            .select("doc_id", "n_chars",
                    n_stop.cast("long").alias("_ns"),
                    F.size(F.array_distinct(toks)).cast("long").alias("_nd"),
                    F.size(toks).cast("long").alias("_nt"))
            .select(
                "doc_id",
                (F.expr("(_ns * 20000 + _nt) div (2 * _nt)") / 1e4)
                .alias("stopword_ratio"),
                (F.expr("(_nd * 20000 + _nt) div (2 * _nt)") / 1e4)
                .alias("type_token_ratio"),
                F.when(F.col("n_chars") < 100, "short")
                .when(F.col("n_chars") < 300, "medium")
                .otherwise("long").alias("len_bucket")))


def language_id(docs: DataFrame) -> DataFrame:
    """Deterministic keyword-overlap language scorer (stub for a real
    n-gram model; the Spark plumbing — per-doc scores + argmax — is the
    part that matters at scale)."""
    toks = F.split("text", " ")
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    pred = (
        F.when((scores["en"] >= scores["es"]) & (scores["en"] >= scores["de"]), "en")
        .when(scores["es"] >= scores["de"], "es")
        .otherwise("de")
    )
    return docs.select(
        "doc_id", "lang",
        *[scores[lg].cast("long").alias(f"score_{lg}") for lg in LANG_MARKERS],
        pred.alias("predicted_lang"),
    )


def tf_idf_top_terms(docs: DataFrame, top_k: int = 3) -> DataFrame:
    toks = token_table(docs)
    # corpus size stays IN the plan as a broadcast 1-row dimension —
    # no driver-side count()/collect in the operator path
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_ = toks.distinct().groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    # total-order: tok is unique per partition — scored derives from
    # the groupBy(doc_id, tok) term-frequency table
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "tok", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


def unique_documents(docs: DataFrame) -> DataFrame:
    """Identity uniqueness at ingest for the documents table: one
    deterministic winner row per ``doc_id`` — minimum by (text, lang,
    source, n_chars), each ASC NULLS LAST.

    Duplicate identities (a double-delivered CDC batch / reprocessed
    partition — the --dupkeys fuzz hostility) are structurally
    engine-divergent downstream: any "the text of this doc_id"
    computation becomes an arbitrary pick, and Spark's row-scoped
    frames vs the oracles' key-joined CTEs disagree on multiplicities.
    Exact duplicates collapse to the same row under any rule; the
    ordered tuple makes CONFLICTING duplicates deterministic too.
    String comparison is byte-wise UTF-8 in both engines, so the rule
    is engine-stable.  Mirror: :func:`wf_documents_sql`; register
    queries with ``unique_docs_guard=True`` to apply the mirror to
    their oracle automatically.

    Scale: one doc_id-keyed window — production pipelines dedup once
    at the bronze→silver boundary and skip this pass; it is a no-op
    (beyond the shuffle) on an identity-clean corpus."""
    # total-order: orders by every non-pk column of the table —
    # residual ties are byte-identical rows; any winner is the same row
    w = Window.partitionBy("doc_id").orderBy(
        F.asc_nulls_last("text"), F.asc_nulls_last("lang"),
        F.asc_nulls_last("source"), F.asc_nulls_last("n_chars"))
    return (docs.withColumn("_uq_rn", F.row_number().over(w))
            .filter(F.col("_uq_rn") == 1).drop("_uq_rn"))


def wf_documents_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`unique_documents`, usable as a CTE
    body."""
    return (f"SELECT * EXCLUDE (_uq_rn) FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id"
            f" ORDER BY text ASC NULLS LAST, lang ASC NULLS LAST,"
            f" source ASC NULLS LAST, n_chars ASC NULLS LAST) AS _uq_rn"
            f" FROM {table}) WHERE _uq_rn = 1")
