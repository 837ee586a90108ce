"""Curation wave 5 (round 9): exact-substring span dedup.

The Lee et al. "Deduplicating Training Data Makes Language Models
Better" exact-substring method, at span granularity: the unit of
removal is the maximal REPEATED TOKEN SPAN between two documents, not
the whole document — the form `interdoc_dup_gram_fraction` (gram-level
fraction) and `linechunk_dedup_rebuild` (line-level rebuild)
deliberately stop short of."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

_N = 4        # positional gram width (tokens)
_DF_CAP = 50  # grams in more docs than this are boilerplate — dropped
_MIN_SPAN = 6  # report pairs sharing a maximal span of >= this many tokens


@register(
    "exact_substring_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             md5(array_to_string(t[CAST(i AS INT):CAST(i + {_N} - 1 AS INT)],
                                 ' ')) AS g
      FROM toks, UNNEST(range(1, len(t) - {_N} + 2)) AS u(i)
    ), keep AS (
      SELECT g FROM grams GROUP BY g
      HAVING COUNT(DISTINCT doc_id) <= {_DF_CAP}
    ), hits AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
      FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
      WHERE a.doc_id < b.doc_id
    ), islands AS (
      SELECT doc_a, doc_b, pa - pb AS diag,
             pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                     ORDER BY pa) AS isle,
             pa
      FROM hits
    ), spans AS (
      SELECT doc_a, doc_b,
             MAX(pa) - MIN(pa) + {_N} AS span_tokens
      FROM islands GROUP BY doc_a, doc_b, diag, isle
    )
    SELECT doc_a, doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(MAX(span_tokens) AS BIGINT) AS longest_span,
           CAST(SUM(span_tokens) AS BIGINT) AS span_tokens_total
    FROM spans GROUP BY doc_a, doc_b
    HAVING MAX(span_tokens) >= {_MIN_SPAN}
    """,
    tags=("dedup", "curation", "window"),
)
def exact_substring_spans(spark, sf_dir):
    """Exact-substring dedup at SPAN granularity (Lee et al. 2022's
    unit of removal): positional {_N}-grams are joined across document
    pairs, runs that advance together in both documents (equal
    ``pa - pb`` diagonal, consecutive ``pa``) merge into maximal
    shared spans via gaps-and-islands, and a pair is reported when its
    longest shared span reaches ``_MIN_SPAN`` tokens — the verbatim-
    copy evidence gram *fractions* can only hint at.

    Scale: the pair generation is an inverted-index equi join on the
    gram digest — only co-occurring positions ever meet, never doc x
    doc — and the boilerplate guard drops grams appearing in more
    than ``_DF_CAP`` documents BEFORE the join (the hot-shingle skew
    control: a navigation-bar gram in 10^6 docs would otherwise
    quadratically explode one key).  The island merge shuffles once
    on (doc_a, doc_b, diagonal) — pair-granular, bounded by matched
    positions, and each window partition is one diagonal of one pair.
    Raw text never shuffles; only digests and integer positions do.

    Determinism: md5 digests, integer positions, integer span
    arithmetic, and an integer reporting threshold — no floats
    anywhere.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("t"))
    grams = t.select(
        "doc_id",
        F.posexplode(F.expr(
            f"CASE WHEN size(t) >= {_N} THEN transform("
            f"sequence(0, size(t) - {_N}), "
            f"i -> concat_ws(' ', {', '.join(f't[i+{j}]' for j in range(_N))}))"
            f" ELSE array() END")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"),
             F.md5("tok").alias("g"))
    keep = (grams.groupBy("g")
            .agg(F.count_distinct("doc_id").alias("df"))
            .where(F.col("df") <= _DF_CAP).select("g"))
    a = grams.join(keep, "g").select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g")
    b = grams.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g")
    hits = (a.join(b, "g")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "pa", "pb"))
    diag = (F.col("pa") - F.col("pb")).alias("diag")
    w = W.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    islands = hits.select(
        "doc_a", "doc_b", diag, "pa"
    ).withColumn("isle", F.col("pa") - F.row_number().over(w))
    spans = (islands.groupBy("doc_a", "doc_b", "diag", "isle")
             .agg((F.max("pa") - F.min("pa") + _N).alias("span_tokens")))
    return (spans.groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_spans"),
                 F.max("span_tokens").alias("longest_span"),
                 F.sum("span_tokens").alias("span_tokens_total"))
            .where(F.col("longest_span") >= _MIN_SPAN))


_BUDGET = 8_000  # global token budget; binds (~30% selected) at sf0.01


@register(
    "token_budget_head_selection",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source, n_chars,
             len(string_split(text, ' ')) AS toks
      FROM documents
    ), grp AS (
      SELECT n_chars, SUM(toks) AS gtoks FROM docs GROUP BY n_chars
    ), run AS (
      SELECT n_chars, gtoks,
             SUM(gtoks) OVER (ORDER BY n_chars DESC) AS cum
      FROM grp
    ), within AS (
      SELECT d.doc_id, d.source, d.n_chars, d.toks,
             r.cum - r.gtoks
               + SUM(d.toks) OVER (PARTITION BY d.n_chars
                                   ORDER BY d.doc_id) AS cum_doc
      FROM docs d JOIN run r USING (n_chars)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(toks) AS BIGINT) AS selected_tokens
    FROM within WHERE cum_doc <= {_BUDGET}
    GROUP BY source
    """,
    tags=("curation", "window", "agg"),
)
def token_budget_head_selection(spark, sf_dir):
    """Select the best documents until a GLOBAL token budget is spent
    — the final step of every curation pipeline ("keep the top of the
    quality ordering that fits the training budget").  Quality proxy
    here is ``n_chars`` (descending), ties broken by doc_id; a doc is
    selected iff the running token total up to and including it stays
    within the budget.

    Scale: the naive form is ONE global window over the corpus — a
    single-partition sort, the classic scale-killer.  This is the
    two-phase cumulative sum instead (the ``quality_decile_mix``
    machinery): phase 1 aggregates to quality-VALUE granularity and
    runs the window over value-granular rows (bounded by the quality
    domain, not the corpus); phase 2 joins each doc its group's
    running offset back and completes the sum within its own value
    partition.  Corpus rows shuffle once on the value key; the only
    ordered window over raw docs is per-value, never global.

    Determinism: token counts are integers, the budget test is
    integer, and the within-group order is doc_id — no floats in the
    selection decision anywhere.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "source", "n_chars",
        F.size(F.split("text", " ")).alias("toks"))
    grp = docs.groupBy("n_chars").agg(F.sum("toks").alias("gtoks"))
    run = grp.select(
        "n_chars", "gtoks",
        F.sum("gtoks").over(
            W.orderBy(F.desc("n_chars"))
            .rowsBetween(W.unboundedPreceding, 0)).alias("cum"))
    within = (
        docs.join(run, "n_chars")
        .select(
            "doc_id", "source", "toks",
            (F.col("cum") - F.col("gtoks")
             + F.sum("toks").over(
                 W.partitionBy("n_chars").orderBy("doc_id")
                 .rowsBetween(W.unboundedPreceding, 0))).alias("cum_doc"))
    )
    return (within.where(F.col("cum_doc") <= _BUDGET)
            .groupBy("source")
            .agg(F.count("*").alias("n_selected"),
                 F.sum("toks").alias("selected_tokens")))
