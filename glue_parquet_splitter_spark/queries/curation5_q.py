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
from ..operators.text import unique_documents
from ..staging import stage_table
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
    # the DF cap must filter BOTH join sides: a hot gram dropped only
    # from side a would still ship all its side-b rows into one hot
    # join partition as dead weight (r9 review finding)
    a = grams.join(keep, "g").select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g")
    b = grams.join(keep, "g").select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g")
    hits = (a.join(b, "g")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "pa", "pb"))
    diag = (F.col("pa") - F.col("pb")).alias("diag")
    # total-order: tied rows are identical (pa) duplicates; row_number
    # assigns the same multiset of island offsets whatever the roll, so
    # the span aggregates are unchanged
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
                                   ORDER BY d.doc_id, d.toks,
                                            d.source NULLS LAST
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum_doc
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
        # bounded: fed by groupBy(n_chars) — one row per distinct doc
        # length (value-domain-bounded)
        F.sum("gtoks").over(
            W.orderBy(F.desc("n_chars"))
            .rowsBetween(W.unboundedPreceding, 0)).alias("cum"))
    # total-order: the running sum CARRIES toks and the rollup reads
    # source, so both join the order key — a duplicate doc_id with the
    # same length but different text/source is otherwise order-tied
    # and the prefix sums roll dice (r15 window-totality lint); the
    # oracle also pins ROWS explicitly because DuckDB's default
    # ORDER-BY frame is RANGE, which treats tied rows as peers where
    # Spark's rowsBetween does not.  No-op on identity-clean corpora.
    within = (
        docs.join(run, "n_chars")
        .select(
            "doc_id", "source", "toks",
            (F.col("cum") - F.col("gtoks")
             + F.sum("toks").over(
                 W.partitionBy("n_chars")
                 .orderBy("doc_id", "toks", F.asc_nulls_last("source"))
                 .rowsBetween(W.unboundedPreceding, 0))).alias("cum_doc"))
    )
    return (within.where(F.col("cum_doc") <= _BUDGET)
            .groupBy("source")
            .agg(F.count("*").alias("n_selected"),
                 F.sum("toks").alias("selected_tokens")))


from .curation4_q import hex_hash_expr

_U6 = 16 ** 6  # uniform-hash range for the ES sampling key
               # (6 hex chars: 16^8 would overflow int32 under ANSI)
_ES_K = 5      # weighted sample size per language


@register(
    "pareto_frontier_docs",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS uniq_ratio
      FROM documents
    ), grp AS (
      SELECT toks, MAX(uniq_ratio) AS gmax FROM docs GROUP BY toks
    ), best AS (
      SELECT toks, gmax,
             MAX(gmax) OVER (ORDER BY toks DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS best_longer
      FROM grp
    )
    SELECT d.doc_id, d.toks, d.uniq_ratio
    FROM docs d JOIN best b USING (toks)
    WHERE d.uniq_ratio = b.gmax
      AND d.uniq_ratio > COALESCE(b.best_longer, -1)
    """,
    tags=("curation", "window", "skyline"),
)
def pareto_frontier_docs(spark, sf_dir):
    """Pareto-optimal document selection — the 2-D skyline over
    (length in tokens, lexical quality = distinct-token ratio): keep
    exactly the docs no other doc dominates (>= on both objectives, >
    on at least one).  Multi-objective curation's honest form: rather
    than collapsing quality x length into one ad-hoc score, surface
    the frontier and let the mixing stage choose along it.

    Scale: the naive skyline is a quadratic dominance self-join.
    This is the grouped-cummax form instead: aggregate to
    length-VALUE granularity (bounded by the length domain, not the
    corpus), one running-max window over those value rows ordered by
    length descending (`best_longer` = best quality among all
    STRICTLY longer docs), then join each doc back on its length key.
    A doc is on the frontier iff it tops its own length group AND
    beats every longer group's best.  Corpus rows shuffle once on the
    length key; no window ever orders corpus-granular rows.

    Determinism: integer lengths; the ratio is ROUND(.,6) before any
    compare, and equality ties (same toks, same ratio) are
    symmetric — co-equal docs are all on the frontier.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    docs = d.select(
        "doc_id",
        F.size(t).cast("long").alias("toks"),
        F.round(F.size(F.array_distinct(t)).cast("double") / F.size(t), 6)
         .alias("uniq_ratio"))
    grp = docs.groupBy("toks").agg(F.max("uniq_ratio").alias("gmax"))
    best = grp.select(
        "toks", "gmax",
        # bounded: fed by groupBy(toks) — one row per distinct token
        # COUNT (value-domain-bounded)
        F.max("gmax").over(
            W.orderBy(F.desc("toks"))
            .rowsBetween(W.unboundedPreceding, -1)).alias("best_longer"))
    return (docs.join(best, "toks")
            .where((F.col("uniq_ratio") == F.col("gmax"))
                   & (F.col("uniq_ratio") > F.coalesce(F.col("best_longer"),
                                                       F.lit(-1.0))))
            .select("doc_id", "toks", "uniq_ratio"))


@register(
    "weighted_sample_wor",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             ({hex_hash_expr("doc_id", 6)} + 0.5) / {_U6}.0 AS u
      FROM documents
    ), keyed AS (
      SELECT doc_id, lang, toks,
             ROUND(POW(u, 1.0 / toks), 6) AS es_key
      FROM docs
    )
    SELECT lang, doc_id, toks, es_key, CAST(smp_rank AS BIGINT) AS smp_rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY es_key DESC, doc_id) AS smp_rank
          FROM keyed)
    WHERE smp_rank <= {_ES_K}
    """,
    tags=("curation", "sampling", "window"),
)
def weighted_sample_wor(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, Efraimidis-Spirakis:
    each doc draws a uniform u and gets key u^(1/w) (w = its token
    count); the top-k keys per language are a weighted-without-
    replacement sample — inclusion probability proportional to
    weight, and the corpus-mixing op behind "sample 1M docs
    proportional to quality" that naive per-row Bernoulli sampling
    (which can't hit an exact k) and uniform reservoirs (which
    ignore w) both get wrong.

    Scale: one map-side key computation (the uniform is a salted
    md5 of the doc id — deterministic, repartition-proof), then a
    per-group top-k rank window: partial per-partition heaps, never
    a global sort.  Exactly the ``reservoir_per_group`` shuffle
    shape with a weight-aware key.

    Determinism: the uniform comes from ``hex_hash_expr`` (identical
    md5 arithmetic on both engines), the key is ROUND(.,6) before
    ranking, and ties break by doc_id.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
        ((F.expr(hex_hash_expr("doc_id", 6)) + 0.5) / F.lit(float(_U6)))
        .alias("u"))
    keyed = docs.select(
        "doc_id", "lang", "toks",
        F.round(F.pow("u", F.lit(1.0) / F.col("toks")), 6).alias("es_key"))
    # total-order: es_key is strictly monotone in toks for fixed doc_id
    # (u in (0,1)), so tied (es_key, doc_id) rows agree on toks up to
    # the 1e-6 key rounding — the identity-clean equality-pin residual
    # the embeddings contract documents; all other returned columns are
    # in the key
    w = W.partitionBy("lang").orderBy(F.desc("es_key"), "doc_id")
    return (keyed.withColumn("smp_rank", F.row_number().over(w))
            .where(F.col("smp_rank") <= _ES_K)
            .select("lang", "doc_id", "toks", "es_key",
                    F.col("smp_rank").cast("long").alias("smp_rank")))


@register(
    "dedup_incremental_index",
    oracle=f"""
    WITH planted AS (
      SELECT d.doc_id, d.lang, COALESCE(p.text, d.text) AS content
      FROM documents d
      LEFT JOIN documents p
        ON d.doc_id % 7 IN (3, 5)
       AND p.doc_id = d.doc_id - (d.doc_id % 7)
    ), hashed AS (
      SELECT doc_id, lang, md5(content) AS h,
             {hex_hash_expr("doc_id", 4, offset=8)} % 16 AS b
      FROM planted
    ), idx AS (
      SELECT DISTINCT h FROM hashed WHERE b < 12
    ), batch AS (
      SELECT hs.doc_id, hs.lang, hs.h, (i.h IS NOT NULL) AS seen
      FROM hashed hs LEFT JOIN idx i USING (h)
      WHERE hs.b >= 12
    ), firsts AS (
      SELECT h, MIN(doc_id) AS first_id FROM batch
      WHERE NOT seen GROUP BY h
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS batch_docs,
           CAST(SUM(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT)
             AS seen_in_index,
           CAST(SUM(CASE WHEN NOT seen AND doc_id = first_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS new_unique,
           CAST(SUM(CASE WHEN NOT seen AND doc_id <> first_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS intra_batch_dups
    FROM batch LEFT JOIN firsts USING (h)
    GROUP BY lang
    """,
    tags=("dedup", "pipeline", "incremental"),
)
def dedup_incremental_index(spark, sf_dir):
    """Incremental dedup at INGEST — the production shape exact dedup
    actually runs in: a historical content-hash index (~75% of the
    corpus here, split by a salted id hash) meets a new batch, and
    each batch doc is classified as seen-in-index (drop), new-unique
    (keep + append its hash to the index), or intra-batch duplicate
    (keep only the min-id first occurrence).  Duplicates are planted
    deterministically — docs with id % 7 in (3, 5) carry their
    parent's (id - id%7) text — so all three classes are non-empty
    and cross the index/batch boundary.

    Scale: both classifications are hash-equi-joins on the md5
    content digest — the index side is a (h)-keyed table that at
    100 TB lives bucketed on h, so the batch join co-locates without
    a full shuffle of the index; the intra-batch first-occurrence is
    a groupBy on h over the UNSEEN subset only.  Raw text never
    shuffles — only 32-char digests do.  No broadcast hint anywhere:
    the index is O(corpus) by definition and must shuffle-join.

    Determinism: md5 digests, integer id arithmetic and the
    hex_hash_expr split (offset=8: independent of every other salt
    in the registry), min-id survivor policy.
    """
    d = load_table(spark, sf_dir, "documents")
    p = d.select(F.col("doc_id").alias("p_id"), F.col("text").alias("p_text"))
    planted = (
        d.join(p, (F.col("doc_id") % 7).isin(3, 5)
               & (F.col("p_id") == F.col("doc_id") - (F.col("doc_id") % 7)),
               "left")
        .select("doc_id", "lang",
                F.coalesce("p_text", "text").alias("content")))
    hashed = planted.select(
        "doc_id", "lang", F.md5("content").alias("h"),
        (F.expr(hex_hash_expr("doc_id", 4, offset=8)) % 16).alias("b"))
    idx = hashed.where(F.col("b") < 12).select("h").distinct()
    batch = (
        hashed.where(F.col("b") >= 12)
        .join(idx.withColumn("_seen", F.lit(1)), "h", "left")
        .select("doc_id", "lang", "h",
                F.col("_seen").isNotNull().alias("seen")))
    firsts = (batch.where(~F.col("seen"))
              .groupBy("h").agg(F.min("doc_id").alias("first_id")))
    return (batch.join(firsts, "h", "left")
            .groupBy("lang")
            .agg(F.count("*").alias("batch_docs"),
                 F.sum(F.when(F.col("seen"), 1).otherwise(0))
                  .alias("seen_in_index"),
                 F.sum(F.when(~F.col("seen")
                              & (F.col("doc_id") == F.col("first_id")), 1)
                       .otherwise(0)).alias("new_unique"),
                 F.sum(F.when(~F.col("seen")
                              & (F.col("doc_id") != F.col("first_id")), 1)
                       .otherwise(0)).alias("intra_batch_dups")))


@register(
    "domain_mixture_weights",
    oracle="""
    WITH dom AS (
      SELECT source, CAST(substr(source, 4) AS BIGINT) AS idx,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      FROM documents GROUP BY source
    ), tot AS (SELECT SUM(toks) AS t_all FROM dom),
    w AS (
      SELECT dom.*, tot.t_all,
             CASE WHEN idx < 5 THEN 0.10 ELSE 0.5 / 15 END AS target_w
      FROM dom CROSS JOIN tot
    )
    SELECT source, n_docs, toks,
           ROUND(CAST(toks AS DOUBLE) / t_all, 6) AS nat_share,
           ROUND(target_w, 6) AS target_w,
           ROUND(LEAST(target_w * (0.5 * t_all) / toks, 4.0), 6) AS epochs,
           CAST(ROUND(LEAST(target_w * (0.5 * t_all) / toks, 4.0)
                      * toks, 0) AS BIGINT) AS realized_toks
    FROM w
    """,
    tags=("curation", "sampling", "agg"),
)
def domain_mixture_weights(spark, sf_dir):
    """Domain-mixture reweighting arithmetic — the table every
    multi-domain training run is configured from (the DoReMi /
    Pile-style recipe): per domain, its NATURAL token share, a TARGET
    weight (here: the five priority domains get 10 % each, the long
    tail splits the rest), the resulting epoch multiplier against a
    fixed token budget (half the corpus), and the epoch CAP at 4x
    (upsampling a small domain past a few epochs just memorizes it —
    the standard data-constrained-scaling guardrail).  ``epochs < 1``
    is downsampling, ``> 1`` upsampling, ``= 4`` a budget the target
    weight cannot actually fill.

    Scale: one aggregation to DOMAIN granularity (map-side token
    counting in the scan projection), a 1-row total cross-joined
    back, pure arithmetic after — domains are dozens-to-hundreds, so
    every post-agg row count is trivially bounded.

    Determinism: integer token counts; shares/epochs are single
    divisions rounded to 6; realized_toks rounds half-away on an
    exact product of a capped rational and an integer.
    """
    d = load_table(spark, sf_dir, "documents")
    dom = (d.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.size(F.split("text", " "))).cast("long")
                 .alias("toks")))
    tot = dom.agg(F.sum("toks").alias("t_all"))
    idx = F.substring("source", 4, 10).cast("long")
    target_w = F.when(idx < 5, F.lit(0.10)).otherwise(F.lit(0.5 / 15))
    epochs = F.least(target_w * (0.5 * F.col("t_all")) / F.col("toks"),
                     F.lit(4.0))
    return (dom.crossJoin(F.broadcast(tot))  # bounded: 1-row total
            .select("source", "n_docs", "toks",
                    F.round(F.col("toks").cast("double") / F.col("t_all"), 6)
                     .alias("nat_share"),
                    F.round(target_w, 6).alias("target_w"),
                    F.round(epochs, 6).alias("epochs"),
                    F.round(epochs * F.col("toks"), 0).cast("long")
                     .alias("realized_toks")))


@register(
    "temporal_embargo_split",
    oracle="""
    WITH marked AS (
      SELECT o_orderpriority AS priority,
             CASE
               WHEN o_orderdate < TIMESTAMP '1999-01-01' - INTERVAL 30 DAY
                 THEN 'train'
               WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 'embargo'
               ELSE 'test'
             END AS split
      FROM orders
    )
    SELECT priority,
           CAST(COUNT(*) FILTER (WHERE split = 'train') AS BIGINT)
             AS n_train,
           CAST(COUNT(*) FILTER (WHERE split = 'embargo') AS BIGINT)
             AS n_embargo,
           CAST(COUNT(*) FILTER (WHERE split = 'test') AS BIGINT)
             AS n_test,
           ROUND(CAST(COUNT(*) FILTER (WHERE split = 'embargo') AS DOUBLE)
                 / COUNT(*), 6) AS embargo_frac
    FROM marked GROUP BY priority
    """,
    tags=("curation", "timeseries", "agg"),
)
def temporal_embargo_split(spark, sf_dir):
    """Purged/embargoed temporal split — the leakage-safe train/test
    cut for time-ordered data (de Prado's purging recipe, and the
    twin of ``grouped_split_no_leakage``'s entity-keyed split): train
    strictly before T − 30 d, test at/after T, and a 30-day EMBARGO
    band dropped entirely, so any label or feature computed over a
    trailing window (a 30-day rolling aggregate, a next-30-day
    outcome) cannot straddle the boundary.  Reported per order
    priority so a skewed class's embargo loss is visible.

    Scale: one scan, a map-side 3-way CASE on the timestamp (the
    split predicate prunes date-partitioned files on both arms), one
    partial-aggregable groupBy to class granularity.  No shuffle of
    row-level data beyond the class-keyed count merge.

    Determinism: timestamp compares and integer counts; one rounded
    fraction.
    """
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("timestamp")
    lo = cut - F.expr("INTERVAL 30 DAY")
    split = (F.when(F.col("o_orderdate") < lo, "train")
             .when(F.col("o_orderdate") < cut, "embargo")
             .otherwise("test"))
    return (o.select(F.col("o_orderpriority").alias("priority"),
                     split.alias("split"))
            .groupBy("priority")
            .agg(F.count_if(F.col("split") == "train").alias("n_train"),
                 F.count_if(F.col("split") == "embargo").alias("n_embargo"),
                 F.count_if(F.col("split") == "test").alias("n_test"),
                 F.round(F.count_if(F.col("split") == "embargo")
                          .cast("double") / F.count("*"), 6)
                  .alias("embargo_frac")))


_WIN_W = 4       # winnowing window (fingerprint every w consecutive grams)
_WIN_MIN = 10    # report pairs sharing at least this many fingerprints
_WIN_DF = 10     # boilerplate cap: drop fingerprints in > df docs
_POS_BITS = 131072  # 2^17 — pos packs below the hash in the argmin code


@register(
    "winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, i AS pos,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
    ), hashed AS (
      SELECT doc_id, pos, {hex_hash_expr("g", 6)} AS h FROM grams
    ), codes AS (
      SELECT doc_id, pos, np,
             MIN(h * {_POS_BITS} + pos) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS code
      FROM (SELECT *, MAX(pos) OVER (PARTITION BY doc_id) AS np FROM hashed)
    ), fps AS (
      SELECT DISTINCT doc_id, code // {_POS_BITS} AS h
      FROM codes WHERE pos <= np - {_WIN_W - 1}
    ), df AS (SELECT h, COUNT(*) AS d FROM fps GROUP BY h),
    keep AS (SELECT fps.doc_id, fps.h FROM fps JOIN df USING (h)
             WHERE df.d <= {_WIN_DF})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= {_WIN_MIN}
    """,
    tags=("dedup", "curation", "window", "lsh"),
    unique_docs_guard=True,
)
def winnowing_fingerprints(spark, sf_dir, docs=None):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's
    MOSS algorithm): hash every 3-token gram, slide a window of
    {_WIN_W} consecutive gram hashes, keep each window's MINIMUM —
    the guarantee is that any shared run of ≥ w+k−1 tokens yields at
    least one shared fingerprint, at ~1/w the storage of all grams.
    Pairs sharing ≥ {_WIN_MIN} selected fingerprints are reported —
    the plagiarism/near-copy detector between the gram-exact
    (``exact_substring_spans``) and sketch (MinHash) extremes.

    Scale: gram hashing and the argmin are per-document windows (one
    doc_id-keyed shuffle, no joins until selection shrinks each doc
    to ~n/w fingerprints); the document-frequency boilerplate cap
    drops hot fingerprints BEFORE the inverted-index self-join, the
    same skew guard as ``exact_substring_spans``; pair counting is
    the equi join of the capped fingerprint lists — co-occurring
    fingerprints only, never doc x doc.

    Determinism: the window argmin packs (hash, pos) into one integer
    (hash·2^17 + pos — docs are bounded at 2^17 grams), so ties break
    leftmost; md5-derived hashes, integer counts, integer threshold.
    """
    from pyspark.sql import Window as W

    d = docs if docs is not None \
        else unique_documents(load_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", F.split("text", " ").alias("t"))
    grams = t.select(
        "doc_id",
        F.posexplode(F.expr(
            "CASE WHEN size(t) >= 3 THEN transform("
            "sequence(1, size(t) - 2), "
            "i -> concat(t[i-1], ' ', t[i], ' ', t[i+1]))"
            " ELSE array() END")).alias("pos0", "g"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    hashed = grams.select(
        "doc_id", "pos", F.expr(hex_hash_expr("g", 6)).alias("h"))
    wdoc = W.partitionBy("doc_id")
    # total-order: pos is unique per doc_id — posexplode over the
    # identity-deduped documents (unique_documents upstream)
    wmin = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    codes = (hashed
             .withColumn("np", F.max("pos").over(wdoc))
             .withColumn("code",
                         F.min(F.col("h") * _POS_BITS + F.col("pos"))
                          .over(wmin)))
    fps = (codes.filter(F.col("pos") <= F.col("np") - (_WIN_W - 1))
           .select("doc_id", (F.col("code") / _POS_BITS).cast("long")
                   .alias("h"))
           .distinct())
    df_cap = fps.groupBy("h").agg(F.count("*").alias("d"))
    keep = (fps.join(df_cap, "h").filter(F.col("d") <= _WIN_DF)
            .select("doc_id", "h"))
    a = keep.select(F.col("doc_id").alias("doc_a"), "h")
    b = keep.select(F.col("doc_id").alias("doc_b"), "h")
    return (a.join(b, "h")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= _WIN_MIN))


@register(
    "stratified_kfold_assign",
    oracle=f"""
    WITH folded AS (
      SELECT c_mktsegment AS segment,
             {hex_hash_expr("c_custkey", 4, offset=12)} % 5 AS fold
      FROM customer
    ), seg AS (
      SELECT segment, COUNT(*) AS n_seg FROM folded GROUP BY segment
    )
    SELECT f.segment, CAST(f.fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) / seg.n_seg, 6) AS seg_share
    FROM folded f JOIN seg ON seg.segment = f.segment
    GROUP BY f.segment, f.fold, seg.n_seg
    """,
    tags=("curation", "sampling", "agg"),
)
def stratified_kfold_assign(spark, sf_dir):
    """Stratified k-fold assignment (k=5) — the deterministic
    cross-validation splitter: each entity hashes into a fold (a
    salted md5, so folds are stable under repartition, rerun, and
    corpus growth — the same property ``grouped_split_no_leakage``
    relies on), reported as the per-stratum fold-share table the
    balance check reads (each share should be ≈ 0.2; a skewed
    stratum's deviation is visible per fold).

    Scale: the fold id is a map-side hash in the scan projection; the
    report is one partial-aggregable groupBy to (stratum, fold)
    granularity joined against stratum totals — both sides
    value-granular.  Assignment never shuffles row data at all.

    Determinism: md5 arithmetic (offset 12 — independent of every
    other salt in the registry), integer counts, one rounded share.
    """
    cust = load_table(spark, sf_dir, "customer")
    folded = cust.select(
        F.col("c_mktsegment").alias("segment"),
        (F.expr(hex_hash_expr("c_custkey", 4, offset=12)) % 5).alias("fold"))
    seg = folded.groupBy("segment").agg(F.count("*").alias("n_seg"))
    return (folded.groupBy("segment", "fold")
            .agg(F.count("*").alias("n"))
            .join(seg, "segment")
            .select("segment", F.col("fold").cast("long").alias("fold"),
                    "n",
                    F.round(F.col("n").cast("double") / F.col("n_seg"), 6)
                     .alias("seg_share")))


# the funnel's SIGNAL CTEs (winnowing dup pairs, bigram-LM NLL + p95,
# per-source quality percentile), shared verbatim by the v2 oracle and
# the v3 oracle in curation6_q (which appends a classifier gate)
FUNNEL_SIGNAL_CTES = f"""toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, i AS pos,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
    ), whashed AS (
      SELECT doc_id, pos, {hex_hash_expr("g", 6)} AS h FROM grams
    ), codes AS (
      SELECT doc_id, pos, np,
             MIN(h * {_POS_BITS} + pos) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS code
      FROM (SELECT *, MAX(pos) OVER (PARTITION BY doc_id) AS np FROM whashed)
    ), fps AS (
      SELECT DISTINCT doc_id, code // {_POS_BITS} AS h
      FROM codes WHERE pos <= np - {_WIN_W - 1}
    ), fdf AS (SELECT h, COUNT(*) AS d FROM fps GROUP BY h),
    keep_fp AS (SELECT fps.doc_id, fps.h FROM fps JOIN fdf USING (h)
                WHERE fdf.d <= {_WIN_DF}),
    dup_drop AS (
      SELECT DISTINCT b.doc_id AS doc_id
      FROM keep_fp a JOIN keep_fp b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= {_WIN_MIN}
    ), big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
    ), uni AS (SELECT w1 AS w, COUNT(*) AS c1 FROM big GROUP BY 1),
    vocab AS (SELECT COUNT(DISTINCT w) AS v FROM (
        SELECT UNNEST(t) AS w FROM toks)),
    bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
    nll AS (
      SELECT big.doc_id, COUNT(*) AS n_bigrams,
             ROUND(SUM(-log2((bc.c12 + 1.0) / (uni.c1 + vocab.v)))
                   / COUNT(*), 6) AS avg_nll
      FROM big JOIN bc ON bc.w1 = big.w1 AND bc.w2 = big.w2
      JOIN uni ON uni.w = big.w1 CROSS JOIN vocab
      GROUP BY big.doc_id
    ), p95 AS (
      SELECT quantile_cont(avg_nll, 0.95) AS p
      FROM nll WHERE n_bigrams >= 5
    ), qscore AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY
               ROUND(CAST(len(list_distinct(string_split(text, ' ')))
                          AS DOUBLE) / len(string_split(text, ' ')), 6),
               doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ), pct AS (
      SELECT doc_id, source,
             ROUND(CAST(rn - 1 AS DOUBLE) / (n - 1), 6) AS pct
      FROM qscore
    )"""


@register(
    "curation_funnel_v2",
    oracle=f"""
    WITH {FUNNEL_SIGNAL_CTES}, funnel AS (
      SELECT p.doc_id, p.source, p.pct,
             (d.doc_id IS NULL) AS pass_dedup,
             (n.n_bigrams IS NULL OR n.n_bigrams < 5
              OR n.avg_nll <= p95.p) AS pass_ppl
      FROM pct p
      LEFT JOIN dup_drop d ON d.doc_id = p.doc_id
      LEFT JOIN nll n ON n.doc_id = p.doc_id
      CROSS JOIN p95
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(*) FILTER (WHERE pass_dedup) AS BIGINT)
             AS n_after_dedup,
           CAST(COUNT(*) FILTER (WHERE pass_dedup AND pass_ppl) AS BIGINT)
             AS n_after_ppl,
           CAST(COUNT(*) FILTER (WHERE pass_dedup AND pass_ppl
                                   AND pct >= 0.4) AS BIGINT)
             AS n_after_quality
    FROM funnel GROUP BY source
    """,
    tags=("curation", "pipeline", "dedup", "quality"),
    unique_docs_guard=True,
)
def curation_funnel_v2(spark, sf_dir):
    """The round-9 curation ops COMPOSED into one funnel — measure
    once, gate in sequence, report per-source survival at each stage
    (the audit table a 100 TB curation run signs off on before
    committing a corpus): (1) winnowing near-dup drop (min-id
    survivor per reported pair), (2) perplexity gate (self-trained
    bigram LM; drop the worst 5 % by avg NLL — short unscored docs
    pass), (3) within-source quality percentile ≥ 0.4 (every source
    keeps its own top 60 %, so no domain is silently wiped by a
    global threshold).

    Scale: each signal is computed ONCE over the corpus (the
    winnowing fingerprint windows, the vocab-granular LM counts, the
    per-source rank) and the gates compose as doc_id-keyed
    anti/left joins — no gate rescans raw text, and the drop set
    carries no broadcast hint (it is O(N·dup_rate) by design).  The
    funnel counts are one partial-aggregable rollup.

    Determinism: inherits each component's rules (packed-argmin
    fingerprints, rounded NLL, rank percentiles); the p95 threshold
    uses the same interpolated-percentile parity as
    ``percentile_cont_by_group``.
    """
    from .quality_q import doc_avg_nll, score_percentile_by_source

    # ONE identity-dedup pass shared by every signal branch (r16,
    # guide §2.4): uncut, each of the three signals re-ran the
    # unique_documents window over its own corpus scan
    d = stage_table(unique_documents(load_table(spark, sf_dir,
                                                "documents")),
                    label="unique_docs")
    raw = d.select("doc_id", "source")
    dup_drop = (winnowing_fingerprints(spark, sf_dir, docs=d)
                .select(F.col("doc_b").alias("doc_id")).distinct()
                .withColumn("_dup", F.lit(1)))
    nll = doc_avg_nll(spark, sf_dir, docs=d)
    p95 = (nll.filter(F.col("n_bigrams") >= 5)
           .agg(F.percentile("avg_nll", 0.95).alias("p")))
    pct = score_percentile_by_source(spark, sf_dir,
                                     docs=d).select("doc_id", "pct")
    funnel = (raw
              .join(dup_drop, "doc_id", "left")
              .join(nll, "doc_id", "left")
              .join(pct, "doc_id")
              .crossJoin(F.broadcast(p95))  # bounded: 1-row threshold
              .select("source", "pct",
                      F.col("_dup").isNull().alias("pass_dedup"),
                      (F.col("n_bigrams").isNull()
                       | (F.col("n_bigrams") < 5)
                       | (F.col("avg_nll") <= F.col("p")))
                      .alias("pass_ppl")))
    return funnel.groupBy("source").agg(
        F.count("*").alias("n_raw"),
        F.count_if(F.col("pass_dedup")).alias("n_after_dedup"),
        F.count_if(F.col("pass_dedup") & F.col("pass_ppl"))
         .alias("n_after_ppl"),
        F.count_if(F.col("pass_dedup") & F.col("pass_ppl")
                   & (F.col("pct") >= 0.4)).alias("n_after_quality"))


@register(
    "source_quality_leaderboard",
    oracle=f"""
    WITH {FUNNEL_SIGNAL_CTES}, per AS (
      SELECT d.source, d.doc_id,
             (dd.doc_id IS NOT NULL) AS is_dup,
             n.avg_nll, n.n_bigrams
      FROM documents d
      LEFT JOIN dup_drop dd ON dd.doc_id = d.doc_id
      LEFT JOIN nll n ON n.doc_id = d.doc_id)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(CASE WHEN is_dup THEN 1.0 ELSE 0.0 END), 4)
             AS dup_rate,
           CAST(COUNT(*) FILTER (WHERE n_bigrams >= 5) AS BIGINT)
             AS n_scored,
           ROUND(COALESCE(AVG(avg_nll) FILTER (WHERE n_bigrams >= 5),
                          0.0), 4) AS mean_nll
    FROM per GROUP BY source
    """,
    tags=("curation", "quality", "agg"),
    unique_docs_guard=True,
)
def source_quality_leaderboard(spark, sf_dir):
    """The per-SOURCE quality leaderboard — the table a data-sourcing
    team reads to decide which feeds to drop, renegotiate, or
    up-weight: near-duplicate rate (winnowing fingerprints — the
    funnel's dedup signal aggregated to source granularity instead of
    gated per doc) and mean bigram-LM negative log-likelihood over
    scorable docs (lower = more natural text).  Signals are the SAME
    CTEs the curation funnel consumes, so the leaderboard and the
    funnel can never disagree about a source.

    Scale: signal computation is the funnel's (computed once,
    doc_id-keyed joins); the leaderboard adds one |sources|-row
    aggregate.  Sources with no scorable docs report mean_nll 0.0
    identically in both engines.
    """
    from .quality_q import doc_avg_nll

    # shared identity-dedup stage across both signals (r16, guide §2.4)
    d = stage_table(unique_documents(load_table(spark, sf_dir,
                                                "documents")),
                    label="unique_docs")
    dup_drop = (winnowing_fingerprints(spark, sf_dir, docs=d)
                .select(F.col("doc_b").alias("doc_id")).distinct()
                .withColumn("_dup", F.lit(1)))
    nll = doc_avg_nll(spark, sf_dir, docs=d)
    per = (d.select("source", "doc_id")
           .join(dup_drop, "doc_id", "left")
           .join(nll, "doc_id", "left"))
    scored = F.col("n_bigrams") >= 5
    return (per.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg(F.when(F.col("_dup").isNotNull(), 1.0)
                               .otherwise(0.0)), 4).alias("dup_rate"),
                 F.sum(F.when(scored, 1).otherwise(0)).cast("long")
                 .alias("n_scored"),
                 F.round(F.coalesce(
                     F.avg(F.when(scored, F.col("avg_nll"))), F.lit(0.0)),
                     4).alias("mean_nll")))
