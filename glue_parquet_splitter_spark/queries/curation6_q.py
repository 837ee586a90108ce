"""Curation wave 6 (round 10): the post-selection steps of an LLM
training-data pipeline — packing curated documents into fixed-length
training sequences (VERDICT r9 #5), chunking long documents with
overlap and composing chunk-level dedup back to a document survivor
map (VERDICT r9 #6).

Reference anchor: the reference pipeline stops at per-key parquet
fan-out (src/Split/parquet-splitter.py:166-168); everything here is
north-star surface with no reference analogue.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.text import unique_documents
from ..staging import stage_table
from . import register

# ---- sequence packing -------------------------------------------------
_PACK_CAP = 128     # tokens per training sequence (bin capacity)
_PACK_BUCKET = 32   # length-bucket width in tokens
_PACK_SALTS = 4     # parallelism salt inside each length bucket

# ---- chunking ---------------------------------------------------------
_CHUNK_W = 120      # chars per chunk
_CHUNK_S = 80       # stride (overlap = W - S = 40 chars)
_TCHUNK_W = 8       # token-chunk width (dedup composition)
_TCHUNK_S = 4       # token-chunk stride
_DUP_FRAC = 0.5     # drop a doc when >= half its chunks are copies


# the sharded-FFD recursive CTEs (seq, pack) — shared by the packing
# query's oracle and the fill-report audit
_PACK_ORACLE_CTES = f"""
    WITH RECURSIVE seq AS (
      SELECT doc_id, toks,
             toks // {_PACK_BUCKET} AS bucket,
             doc_id % {_PACK_SALTS} AS salt,
             row_number() OVER (
               PARTITION BY toks // {_PACK_BUCKET}, doc_id % {_PACK_SALTS}
               ORDER BY toks DESC, doc_id) AS rn
      FROM (SELECT doc_id, len(string_split(text, ' ')) AS toks
            FROM documents WHERE text IS NOT NULL)
    ), pack AS (
      SELECT bucket, salt, rn, doc_id, toks,
             CAST(0 AS BIGINT) AS bin_idx,
             [{_PACK_CAP} - toks] AS resid
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT bucket, salt, rn, doc_id, toks,
             CASE WHEN fit = 0 THEN CAST(len(resid) AS BIGINT)
                  ELSE CAST(fit - 1 AS BIGINT) END AS bin_idx,
             CASE WHEN fit = 0
                  THEN list_append(resid, {_PACK_CAP} - toks)
                  ELSE resid[1:fit-1] || [resid[fit] - toks]
                       || resid[fit+1:]
             END AS resid
      FROM (
        SELECT s.bucket, s.salt, s.rn, s.doc_id, s.toks, p.resid,
               list_position(list_transform(p.resid,
                 r -> r >= s.toks), true) AS fit
        FROM pack p JOIN seq s
          ON s.bucket = p.bucket AND s.salt = p.salt AND s.rn = p.rn + 1
      )
    )
"""


@register(
    "sequence_packing_ffd",
    oracle=_PACK_ORACLE_CTES + """
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(salt AS BIGINT) AS salt, bin_idx,
           CAST(toks AS BIGINT) AS toks
    FROM pack
    """,
    tags=("curation", "packing", "udf"),
)
def sequence_packing_ffd(spark, sf_dir):
    """Pack documents into fixed-capacity training sequences by
    first-fit-decreasing — the step every LLM pipeline runs after
    token-budget selection (`token_budget_head_selection`): bin docs
    into 128-token sequences so padding waste is minimal.

    Deterministic recipe: docs are partitioned into (length-bucket,
    doc_id-salt) groups; WITHIN each group, items sorted by
    (toks DESC, doc_id) go to the LOWEST-indexed open bin with enough
    residual capacity, else open a new bin.  Both engines run the
    identical greedy (Spark in a per-group pandas loop, DuckDB as a
    per-group recursive CTE whose per-item step does the same
    first-fit probe on a residual list), so bin assignments hash-match
    exactly — pure integer arithmetic, id tie-breaks, no floats.

    Scale (the VERDICT r9 #5 contract — no global sort): packing is a
    sequential algorithm, so the scalable form SHARDS it — a salted
    length-bucket repartition bounds every group, per-group FFD state
    is O(open bins), and bins are group-namespaced (bucket, salt,
    bin_idx), making the pack embarrassingly parallel.  At 100 TB the
    salt count scales with corpus/target-group-rows (fixed at
    4 here for oracle determinism); the only orderings are
    group-local (inside applyInPandas); the one shuffle is the hash
    exchange on (bucket, salt).  The sharding's measured tradeoff
    (tests/test_scale_smoke.py, 1M docs / 256 salts): the small-length
    bucket packs >90% fill, but a length-HOMOGENEOUS bucket whose
    lengths sit in (cap/2, cap] holds one doc per bin (~62% there,
    ~74% overall) — a production pack that needs those bins full
    routes the mid-length bucket's leftovers through a second
    small-doc backfill pass; the fill accounting here is the audit
    that decides it.

    Plan pin (tests/test_plans.py): FlatMapGroupsInPandas over a hash
    exchange; NO rangepartitioning / single-partition exchange.
    """
    d = load_table(spark, sf_dir, "documents")
    # NULL text has no tokens to pack — excluded in both engines
    # (found by scripts/fuzz_oracle.py: int(NaN) crash in the pandas FFD)
    docs = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("toks"))
    return ffd_pack(docs)


def ffd_pack(docs, cap: int = _PACK_CAP, bucket_w: int = _PACK_BUCKET,
             salts: int = _PACK_SALTS):
    """The sharded FFD operator behind ``sequence_packing_ffd``:
    ``docs(doc_id, toks)`` → per-doc bin assignment, grouped by
    (length bucket, doc_id salt).  ``salts`` is the scale knob — pick
    it so corpus_rows / (n_buckets * salts) fits a pandas group (the
    1M-doc smoke in tests/test_scale_smoke.py runs salts=256)."""
    docs = (docs
            .withColumn("bucket", F.expr(f"toks div {bucket_w}"))
            .withColumn("salt", F.col("doc_id") % salts))

    def _ffd(pdf):
        pdf = pdf.sort_values(["toks", "doc_id"],
                              ascending=[False, True])
        resid: list[int] = []
        assigned: list[int] = []
        for t in pdf["toks"]:
            t = int(t)
            for i, r in enumerate(resid):
                if r >= t:          # first fit: lowest-indexed open bin
                    resid[i] = r - t
                    assigned.append(i)
                    break
            else:
                resid.append(cap - t)
                assigned.append(len(resid) - 1)
        pdf = pdf.assign(bin_idx=assigned)
        return pdf[["doc_id", "bucket", "salt", "bin_idx", "toks"]]

    return docs.groupBy("bucket", "salt").applyInPandas(
        _ffd,
        schema="doc_id long, bucket long, salt long, bin_idx long, "
               "toks long")


@register(
    "doc_chunk_fixed_stride",
    oracle=f"""
    SELECT doc_id,
           CAST(s // {_CHUNK_S} AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(length(substr(text, CAST(s + 1 AS INT), {_CHUNK_W}))
                AS BIGINT) AS chunk_len,
           md5(substr(text, CAST(s + 1 AS INT), {_CHUNK_W})) AS chunk_md5
    FROM documents, UNNEST(range(0, n_chars, {_CHUNK_S})) AS u(s)
    """,
    tags=("curation", "chunking", "string"),
)
def doc_chunk_fixed_stride(spark, sf_dir):
    """Fixed-window, fixed-stride document chunking with overlap — the
    unit transform RAG indexing and long-doc pretraining both run
    before any chunk-level operator: window 120 chars, stride
    80 (overlap 40), final partial chunk
    kept.  Emits deterministic chunk spans plus an md5 content
    fingerprint per chunk.

    Scale: pure map-side — `explode(sequence(...))` fans each doc out
    to ceil(n_chars/stride) rows with NO shuffle at all; chunk count
    and text bytes grow by the overlap factor W/S (~1.5x here), the
    standard chunking overhead.  The md5 is computed once per chunk
    JVM-side.  100 TB of docs chunk in one embarrassingly parallel
    scan.
    """
    d = load_table(spark, sf_dir, "documents")
    s = F.col("s")
    chunk = F.substring(F.col("text"), (s + 1).cast("int"), _CHUNK_W)
    # empty/NULL docs chunk to nothing; without the filter an ANSI
    # sequence(0, -1) raises on n_chars = 0 (found by fuzz_oracle.py),
    # while the oracle's range(0, 0) is just empty
    d = d.filter(F.col("n_chars") >= 1)
    return (d.select(
        "doc_id", "text",
        F.explode(F.sequence(
            F.lit(0).cast("long"), F.col("n_chars") - 1,
            F.lit(_CHUNK_S).cast("long"))).alias("s"))
        .select(
            "doc_id",
            F.expr(f"s div {_CHUNK_S}").alias("chunk_id"),
            s.alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5")))


@register(
    "chunk_dedup_survivor_map",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), chunks AS (
      SELECT doc_id,
             md5(array_to_string(
               tk[CAST(s + 1 AS INT):CAST(s + {_TCHUNK_W} AS INT)],
               ' ')) AS h
      FROM t, UNNEST(range(0, len(tk), {_TCHUNK_S})) AS u(s)
    ), owners AS (
      SELECT h, MIN(doc_id) AS canon, COUNT(DISTINCT doc_id) AS nd
      FROM chunks GROUP BY h
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN o.nd >= 2 AND c.doc_id <> o.canon
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           ROUND(SUM(CASE WHEN o.nd >= 2 AND c.doc_id <> o.canon
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
             AS dup_frac,
           SUM(CASE WHEN o.nd >= 2 AND c.doc_id <> o.canon
                    THEN 1 ELSE 0 END) * 1.0 / COUNT(*) >= {_DUP_FRAC}
             AS drop_doc
    FROM chunks c JOIN owners o USING (h)
    GROUP BY c.doc_id
    """,
    tags=("curation", "dedup", "chunking"),
)
def chunk_dedup_survivor_map(spark, sf_dir):
    """Chunk-level dedup composed back to a DOCUMENT survivor map
    (VERDICT r9 #6): docs are cut into overlapping token chunks
    (window 8, stride 4), each chunk fingerprinted,
    and a chunk counts as a DUPLICATE when its fingerprint occurs in
    >= 2 distinct docs and this doc is not the canonical (lowest
    doc_id) owner.  A doc is dropped when >= 50% of its
    chunks are copies of earlier docs — the chunk-granular analogue of
    `interdoc_dup_gram_fraction`, and the form that catches partial
    plagiarism whole-doc minhash misses.

    Scale: the chunk fan-out is map-side; then exactly two key-granular
    shuffles — the fingerprint groupBy (inverted index: owners table
    is one row per DISTINCT chunk hash) and the doc_id re-aggregation.
    The owners join is hash-equi on the fingerprint with NO broadcast
    hint: the owners side is O(distinct chunks) — corpus-sized — so
    AQE/the size threshold must decide (the r9 drop-set lesson).
    Survivorship is decided per doc from its own chunk counters; no
    pair materialization, nothing quadratic.
    """
    d = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    chunks = (d.select("doc_id", tk.alias("tk"))
              .select("doc_id", F.explode(F.sequence(
                  F.lit(0), F.size("tk") - 1,
                  F.lit(_TCHUNK_S))).alias("s"), "tk")
              .select("doc_id",
                      F.md5(F.array_join(
                          F.slice("tk", F.col("s") + 1, _TCHUNK_W),
                          " ")).alias("h")))
    owners = chunks.groupBy("h").agg(
        F.min("doc_id").alias("canon"),
        F.count_distinct("doc_id").alias("nd"))
    dup = F.when((F.col("nd") >= 2) & (F.col("doc_id") != F.col("canon")),
                 1).otherwise(0)
    return (chunks.join(owners, "h")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_chunks"),
                 F.sum(dup).cast("long").alias("n_dup_chunks"))
            .select("doc_id", "n_chunks", "n_dup_chunks",
                    F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 4)
                    .alias("dup_frac"),
                    (F.col("n_dup_chunks") / F.col("n_chunks")
                     >= _DUP_FRAC).alias("drop_doc")))


# ---- hash-n-gram linear classifier (fastText-style) -------------------
from .curation4_q import hex_hash_expr  # noqa: E402

_CLF_D = 512          # hashing-trick feature buckets
_CLF_SCALE = 1_000_000  # micro-unit weight quantization (int math)

# identical SQL on both engines: hashed feature id of a gram string g
_CLF_H = f"(({hex_hash_expr('g', 5)}) % {_CLF_D})"


def _clf_sql_ctes() -> str:
    """The classifier pipeline as engine-portable SQL CTEs ending in
    ``clf(doc_id, is_en, score_int, pred_en)`` — shared verbatim by the
    classifier query's oracle and the funnel-v3 oracle."""
    return f"""
    ctoks AS (
      SELECT doc_id, lang = 'en' AS is_en, string_split(text, ' ') AS t
      FROM documents
    ), cgrams AS (
      SELECT doc_id, UNNEST(t) AS g FROM ctoks
      UNION ALL
      SELECT doc_id, t[i] || '_' || t[i+1] AS g
      FROM ctoks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ), cfeat AS (
      SELECT doc_id, {_CLF_H} AS h, COUNT(*) AS cnt
      FROM cgrams GROUP BY doc_id, {_CLF_H}
    ), clab AS (
      SELECT f.doc_id, f.h, f.cnt, d.is_en
      FROM cfeat f JOIN ctoks d ON d.doc_id = f.doc_id
    ), ccnt AS (
      SELECT h,
             SUM(CASE WHEN is_en THEN cnt ELSE 0 END) AS pos_h,
             SUM(CASE WHEN is_en THEN 0 ELSE cnt END) AS neg_h
      FROM clab GROUP BY h
    ), ctot AS (
      SELECT SUM(pos_h) AS pos_tot, SUM(neg_h) AS neg_tot FROM ccnt
    ), cw AS (
      SELECT h,
             CAST(ROUND((ln(CAST(pos_h + 1 AS DOUBLE)
                            / (pos_tot + {_CLF_D}))
                         - ln(CAST(neg_h + 1 AS DOUBLE)
                              / (neg_tot + {_CLF_D})))
                        * {_CLF_SCALE}) AS BIGINT) AS w_int
      FROM ccnt CROSS JOIN ctot
    ), cbias AS (
      -- one-class corpora (a degenerate tiny draw: every surviving doc
      -- en, or none) make the raw prior ln(n_en/n_non) divide by zero
      -- / ln(0) — found by the seed-15 --tiny roll (r15).  Laplace-
      -- smooth the prior ONLY in the degenerate case so every
      -- two-class corpus keeps its exact committed value
      SELECT CAST(ROUND(ln(CASE WHEN n_en = 0 OR n_non = 0
                                THEN (n_en + 1) / (n_non + 1)
                                ELSE n_en / n_non END)
                        * {_CLF_SCALE}) AS BIGINT) AS b_int
      FROM (SELECT CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END)
                        AS DOUBLE) AS n_en,
                   CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END)
                        AS DOUBLE) AS n_non
            FROM ctoks) cprior
    ), clf AS (
      SELECT l.doc_id, MIN(l.is_en) AS is_en,
             SUM(l.cnt * w.w_int) + MIN(cbias.b_int) AS score_int,
             SUM(l.cnt * w.w_int) + MIN(cbias.b_int) > 0 AS pred_en
      FROM clab l JOIN cw w USING (h) CROSS JOIN cbias
      GROUP BY l.doc_id
    )"""


def _clf_scores(spark, sf_dir, docs=None):
    """(doc_id, is_en, score_int, pred_en) — the Spark twin of
    ``_clf_sql_ctes``, shared by the classifier query and funnel v3.
    ``docs`` = an optional pre-staged unique_documents table (the
    composed funnels pass one shared stage)."""
    d = docs if docs is not None \
        else unique_documents(load_table(spark, sf_dir, "documents"))
    docs = d.select("doc_id", (F.col("lang") == "en").alias("is_en"),
                    F.split("text", " ").alias("t"))
    # ONE explode over unigrams ++ bigrams with the label carried
    # through the rows (vs the first cut's union of two scans plus a
    # doc_id re-join to attach is_en): one corpus scan and one fewer
    # shuffle join in the inference path
    # the feature table feeds BOTH the weight training aggs and the
    # inference join; without the lineage cut the corpus explode +
    # md5 hashing run once per consumer (guide §3.3 — materialize a
    # reused intermediate).  stage_table, not .cache(): the cache
    # manager plan-matches across fn() calls (cross-run reuse the
    # bench bans); a stage is instance-scoped — localCheckpoint on
    # local masters, a durable stage on clusters (staging.py).
    # r15: classifier signal write 5.7 s -> ~2.5 s at sf0.1.
    lab = stage_table(docs.select(
        "doc_id", "is_en",
        F.explode(F.expr(
            "concat(t, zip_with(slice(t, 1, size(t) - 1),"
            " slice(t, 2, size(t) - 1),"
            " (a, b) -> concat(a, '_', b)))")).alias("g"))
        .select("doc_id", "is_en", F.expr(_CLF_H).alias("h"))
        .groupBy("doc_id", "is_en", "h").agg(F.count("*").alias("cnt")),
        label="clf_features")
    ccnt = lab.groupBy("h").agg(
        F.sum(F.when(F.col("is_en"), F.col("cnt")).otherwise(0))
         .alias("pos_h"),
        F.sum(F.when(F.col("is_en"), 0).otherwise(F.col("cnt")))
         .alias("neg_h"))
    ctot = ccnt.agg(F.sum("pos_h").alias("pos_tot"),
                    F.sum("neg_h").alias("neg_tot"))
    w = (ccnt.crossJoin(F.broadcast(ctot))  # bounded: 1-row global totals
         .select("h", F.round(
             (F.log((F.col("pos_h") + 1).cast("double")
                    / (F.col("pos_tot") + _CLF_D))
              - F.log((F.col("neg_h") + 1).cast("double")
                      / (F.col("neg_tot") + _CLF_D)))
             * _CLF_SCALE).cast("long").alias("w_int")))
    # one-class corpora (a degenerate tiny draw) make the raw prior
    # ln(n_en/n_non) an ANSI divide-by-zero / ln(0) — found by the
    # seed-15 --tiny roll (r15).  Laplace-smooth ONLY the degenerate
    # case so every two-class corpus keeps its exact committed value
    # (mirrors the oracle's cbias CTE)
    bias = (docs.agg(
        F.sum(F.when(F.col("is_en"), 1).otherwise(0)).cast("double")
        .alias("n_en"),
        F.sum(F.when(F.col("is_en"), 0).otherwise(1)).cast("double")
        .alias("n_non"))
        .select(F.round(F.log(
            F.when((F.col("n_en") == 0) | (F.col("n_non") == 0),
                   (F.col("n_en") + 1) / (F.col("n_non") + 1))
            .otherwise(F.col("n_en") / F.col("n_non")))
            * _CLF_SCALE).cast("long").alias("b_int")))
    # bounded: weight table has at most D=512 hash-bucket rows
    return (lab.join(F.broadcast(w), "h")
            .crossJoin(F.broadcast(bias))  # bounded: 1-row bias scalar
            .groupBy("doc_id")
            .agg(F.min("is_en").alias("is_en"),
                 (F.sum(F.col("cnt") * F.col("w_int")) + F.min("b_int"))
                 .alias("score_int"))
            .select("doc_id", "is_en", "score_int",
                    (F.col("score_int") > 0).alias("pred_en")))


@register(
    "hashgram_classifier_score",
    oracle=f"""
    WITH {_clf_sql_ctes()}
    SELECT doc_id, is_en, pred_en,
           ROUND(score_int / {_CLF_SCALE}.0, 6) AS score
    FROM clf
    """,
    tags=("curation", "quality", "classifier"),
    unique_docs_guard=True,
)
def hashgram_classifier_score(spark, sf_dir):
    """fastText-style linear classifier INFERENCE over hashed n-gram
    features (VERDICT r9 #7) — the "quality classifier" stage of
    production curation funnels (CCNet / GPT-3 style): every doc's
    unigrams + adjacent bigrams are hashed into 512 buckets
    (hashing trick, md5-arithmetic so both engines agree), dotted
    against a weight table, plus a class-prior bias.  The weights are
    SELF-TRAINED from the corpus for determinism — per-bucket
    multinomial naive-Bayes log-odds of the `lang = 'en'` label (the
    stand-in for "looks like target-domain text"); the mechanics
    (hashed features, linear weights, map-side dot product) are
    exactly the production classifier's.

    Scale: featurization is map-side; training is TWO bucket-granular
    aggregations (one keyed on at most D=512 buckets, one global
    total); inference is a broadcast join of the <= 512-row weight
    table against per-doc feature counts and a partial-aggregable
    integer dot product.  Nothing is corpus x corpus; the weight
    table is CONSTANT-bounded (D), the strongest broadcast proof.

    Determinism: weights are quantized to integer micro-units
    (ROUND(ln-odds * 1e6)) so the per-doc score is an INTEGER sum —
    accumulation-order-free — and the float division/round happens
    once per doc at the end.  Ties: pred is score_int > 0 (exact
    integer compare).
    """
    return (_clf_scores(spark, sf_dir)
            .select("doc_id", "is_en", "pred_en",
                    F.round(F.col("score_int") / _CLF_SCALE, 6)
                    .alias("score")))


from .curation5_q import FUNNEL_SIGNAL_CTES, winnowing_fingerprints  # noqa: E402


@register(
    "curation_funnel_v3",
    oracle=f"""
    WITH {FUNNEL_SIGNAL_CTES}, {_clf_sql_ctes()}, funnel AS (
      SELECT p.doc_id, p.source, p.pct,
             (d.doc_id IS NULL) AS pass_dedup,
             (n.n_bigrams IS NULL OR n.n_bigrams < 5
              OR n.avg_nll <= p95.p) AS pass_ppl,
             COALESCE(c.pred_en, false) AS pass_clf
      FROM pct p
      LEFT JOIN dup_drop d ON d.doc_id = p.doc_id
      LEFT JOIN nll n ON n.doc_id = p.doc_id
      LEFT JOIN clf c ON c.doc_id = p.doc_id
      CROSS JOIN p95
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(*) FILTER (WHERE pass_dedup) AS BIGINT)
             AS n_after_dedup,
           CAST(COUNT(*) FILTER (WHERE pass_dedup AND pass_ppl) AS BIGINT)
             AS n_after_ppl,
           CAST(COUNT(*) FILTER (WHERE pass_dedup AND pass_ppl
                                   AND pass_clf) AS BIGINT)
             AS n_after_clf,
           CAST(COUNT(*) FILTER (WHERE pass_dedup AND pass_ppl
                                   AND pass_clf AND pct >= 0.4) AS BIGINT)
             AS n_after_quality
    FROM funnel GROUP BY source
    """,
    tags=("curation", "pipeline", "dedup", "quality", "classifier"),
    unique_docs_guard=True,
)
def curation_funnel_v3(spark, sf_dir):
    """The v2 funnel plus the production stage it was missing
    (VERDICT r9 #7): a hashed-n-gram linear CLASSIFIER gate between
    the perplexity filter and the quality percentile — the CCNet /
    GPT-3 pipeline shape (dedup -> LM filter -> classifier ->
    per-source selection).  Stage order and per-source survival
    counts at each of the four gates are the audit table.

    Scale: inherits v2's contract — every signal computed ONCE
    (winnowing windows, vocab-granular LM counts, <= 512-row
    classifier weights, per-source ranks), gates composed as
    doc_id-keyed left joins, no broadcast hint on the O(N dup_rate)
    drop set, and one partial-aggregable rollup at the end.  The
    classifier gate adds one broadcast join (weights are
    D-bounded) and an integer dot product — map-side against the
    feature counts.

    "Computed once" is a LOGICAL claim: in this single lazy plan the
    branches re-scan the source (~36 pruned scans at fixture scale —
    fine for an audit query).  A 100 TB funnel materializes each
    signal as a checkpoint table between stages (dedup pairs, NLL
    scores, classifier scores, percentiles) and this query becomes
    the doc_id-keyed audit join OVER those tables — the plan shape
    the gates already have.

    Determinism: each component's rules (packed-argmin fingerprints,
    rounded NLL, integer micro-unit weights, rank percentiles).
    """
    from .quality_q import doc_avg_nll, score_percentile_by_source

    # ONE identity-dedup pass shared by all four signal branches
    # (VERDICT r15 #4, guide §2.4): uncut, each signal re-ran the
    # unique_documents window over its own corpus scan — ~30 pruned
    # scans at fixture scale, 4 identical dedup windows
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
    clf = _clf_scores(spark, sf_dir, docs=d).select("doc_id", "pred_en")
    funnel = (raw
              .join(dup_drop, "doc_id", "left")
              .join(nll, "doc_id", "left")
              .join(clf, "doc_id", "left")
              .join(pct, "doc_id")
              .crossJoin(F.broadcast(p95))  # bounded: 1-row threshold
              .select("source", "pct",
                      F.col("_dup").isNull().alias("pass_dedup"),
                      (F.col("n_bigrams").isNull()
                       | (F.col("n_bigrams") < 5)
                       | (F.col("avg_nll") <= F.col("p")))
                      .alias("pass_ppl"),
                      F.coalesce(F.col("pred_en"), F.lit(False))
                      .alias("pass_clf")))
    return funnel.groupBy("source").agg(
        F.count("*").alias("n_raw"),
        F.count_if(F.col("pass_dedup")).alias("n_after_dedup"),
        F.count_if(F.col("pass_dedup") & F.col("pass_ppl"))
         .alias("n_after_ppl"),
        F.count_if(F.col("pass_dedup") & F.col("pass_ppl")
                   & F.col("pass_clf")).alias("n_after_clf"),
        F.count_if(F.col("pass_dedup") & F.col("pass_ppl")
                   & F.col("pass_clf") & (F.col("pct") >= 0.4))
         .alias("n_after_quality"))


@register(
    "curation_funnel_materialized",
    oracle=f"""
    WITH {FUNNEL_SIGNAL_CTES}, {_clf_sql_ctes()}, funnel AS (
      SELECT p.doc_id, p.source, p.pct,
             (d.doc_id IS NULL) AS pass_dedup,
             (n.n_bigrams IS NULL OR n.n_bigrams < 5
              OR n.avg_nll <= p95.p) AS pass_ppl,
             COALESCE(c.pred_en, false) AS pass_clf
      FROM pct p
      LEFT JOIN dup_drop d ON d.doc_id = p.doc_id
      LEFT JOIN nll n ON n.doc_id = p.doc_id
      LEFT JOIN clf c ON c.doc_id = p.doc_id
      CROSS JOIN p95
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(*) FILTER (WHERE pass_dedup) AS BIGINT)
             AS n_after_dedup,
           CAST(COUNT(*) FILTER (WHERE pass_dedup AND pass_ppl) AS BIGINT)
             AS n_after_ppl,
           CAST(COUNT(*) FILTER (WHERE pass_dedup AND pass_ppl
                                   AND pass_clf) AS BIGINT)
             AS n_after_clf,
           CAST(COUNT(*) FILTER (WHERE pass_dedup AND pass_ppl
                                   AND pass_clf AND pct >= 0.4) AS BIGINT)
             AS n_after_quality
    FROM funnel GROUP BY source
    """,
    tags=("curation", "pipeline", "dedup", "quality", "classifier"),
    unique_docs_guard=True,
)
def curation_funnel_materialized(spark, sf_dir):
    """The PRODUCTION form of ``curation_funnel_v3`` (VERDICT r10 #4):
    each funnel signal (winnowing dedup drops, bigram-LM NLL,
    classifier verdicts, per-source percentiles) is computed ONCE and
    MATERIALIZED as a parquet stage table
    (``pipeline/funnel.py:materialize_funnel_signals``), then the
    audit table is rebuilt purely from those tables
    (:func:`..pipeline.funnel.funnel_audit`): four signal scans +
    doc_id-keyed left joins + one rollup — versus v3's single lazy
    plan whose branches re-scan the source ~36 times.  Same gate
    semantics, same determinism contracts, graded against the SAME
    oracle as v3.

    Scale: this IS the 100 TB shape v3's docstring prescribes — each
    signal is a separate restartable job whose output other consumers
    reuse (classifier scores → threshold sweep, percentiles → mix
    manifest); the audit joins cost |docs|-keyed hash joins over
    narrow tables.  Plan-pinned to signal-table scans only
    (tests/test_funnel_pipeline.py)."""
    from ..pipeline.funnel import run_materialized_funnel

    return run_materialized_funnel(spark, sf_dir)


_BF_SALTS = 4  # backfill shard count (scale knob, like ffd_pack's)


@register(
    "sequence_packing_backfill",
    oracle=f"""
    WITH RECURSIVE bdocs AS (
      SELECT doc_id, len(string_split(text, ' ')) AS toks,
             doc_id % {_BF_SALTS} AS salt
      FROM documents
    ), anchors AS (
      SELECT salt, doc_id, toks,
             row_number() OVER (PARTITION BY salt ORDER BY doc_id) AS apos
      FROM bdocs WHERE toks > {_PACK_CAP // 2}
    ), small AS (
      SELECT salt, doc_id, toks,
             row_number() OVER (PARTITION BY salt
                                ORDER BY toks DESC, doc_id) AS rn
      FROM bdocs WHERE toks <= {_PACK_CAP // 2}
    ), init AS (
      SELECT salt, list({_PACK_CAP} - toks ORDER BY apos) AS resid,
             COUNT(*) AS n_anchor
      FROM anchors GROUP BY salt
    ), bpack AS (
      SELECT s.salt, 0 AS rn,
             COALESCE(i.resid, CAST([] AS BIGINT[])) AS resid,
             COALESCE(i.n_anchor, 0) AS n_anchor,
             CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS toks,
             CAST(NULL AS BIGINT) AS bin_idx
      FROM (SELECT DISTINCT salt FROM small) s
      LEFT JOIN init i USING (salt)
      UNION ALL
      SELECT salt, rn,
             CASE WHEN fit = 0
                  THEN list_append(resid, {_PACK_CAP} - toks)
                  ELSE resid[1:fit-1] || [resid[fit] - toks]
                       || resid[fit+1:]
             END AS resid,
             n_anchor, doc_id, toks,
             CASE WHEN fit = 0 THEN CAST(len(resid) AS BIGINT)
                  ELSE CAST(fit - 1 AS BIGINT) END AS bin_idx
      FROM (
        SELECT sm.salt, sm.rn, sm.doc_id, sm.toks, p.resid, p.n_anchor,
               list_position(list_transform(p.resid,
                 r -> r >= sm.toks), true) AS fit
        FROM bpack p JOIN small sm
          ON sm.salt = p.salt AND sm.rn = p.rn + 1
      )
    )
    SELECT doc_id, CAST(salt AS BIGINT) AS salt, bin_idx,
           CAST(toks AS BIGINT) AS toks,
           bin_idx < n_anchor AS backfilled
    FROM bpack WHERE doc_id IS NOT NULL
    UNION ALL
    SELECT doc_id, CAST(salt AS BIGINT) AS salt,
           CAST(apos - 1 AS BIGINT) AS bin_idx,
           CAST(toks AS BIGINT) AS toks, false AS backfilled
    FROM anchors
    """,
    tags=("curation", "packing", "udf"),
)
def sequence_packing_backfill(spark, sf_dir):
    """The backfill pass the plain sharded FFD's fill audit calls for
    (`sequence_packing_ffd` docstring): length-HOMOGENEOUS shards
    leave every (cap/2, cap]-token bin holding a single doc (~62%
    fill).  This two-stage form fixes it: docs longer than cap/2
    become one-per-bin ANCHORS (they can never share a bin with each
    other anyway), then small docs first-fit into the anchor bins'
    residual capacity before opening fresh bins.  Measured at sf0.01:
    mean fill 97.8% of capacity vs ~74% for bucket-homogeneous FFD —
    the padding-waste audit (`backfilled` per doc, per-bin fill)
    quantifies exactly what the second pass bought.

    Scale: same sharding contract as ``ffd_pack`` — one hash exchange
    on the doc_id salt, anchors and smalls of a shard pack together
    in one pandas group whose state is O(open bins); the salt count
    is the knob that bounds group rows at any corpus size.
    Determinism: anchors ordered by doc_id, smalls by (toks DESC,
    doc_id), first-fit lowest index — the DuckDB oracle replays the
    identical greedy per shard (residual list seeded from the
    shard's anchors via list(... ORDER BY apos)).
    """
    d = load_table(spark, sf_dir, "documents")
    docs = (d.select("doc_id",
                     F.size(F.split("text", " ")).cast("long").alias("toks"))
            .withColumn("salt", F.col("doc_id") % _BF_SALTS))
    half = _PACK_CAP // 2

    def _backfill(pdf):
        import pandas as pd

        a = pdf[pdf["toks"] > half].sort_values("doc_id")
        s = pdf[pdf["toks"] <= half].sort_values(
            ["toks", "doc_id"], ascending=[False, True])
        resid = [_PACK_CAP - int(t) for t in a["toks"]]
        n_anchor = len(resid)
        rows = [(int(d_), i, int(t_), False)
                for i, (d_, t_) in enumerate(zip(a["doc_id"], a["toks"]))]
        for d_, t_ in zip(s["doc_id"], s["toks"]):
            t_ = int(t_)
            for i, r in enumerate(resid):
                if r >= t_:
                    resid[i] = r - t_
                    idx = i
                    break
            else:
                resid.append(_PACK_CAP - t_)
                idx = len(resid) - 1
            rows.append((int(d_), idx, t_, idx < n_anchor))
        out = pd.DataFrame(rows,
                           columns=["doc_id", "bin_idx", "toks",
                                    "backfilled"])
        out.insert(1, "salt", int(pdf["salt"].iloc[0]))
        return out

    return docs.groupBy("salt").applyInPandas(
        _backfill,
        schema="doc_id long, salt long, bin_idx long, toks long, "
               "backfilled boolean")


@register(
    "text_clean_normalize",
    oracle=r"""
    WITH dirty AS (
      SELECT doc_id,
             regexp_replace(text, '(\w+ \w+ \w+) ',
                            '\1' || chr(9) || ' ', 'g') || '  ' AS raw
      FROM documents
    ), cleaned AS (
      SELECT doc_id, raw,
             trim(regexp_replace(
               regexp_replace(raw, '[\t\r\n]', ' ', 'g'),
               ' +', ' ', 'g')) AS clean
      FROM dirty
    )
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS chars_raw,
           CAST(length(clean) AS BIGINT) AS chars_clean,
           CAST(length(raw) - length(clean) AS BIGINT) AS n_removed,
           md5(clean) AS clean_md5,
           trim(regexp_replace(
             regexp_replace(clean, '[\t\r\n]', ' ', 'g'),
             ' +', ' ', 'g')) = clean AS idempotent
    FROM cleaned
    """,
    tags=("curation", "text", "string"),
)
def text_clean_normalize(spark, sf_dir):
    """Text cleaning/normalization — the first transform every raw
    crawl passes through before ANY quality/dedup signal is computed:
    control-whitespace (tab/CR/LF) to space, runs of spaces collapsed,
    edges trimmed.  The fixture corpus is already clean, so the query
    plants deterministic dirt first (a tab after every third word, a
    trailing double space — the same regexp on both engines) and then
    cleans it, reporting per-doc before/after char counts, the cleaned
    content fingerprint, and an IDEMPOTENCE bit (clean(clean(x)) ==
    clean(x)) — the property that makes the stage safe to re-run on
    partially-processed shards.

    Scale: pure map-side (two regexp passes + trim per doc, zero
    shuffle) — the same embarrassingly-parallel contract as chunking.
    Engine notes: backreference is $1 in Spark (Java regex) vs \\1 in
    DuckDB (RE2); replace-all is Spark's default vs DuckDB's 'g' flag
    — the semantics agree on ASCII word runs, which the md5 fingerprint
    verifies end-to-end.
    """
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.regexp_replace("text", r"(\w+ \w+ \w+) ", "$1\t "),
        F.lit("  "))

    def clean_once(c):
        return F.trim(F.regexp_replace(
            F.regexp_replace(c, "[\\t\\r\\n]", " "), " +", " "))

    dirty = d.select("doc_id", raw.alias("raw"))
    cleaned = dirty.select("doc_id", "raw",
                           clean_once(F.col("raw")).alias("clean"))
    return cleaned.select(
        "doc_id",
        F.length("raw").cast("long").alias("chars_raw"),
        F.length("clean").cast("long").alias("chars_clean"),
        (F.length("raw") - F.length("clean")).cast("long")
        .alias("n_removed"),
        F.md5("clean").alias("clean_md5"),
        (clean_once(F.col("clean")) == F.col("clean")).alias("idempotent"))


@register(
    "streaming_chunk_index",
    oracle=f"""
    SELECT doc_id,
           CAST(s // {_CHUNK_S} AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(length(substr(text, CAST(s + 1 AS INT), {_CHUNK_W}))
                AS BIGINT) AS chunk_len,
           md5(substr(text, CAST(s + 1 AS INT), {_CHUNK_W})) AS chunk_md5
    FROM documents, UNNEST(range(0, n_chars, {_CHUNK_S})) AS u(s)
    """,
    tags=("streaming", "curation", "chunking"),
)
def streaming_chunk_index(spark, sf_dir):
    """`doc_chunk_fixed_stride` running AT INGEST as real Structured
    Streaming (file source -> stateless chunk fan-out -> append memory
    sink, availableNow drain) — the RAG chunk index built the moment
    documents land rather than by a nightly batch.  Because the
    transform is stateless there is no watermark restriction: the
    streamed output must equal the batch chunking ROW FOR ROW, which
    is exactly what the (batch) oracle grades — the strongest
    stream==batch parity cell in the matrix.  See
    :func:`..streaming.windows.run_chunk_index_stream` for the
    exactly-once argument (file-source checkpoint).
    """
    from ..streaming.windows import run_chunk_index_stream

    return run_chunk_index_stream(
        spark, f"{sf_dir}/documents.parquet",
        width=_CHUNK_W, stride=_CHUNK_S)


_CLF_SWEEP_T = (-200000, -100000, 0, 100000, 200000)  # micro-log-odds


@register(
    "classifier_threshold_sweep",
    oracle="WITH " + _clf_sql_ctes() + f""",
    th AS (SELECT CAST(unnest([{', '.join(str(t) for t in _CLF_SWEEP_T)}])
             AS BIGINT) AS thresh)
    SELECT th.thresh,
           CAST(SUM(CASE WHEN score_int > th.thresh THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pred_pos,
           ROUND(CASE WHEN SUM(CASE WHEN score_int > th.thresh
                                    THEN 1 ELSE 0 END) = 0 THEN 0.0
                 ELSE SUM(CASE WHEN score_int > th.thresh AND is_en
                               THEN 1 ELSE 0 END)
                      / CAST(SUM(CASE WHEN score_int > th.thresh
                                      THEN 1 ELSE 0 END) AS DOUBLE)
                 END, 4) AS precision4,
           ROUND(SUM(CASE WHEN score_int > th.thresh AND is_en
                          THEN 1 ELSE 0 END)
                 / CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS DOUBLE),
                 4) AS recall4
    FROM th CROSS JOIN clf
    GROUP BY th.thresh
    """,
    tags=("curation", "classifier", "agg"),
    unique_docs_guard=True,
)
def classifier_threshold_sweep(spark, sf_dir):
    """The precision/recall operating-point table for the hash-n-gram
    quality classifier — the audit that picks the funnel's gate
    threshold: scores computed ONCE (integer micro-log-odds,
    accumulation-order-free), then a 5-threshold grid fans out
    map-side and each point reports predicted-positive count,
    precision, and recall against the language label.  Production
    funnels pick the highest-recall point that clears a precision
    floor; this table IS that decision.

    Scale: the classifier inference is the broadcast-weight shape
    pinned for ``hashgram_classifier_score``; the sweep adds one
    literal fan-out and one agg over |grid|x|docs| rows — never a
    re-score.  Zero-denominator points report 0.0 in both engines.
    """
    scores = _clf_scores(spark, sf_dir)
    swept = scores.select(
        "is_en", "score_int",
        F.explode(F.array(*[F.lit(t).cast("long")
                            for t in _CLF_SWEEP_T])).alias("thresh"))
    pos = F.when(F.col("score_int") > F.col("thresh"), 1).otherwise(0)
    tp = F.when((F.col("score_int") > F.col("thresh"))
                & F.col("is_en"), 1).otherwise(0)
    return (swept.groupBy("thresh")
            .agg(F.sum(pos).cast("long").alias("n_pred_pos"),
                 F.round(F.when(F.sum(pos) == 0, 0.0)
                         .otherwise(F.sum(tp)
                                    / F.sum(pos).cast("double")), 4)
                 .alias("precision4"),
                 F.round(F.sum(tp)
                         / F.sum(F.when(F.col("is_en"), 1).otherwise(0))
                         .cast("double"), 4).alias("recall4")))


@register(
    "packing_fill_report",
    oracle=_PACK_ORACLE_CTES + f"""
    , per_shard AS (
      SELECT bucket, salt, MAX(bin_idx) + 1 AS n_bins,
             COUNT(*) AS n_docs, SUM(toks) AS total_toks
      FROM pack GROUP BY bucket, salt)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_bins) AS BIGINT) AS n_bins,
           CAST(SUM(total_toks) AS BIGINT) AS total_toks,
           ROUND(SUM(total_toks)
                 / CAST(SUM(n_bins) * {_PACK_CAP} AS DOUBLE), 4) AS fill4
    FROM per_shard GROUP BY bucket
    """,
    tags=("curation", "packing", "agg"),
)
def packing_fill_report(spark, sf_dir):
    """The per-length-bucket fill accounting for the sharded FFD pack
    — REGISTERED (not just smoke-tested), so the known tradeoff is a
    graded number: buckets whose lengths sit in (cap/2, cap] hold one
    doc per bin and read low fill, small-length buckets pack high.
    This is the audit that routes a production pack's mid-length
    leftovers into the backfill pass (``sequence_packing_backfill``).

    Scale: one aggregation over the pack assignment (which itself is
    the plan pinned for ``sequence_packing_ffd``) — per-(bucket,salt)
    bin counts, then per-bucket rollup; nothing heavier than the pack
    it audits.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.filter(F.col("text").isNotNull()).select(   # as in the pack
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("toks"))
    packed = ffd_pack(docs)
    per_shard = (packed.groupBy("bucket", "salt")
                 .agg((F.max("bin_idx") + 1).alias("n_bins"),
                      F.count("*").alias("n_docs"),
                      F.sum("toks").alias("total_toks")))
    return (per_shard.groupBy("bucket")
            .agg(F.sum("n_docs").cast("long").alias("n_docs"),
                 F.sum("n_bins").cast("long").alias("n_bins"),
                 F.sum("total_toks").cast("long").alias("total_toks"),
                 F.round(F.sum("total_toks")
                         / (F.sum("n_bins") * _PACK_CAP).cast("double"),
                         4).alias("fill4"))
            .select(F.col("bucket").cast("long").alias("bucket"),
                    "n_docs", "n_bins", "total_toks", "fill4"))


@register(
    "hashgram_collision_audit",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT DISTINCT g FROM (
        SELECT UNNEST(t) AS g FROM toks
        UNION ALL
        SELECT t[i] || '_' || t[i+1] AS g
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i))
    ), buckets AS (
      SELECT {_CLF_H} AS h, CAST(COUNT(*) AS BIGINT) AS k
      FROM grams GROUP BY {_CLF_H})
    SELECT k AS grams_per_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM buckets GROUP BY k
    """,
    tags=("curation", "classifier", "agg"),
)
def hashgram_collision_audit(spark, sf_dir):
    """The collision profile that sizes the hashing trick: how many of
    the classifier's D={d} buckets hold 1, 2, 3… distinct n-grams.  A
    heavy tail means semantically-unrelated grams share a weight and
    the classifier's capacity is the bottleneck — the signal to grow
    D (production fastText uses 2^20); a mostly-1 profile means D is
    already generous.  Uses the SAME bucket hash as
    ``hashgram_classifier_score``, so the audit describes exactly the
    table that model broadcasts.

    Scale: distinct grams collapse the corpus to vocabulary size
    (unigram+bigram), then two D-granular aggregates — the same
    featurization cost shape as classifier training, with no label or
    weight math.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.split("text", " ").alias("t"))
    grams = (docs.select(F.explode("t").alias("g"))
             .unionAll(
                 docs.filter(F.size("t") >= 2)
                 .select(F.explode(F.expr(
                     "transform(sequence(1, size(t) - 1),"
                     " i -> concat(element_at(t, CAST(i AS INT)), '_',"
                     "             element_at(t, CAST(i + 1 AS INT))))"))
                     .alias("g")))
             .distinct())
    buckets = grams.groupBy(F.expr(_CLF_H).alias("h")).agg(
        F.count("*").alias("k"))
    return (buckets.groupBy("k")
            .agg(F.count("*").alias("n_buckets"))
            .select(F.col("k").cast("long").alias("grams_per_bucket"),
                    "n_buckets"))


@register(
    "dedup_normalization_impact",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             translate(text, 'abcdefghijklmnopqrstuvwxyz', 'ABCDEFGHIJKLMNOPQRSTUVWXYZ') || '  ' AS text
      FROM documents WHERE doc_id % 4 = 0
    ), raw AS (
      SELECT md5(text) AS h, COUNT(*) AS c FROM corpus GROUP BY md5(text)
    ), norm AS (
      SELECT md5(trim(regexp_replace(
               translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' +', ' ', 'g'))) AS h,
             COUNT(*) AS c
      FROM corpus
      GROUP BY md5(trim(regexp_replace(
                 translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' +', ' ', 'g')))
    )
    SELECT 'raw' AS method,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clusters
    FROM raw
    UNION ALL
    SELECT 'normalized',
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM norm
    """,
    tags=("curation", "dedup", "string"),
)
def dedup_normalization_impact(spark, sf_dir):
    """WHY dedup runs after normalization, measured: plant a
    case-flipped, trailing-whitespace twin of every 4th doc, then
    compare exact-dup detection on raw md5(text) vs md5 of the
    normalized form (lower + collapse spaces + trim).  Raw hashing
    misses every planted twin (case/whitespace differ); normalized
    hashing catches them all — the delta is the duplicate mass a
    pipeline silently ships when it skips the cleaning stage
    (``text_clean_normalize``) before hashing.

    Scale: two hash-groupBys over the corpus (32-byte keys shuffle,
    never text) — the before/after comparison costs one extra
    aggregate over the same scan.
    """
    d = load_table(spark, sf_dir, "documents")
    # ASCII-only case folding via translate: full-Unicode lower()/
    # upper() are ENGINE-DIVERGENT ('ß' uppercases to 'SS' in the JVM
    # but 'ẞ' in DuckDB, and only the JVM's round-trips to 'ss'), so
    # locale-tailored folding can silently change which twins a dedup
    # catches — fuzz_oracle.py caught the cluster-count flip.  ASCII
    # folding is deterministic everywhere and is what normalize-before-
    # dedup pipelines actually want.
    _UP, _LO = "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
    corpus = (d.select("doc_id", "text")
              .unionAll(d.filter(F.col("doc_id") % 4 == 0)
                        .select((F.col("doc_id") + 1000000).alias("doc_id"),
                                F.concat(F.translate("text", _LO, _UP),
                                         F.lit("  "))
                                .alias("text"))))
    norm_h = F.md5(F.trim(F.regexp_replace(
        F.translate("text", _UP, _LO), " +", " ")))

    def dup_stats(hcol, method):
        c = corpus.groupBy(hcol.alias("h")).agg(F.count("*").alias("c"))
        return c.agg(
            F.lit(method).alias("method"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            .cast("long").alias("n_dup_docs"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("long")
            .alias("n_clusters"))

    return (dup_stats(F.md5("text"), "raw")
            .unionByName(dup_stats(norm_h, "normalized")))


# ======================================================================
# Materialized tokenizer pipeline (VERDICT r11 #7) — encode→pack→manifest
# ======================================================================

def _tokpipe_oracle() -> str:
    """Composed oracle replaying all three tokenizer stages: the
    sharded-FFD pack CTEs (shared with ``sequence_packing_ffd``), the
    WordPiece store+greedy CTEs (shared with ``wordpiece_encode``),
    the per-doc token stats, and the Hamilton manifest selection
    (the ``training_mix_manifest`` shape over the PACKED docs)."""
    from .tokenizer_q import _UNI_MAXW, _WP_STORE_SQL

    return _PACK_ORACLE_CTES + f""",
    words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
      FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
      WHERE length(w) BETWEEN 1 AND {_UNI_MAXW}
      GROUP BY w
    ), {_WP_STORE_SQL},
    greedy AS (
      SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS np FROM words
      UNION ALL
      SELECT w, pos + sl, np + 1 FROM (
        SELECT w, pos, np,
          CASE WHEN pos = 0 THEN
            CASE WHEN pos + 3 <= length(w) AND substr(w, pos + 1, 3)
                   IN (SELECT piece FROM init_store
                       WHERE length(piece) = 3) THEN 3
                 WHEN pos + 2 <= length(w) AND substr(w, pos + 1, 2)
                   IN (SELECT piece FROM init_store
                       WHERE length(piece) = 2) THEN 2
                 ELSE 1 END
          ELSE
            CASE WHEN pos + 3 <= length(w) AND substr(w, pos + 1, 3)
                   IN (SELECT piece FROM cont_store
                       WHERE length(piece) = 3) THEN 3
                 WHEN pos + 2 <= length(w) AND substr(w, pos + 1, 2)
                   IN (SELECT piece FROM cont_store
                       WHERE length(piece) = 2) THEN 2
                 ELSE 1 END
          END AS sl
        FROM greedy WHERE pos < length(w)) t
    ), enc AS (
      SELECT w, np FROM greedy WHERE pos = length(w)
    ), parts AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL)
      WHERE len(w) > 0
    ), perdoc AS (
      SELECT doc_id, CAST(SUM(COALESCE(enc.np, 1)) AS BIGINT) AS n_wp
      FROM parts LEFT JOIN enc USING (w) GROUP BY doc_id
    ), tok AS (
      SELECT d.doc_id, d.lang, d.source,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
             CAST(d.n_chars AS BIGINT) AS n_chars,
             CAST(COALESCE(p.n_wp, 0) AS BIGINT) AS n_wp_tokens
      FROM documents d LEFT JOIN perdoc p USING (doc_id)
      WHERE d.text IS NOT NULL
    ), packed AS (
      SELECT pack.doc_id, tok.source FROM pack JOIN tok USING (doc_id)
    ), src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM packed GROUP BY source
    ), tq AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS n FROM src),
    q AS (
      SELECT source, n_docs,
             CAST(FLOOR(120 * n_docs / (SELECT n FROM tq))
                  AS BIGINT) AS base,
             120 * n_docs / (SELECT n FROM tq)
               - FLOOR(120 * n_docs / (SELECT n FROM tq)) AS rem
      FROM src
    ), r AS (
      SELECT source, base,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source NULLS LAST)
               AS rk
      FROM q
    ), lo AS (SELECT 120 - SUM(base) AS l FROM q),
    quota AS (
      SELECT source,
             base + CASE WHEN rk <= (SELECT l FROM lo)
                         THEN 1 ELSE 0 END AS quota
      FROM r
    ), sel AS (
      SELECT x.doc_id FROM (
        SELECT p.doc_id, p.source,
               ROW_NUMBER() OVER (PARTITION BY p.source
                                  ORDER BY md5(CAST(p.doc_id AS VARCHAR)),
                                           p.doc_id) AS rn
        FROM packed p) x
      JOIN quota ON quota.source IS NOT DISTINCT FROM x.source
      WHERE x.rn <= quota.quota
    )
    SELECT tok.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok.n_tokens) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(tok.n_wp_tokens) AS BIGINT) AS n_wp_tokens,
           ROUND(CASE WHEN SUM(tok.n_wp_tokens) > 0
                      THEN SUM(tok.n_chars)
                           / CAST(SUM(tok.n_wp_tokens) AS DOUBLE)
                 END, 4) AS chars_per_wp_token,
           CAST(COUNT(DISTINCT (pack.bucket, pack.salt, pack.bin_idx))
                AS BIGINT) AS n_bins,
           CAST(SUM(CASE WHEN sel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_manifest
    FROM tok
    LEFT JOIN pack ON pack.doc_id = tok.doc_id
    LEFT JOIN sel ON sel.doc_id = tok.doc_id
    GROUP BY tok.source
    """


@register(
    "tokenizer_pipeline_audit",
    oracle=_tokpipe_oracle(),
    tags=("tokenizer", "curation", "pipeline", "packing", "udf"),
)
def tokenizer_pipeline_audit(spark, sf_dir):
    """The MATERIALIZED tokenizer pipeline (VERDICT r11 #7) — the
    data-prep twin of ``curation_funnel_materialized``: land
    encode → pack → manifest as three parquet stage tables
    (per-doc WordPiece + whitespace token stats; the sharded-FFD
    128-token bins over the stats TABLE; the Hamilton training-mix
    manifest over the PACKED docs), then rebuild the per-source
    shipping report purely from those tables.  The audit plan is
    pinned to stage-table scans only (tests/test_tokenizer_pipeline):
    no corpus scan, no greedy encoder, no pandas FFD survives into it.

    Per source it reports docs, whitespace tokens (the packing
    currency), WordPiece tokens (the fertility currency; >12-char
    words count 1 UNK piece), chars-per-WordPiece-token, distinct
    bins touched, and manifest selections (budget 120, exact-sum
    Hamilton, md5-deterministic fill).

    Scale: each stage is a separate restartable job writing a
    columnar table other consumers reuse; the wall this entry pays in
    the bench (three writes + the audit) is the production pipeline's
    true cost, exactly like the funnel twin.  The oracle replays all
    three stages in one composed SQL (the FFD CTEs shared with
    ``sequence_packing_ffd``, the greedy CTEs with
    ``wordpiece_encode``, the quota CTEs with
    ``training_mix_manifest``).
    """
    from ..pipeline.tokenize import run_materialized_tokenizer

    return run_materialized_tokenizer(spark, sf_dir)
