"""Training-corpus curation: repetition signals, Gopher-style filter
verdicts, deterministic stratified sampling, token-budget packing, and
PII redaction.

Complements ``text_q`` (token stats, stopword/TTR quality score,
language-ID): these are the *decision* stages a curation pipeline runs
after measurement — drop/keep verdicts with reasons, per-language
sampling rates, sequence packing for the trainer, and scrubbing.
All signals are built-in JVM expressions; the fixture corpus has no
newlines/punctuation, so the repetition family uses the word-level
forms of the C4/Gopher line-level rules (duplicate n-gram fraction,
top-word concentration) — the structure is identical, the unit is the
token.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.text import unique_documents
from . import register


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------- repetition

_BIGRAM_SQL = """
      SELECT doc_id,
             list_transform(range(1, GREATEST(len(t), 1)),
                            i -> t[i] || ' ' || t[i+1]) AS bi
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
"""


def _bigrams(col):
    """Adjacent-token bigram array (JVM-side): zip tokens with their
    tail; zip_with pads the tail with NULL and concat propagates it,
    so one trailing NULL marks the end — filtered out."""
    tail = F.slice(col, 2, F.greatest(F.size(col) - 1, F.lit(1)))
    return F.filter(
        F.zip_with(col, tail, lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )


@register(
    "doc_repetition_signals",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), c AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM tf GROUP BY doc_id, tok
    ), words AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT)   AS n_tokens,
             ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 4) AS top_word_frac
      FROM c GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             ROUND(1.0 - CAST(len(list_distinct(bi)) AS DOUBLE)
                         / GREATEST(len(bi), 1), 4) AS dup_bigram_frac
      FROM ({_BIGRAM_SQL}) b
    )
    SELECT words.doc_id, n_tokens, top_word_frac, dup_bigram_frac
    FROM words JOIN bg ON words.doc_id = bg.doc_id
    """,
    tags=("text", "quality"),
    unique_docs_guard=True,
)
def doc_repetition_signals(spark, sf_dir):
    """Within-doc repetition: top-word concentration (needs per-token
    counts — one groupBy on (doc_id, tok), partial-aggregated map-side)
    and duplicate-bigram fraction (pure array expressions, zero
    shuffle).  The two are joined on doc_id — co-partitioned, so at
    scale this is a local join after the single token shuffle."""
    d = unique_documents(_docs(spark, sf_dir))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    words = (
        toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
        .groupBy("doc_id").agg(
            F.sum("c").alias("n_tokens"),
            F.round(F.max("c") / F.sum("c"), 4).alias("top_word_frac"),
        )
    )
    bg = d.select(
        "doc_id",
        F.round(
            1.0 - F.size(F.array_distinct(_bigrams(F.split("text", " "))))
            / F.greatest(F.size(_bigrams(F.split("text", " "))), F.lit(1)),
            4,
        ).alias("dup_bigram_frac"),
    )
    return words.join(bg, "doc_id").select(
        "doc_id", "n_tokens", "top_word_frac", "dup_bigram_frac"
    )


@register(
    "gopher_quality_filter",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), c AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM tf GROUP BY doc_id, tok
    ), words AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(MAX(c) AS DOUBLE) / SUM(c) AS twf,
             CAST(SUM(c * length(tok)) AS DOUBLE) / SUM(c) AS mwl
      FROM c GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / GREATEST(len(bi), 1) AS dbf
      FROM ({_BIGRAM_SQL}) b
    ), sig AS (
      SELECT words.doc_id, n_tokens, twf, mwl, dbf
      FROM words JOIN bg ON words.doc_id = bg.doc_id
    )
    SELECT doc_id,
           (n_tokens BETWEEN 30 AND 100000)
             AND mwl BETWEEN 2.0 AND 8.0
             AND twf < 0.15 AND dbf < 0.06             AS keep,
           concat_ws(',',
             CASE WHEN n_tokens NOT BETWEEN 30 AND 100000 THEN 'n_tokens' END,
             CASE WHEN mwl NOT BETWEEN 2.0 AND 8.0 THEN 'mean_word_len' END,
             CASE WHEN twf >= 0.15 THEN 'top_word_frac' END,
             CASE WHEN dbf >= 0.06 THEN 'dup_bigram_frac' END) AS drop_reasons
    FROM sig
    """,
    tags=("text", "quality", "filter"),
    unique_docs_guard=True,
)
def gopher_quality_filter(spark, sf_dir):
    """Gopher-rule-style keep/drop verdict with machine-readable drop
    reasons (word-count bounds, mean-word-length bounds, top-word
    concentration, duplicate-bigram fraction — thresholds tuned to
    split this corpus non-trivially).  Verdict-with-reasons rather
    than a silent filter: a 100 TB curation run audits *why* mass was
    dropped before committing to it."""
    d = unique_documents(_docs(spark, sf_dir))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    words = (
        toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
        .groupBy("doc_id").agg(
            F.sum("c").alias("n_tokens"),
            (F.max("c") / F.sum("c")).alias("twf"),
            (F.sum(F.col("c") * F.length("tok")) / F.sum("c")).alias("mwl"),
        )
    )
    bg = d.select(
        "doc_id",
        (1.0 - F.size(F.array_distinct(_bigrams(F.split("text", " "))))
         / F.greatest(F.size(_bigrams(F.split("text", " "))), F.lit(1))).alias("dbf"),
    )
    sig = words.join(bg, "doc_id")
    ok_n = F.col("n_tokens").between(30, 100000)
    ok_mwl = F.col("mwl").between(2.0, 8.0)
    ok_twf = F.col("twf") < 0.15
    ok_dbf = F.col("dbf") < 0.06
    return sig.select(
        "doc_id",
        (ok_n & ok_mwl & ok_twf & ok_dbf).alias("keep"),
        F.concat_ws(
            ",",
            F.when(~ok_n, "n_tokens"),
            F.when(~ok_mwl, "mean_word_len"),
            F.when(~ok_twf, "top_word_frac"),
            F.when(~ok_dbf, "dup_bigram_frac"),
        ).alias("drop_reasons"),
    )


# ------------------------------------------------------- sampling / packing

_LANG_RATE_HEX = {"en": "cccc", "es": "8000", "de": "4000", "fr": "2000",
                  "ja": "1000"}  # ≈ 80/50/25/12.5/6.25 %
_DEFAULT_RATE_HEX = "1000"  # any language not in the map (oracle ELSE)


@register(
    "stratified_sample_by_lang",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang WHEN 'en' THEN 'cccc' WHEN 'es' THEN '8000'
                    WHEN 'de' THEN '4000' WHEN 'fr' THEN '2000'
                    ELSE '1000' END
    """,
    tags=("scale", "sampling"),
)
def stratified_sample_by_lang(spark, sf_dir):
    """Per-language sampling rates (the corpus-mixing knob: downweight
    over-represented languages) via the same deterministic md5-prefix
    predicate as ``deterministic_sample`` — the picked set is stable
    across engines, runs and partitionings, and the filter is a scan-
    local expression: no shuffle, no driver-side state."""
    d = _docs(spark, sf_dir)
    rate = None
    for lg, hx in _LANG_RATE_HEX.items():
        rate = F.when(F.col("lang") == lg, hx) if rate is None else rate.when(
            F.col("lang") == lg, hx)
    rate = rate.otherwise(_DEFAULT_RATE_HEX)
    pred = F.substring(
        F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), 1, 4
    ) < rate
    return d.filter(pred).select("doc_id", "lang")


@register(
    "train_pack_budget",
    oracle="""
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                  PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 512.0) AS BIGINT) AS pack_id
    FROM (SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents)
    """,
    tags=("text", "packing"),
    unique_docs_guard=True,
)
def train_pack_budget(spark, sf_dir):
    """Sequence packing for the trainer: docs stream per language in
    doc_id order into 512-token contiguous budget bins (pack_id =
    running token count DIV budget).  One window per language
    partition — at 100 TB the partition key would include a date/shard
    component so no single language becomes one giant ordered
    partition; the assignment stays deterministic either way, which is
    what makes packed batches reproducible.

    Identity-scoped (r14): the per-language running sum orders by
    doc_id, which a duplicate doc_id makes non-total — pack_ids after
    the duplicate pair then depend on the engines' pick (caught by
    the --dupkeys --nullkeys seed-2 sweep); reads through
    unique_documents like the rest of the identity-scoped family."""
    from pyspark.sql.window import Window

    from ..operators.text import unique_documents

    d = unique_documents(_docs(spark, sf_dir))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        d.select("doc_id", "lang",
                 F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        .select("doc_id", "lang", "n_tokens",
                F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 512.0)
                .cast("long").alias("pack_id"))
    )


# ------------------------------------------------------------------- PII

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "pii_redact_planted",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}'))
              + len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_redacted,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
    FROM planted
    """,
    tags=("text", "pii"),
)
def pii_redact_planted(spark, sf_dir):
    """PII scrubbing: email/phone patterns replaced with typed
    placeholder tokens, plus the per-doc redaction count the audit
    trail wants.  The fixture corpus is synthetic word-soup with no
    real PII, so every 10th doc gets a deterministic planted contact
    line — the driver row then proves detection AND redaction on
    non-empty matches (hash of the scrubbed text, not the text, comes
    back).  Pure regexp expressions: scan-local, no shuffle, no UDF."""
    d = _docs(spark, sf_dir)
    planted = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(planted, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        (F.regexp_count(planted, F.lit(_EMAIL_RE))
         + F.regexp_count(planted, F.lit(_PHONE_RE))).cast("long").alias("n_redacted"),
        F.md5(redacted).alias("redacted_hash"),
    )


@register(
    "psi_feature_drift",
    oracle="""
    WITH bucketed AS (
      SELECT event_type,
             LEAST(CAST(FLOOR(value / 50) AS BIGINT), 9) AS bucket,
             CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END AS ref
      FROM events WHERE value IS NULL OR isfinite(value)
    ), counts AS (
      SELECT event_type, bucket,
             SUM(ref) AS na, SUM(1 - ref) AS nb
      FROM bucketed GROUP BY event_type, bucket
    ), shares AS (
      SELECT event_type, bucket, na, nb,
             SUM(na) OVER (PARTITION BY event_type) AS ta,
             SUM(nb) OVER (PARTITION BY event_type) AS tb
      FROM counts
    )
    SELECT event_type,
           CAST(MAX(ta) AS BIGINT) AS n_ref,
           CAST(MAX(tb) AS BIGINT) AS n_cur,
           CAST(SUM(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_buckets_used,
           ROUND(SUM(CASE WHEN na > 0 AND nb > 0
                     THEN (na / ta - nb / tb) * ln((na / ta) / (nb / tb))
                     ELSE 0 END), 4) AS psi
    FROM shares GROUP BY event_type
    """,
    tags=("quality", "drift", "monitoring"),
)
def psi_feature_drift(spark, sf_dir):
    """Population stability index of the ``value`` feature, reference
    week (before 2024-01-08) vs the rest, per event type — the drift
    gate a training pipeline runs between ingest periods before
    retraining on new data (PSI > 0.2 conventionally blocks the batch).

    Fixed-width buckets (50-unit, capped at 10) keep the binning
    deterministic and engine-independent; zero-in-either-period buckets
    are excluded (the standard convention — reported via
    ``n_buckets_used`` so a collapsed distribution is visible).

    Scale: one map-side-combinable groupBy on (type, bucket) — the
    window + final reduce run on ≤ types×10 rows.  No quantile pass,
    no per-row state; the same plan at any event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    # finite-measure contract (FUZZ.md --nan sweep): non-finite values
    # are un-binnable and engine-divergent; NULLs keep their usual
    # semantics
    ev = ev.filter(F.col("value").isNull()
                   | (~F.isnan("value")
                      & (F.abs("value") != F.lit(float("inf")))))
    bucketed = ev.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50), F.lit(9)).alias("bucket"),
        F.when(F.col("ts") < F.lit("2024-01-08").cast("timestamp"), 1)
        .otherwise(0).alias("ref"),
    )
    counts = bucketed.groupBy("event_type", "bucket").agg(
        F.sum("ref").alias("na"),
        F.sum(1 - F.col("ref")).alias("nb"),
    )
    from pyspark.sql import Window
    w = Window.partitionBy("event_type")
    shares = counts.select(
        "event_type", "bucket", "na", "nb",
        F.sum("na").over(w).alias("ta"),
        F.sum("nb").over(w).alias("tb"),
    )
    both = (F.col("na") > 0) & (F.col("nb") > 0)
    p, q = F.col("na") / F.col("ta"), F.col("nb") / F.col("tb")
    return shares.groupBy("event_type").agg(
        F.max("ta").cast("long").alias("n_ref"),
        F.max("tb").cast("long").alias("n_cur"),
        F.sum(F.when(both, 1).otherwise(0)).cast("long")
        .alias("n_buckets_used"),
        F.round(F.sum(F.when(both, (p - q) * F.log(p / q)).otherwise(0.0)), 4)
        .alias("psi"),
    )


@register(
    "train_val_test_split",
    oracle="""
    WITH assigned AS (
      SELECT lang, n_chars,
             CASE WHEN substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 4)
                       < 'cccc' THEN 'train'
                  WHEN substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 4)
                       < 'e666' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM assigned GROUP BY lang, split
    """,
    tags=("curation", "sampling", "split"),
)
def train_val_test_split(spark, sf_dir):
    """Deterministic ~80/10/10 train/val/test assignment by salted
    content hash (md5 prefix thresholds 0xcccc / 0xe666), reported per
    (language, split).  Hash assignment — not random() — is the
    property that matters for training data: a document's split never
    changes across reruns, engines, repartitionings, or corpus
    growth, so no eval example ever leaks into train when the pipeline
    is re-executed.  The salt namespaces this split decision away from
    every other sampling decision hashing the same ids.

    Scale: the assignment is a scan projection; the report is one
    map-side-combinable groupBy over ≤ langs×3 cells.
    """
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(
        F.md5(F.concat(F.lit("split-"), F.col("doc_id").cast("string"))),
        1, 4)
    assigned = docs.select(
        "lang", "n_chars",
        F.when(prefix < "cccc", "train")
        .when(prefix < "e666", "val")
        .otherwise("test").alias("split"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )


@register(
    "stratified_fixed_n_sample",
    oracle="""
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('fs-' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    WHERE rk <= 10
    """,
    tags=("curation", "sampling", "topk"),
)
def stratified_fixed_n_sample(spark, sf_dir):
    """EXACT-size stratified sample: precisely 10 documents per
    language, chosen by salted-hash order — the "give me exactly N
    per stratum, reproducibly" request that rate-based sampling
    (``stratified_sample_by_lang``, Bernoulli per row) cannot satisfy:
    a rate yields a binomial count, not N.

    Hash order makes the sample deterministic across engines, runs,
    AND growing data (a new document only displaces a sampled one if
    its hash sorts earlier — no reshuffle of the whole sample).  Plan:
    one shuffle on the stratum key, per-stratum bounded sort emitting
    the first 10 (rank window).  For strata hot enough to skew a
    task, the salted two-level form (``topk_per_group_salted``) is
    the same algebra with a pre-aggregation level.
    """
    d = _docs(spark, sf_dir)
    from pyspark.sql import Window

    # total-order: ties share (lang, doc_id) — every returned column —
    # so ranks swap between indistinguishable rows
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("fs-"), F.col("doc_id").cast("string"))),
        "doc_id")
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 10)
        .select("lang", "doc_id", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "score_percentile_by_source",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             ROUND(CAST(len(list_distinct(string_split(text, ' ')))
                        AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS score
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score NULLS LAST, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM scored
    )
    SELECT doc_id, source, score,
           ROUND(CAST(rn - 1 AS DOUBLE) / GREATEST(n - 1, 1), 6) AS pct,
           CAST(LEAST(FLOOR(((rn - 1) * 10.0) / n), 9) AS BIGINT) AS decile
    FROM ranked
    """,
    tags=("quality", "curation", "window"),
    unique_docs_guard=True,
)
def score_percentile_by_source(spark, sf_dir, docs=None):
    """Within-source percentile normalization of a quality score — the
    fix for the classic cross-domain filtering bug: raw quality
    scores are NOT comparable across sources (code "quality" and web
    "quality" live on different scales), so a single global threshold
    silently drops whole domains.  Ranking each doc WITHIN its source
    and thresholding the percentile ("keep every source's top 60 %")
    makes the filter scale-free per domain — the quantile analogue of
    per-source z-scoring, robust to any monotone score transform.

    Scale: one rank window per source partition (a single doc_id-free
    shuffle on the source key); at 100 TB a source is still
    window-able because the rank is the only global-within-group
    state — for pathological single-source corpora the two-phase
    value-granular cumsum (``token_budget_head_selection``'s shape)
    is the fallback, same semantics.

    Determinism: the score is ROUND(.,6) before ranking; ranks break
    ties by doc_id; pct and the integer decile derive from ranks, not
    floats.
    """
    from pyspark.sql import Window as W

    d = docs if docs is not None \
        else unique_documents(load_table(spark, sf_dir, "documents"))
    t = F.split("text", " ")
    scored = d.select(
        "doc_id", "source",
        F.round(F.size(F.array_distinct(t)).cast("double") / F.size(t), 6)
         .alias("score"))
    ws = W.partitionBy("source")
    ranked = scored.select(
        "doc_id", "source", "score",
        # NULLS LAST explicit (unscoreable NULL-text docs rank above
        # every scored doc — same in DuckDB, whose default differs
        # from Spark's bare ASC; fuzz_oracle.py)
        F.row_number().over(ws.orderBy(F.asc_nulls_last("score"),
                                       "doc_id")).alias("rn"),
        F.count("*").over(ws).alias("n"))
    return ranked.select(
        "doc_id", "source", "score",
        # GREATEST(n-1, 1): a single-doc source is percentile 0, not a
        # 0/0 crash under ANSI (the fixture never has n=1; production
        # domains do)
        F.round((F.col("rn") - 1).cast("double")
                / F.greatest(F.col("n") - 1, F.lit(1)), 6)
         .alias("pct"),
        # FLOOR on both engines: a bare CAST(double AS BIGINT) rounds
        # in DuckDB but truncates in Spark (the registry's div rule)
        F.least(F.floor((F.col("rn") - 1) * 10.0 / F.col("n")),
                F.lit(9).cast("long")).cast("long").alias("decile"))


@register(
    "bigram_lm_perplexity_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
    ), uni AS (
      SELECT w1 AS w, COUNT(*) AS c1 FROM big GROUP BY 1
    ), vocab AS (
      SELECT COUNT(DISTINCT w) AS v FROM (
        SELECT UNNEST(t) AS w FROM toks)
    ), bc AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2
    ), scored AS (
      SELECT big.doc_id,
             -log2((bc.c12 + 1.0) / (uni.c1 + vocab.v)) AS nll
      FROM big
      JOIN bc ON bc.w1 = big.w1 AND bc.w2 = big.w2
      JOIN uni ON uni.w = big.w1
      CROSS JOIN vocab
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(SUM(nll) / COUNT(*), 6) AS avg_nll
    FROM scored GROUP BY doc_id HAVING COUNT(*) >= 5
    ORDER BY avg_nll DESC, doc_id LIMIT 20
    """,
    tags=("quality", "curation", "text", "topk"),
    unique_docs_guard=True,
)
def bigram_lm_perplexity_filter(spark, sf_dir):
    """Perplexity-based quality filtering with a SELF-TRAINED bigram
    LM (the CCNet recipe, minus the external KenLM): train add-1-
    smoothed bigram counts on the corpus itself, score every doc's
    mean negative log2-likelihood −log2((c(w1w2)+1)/(c(w1)+V)), and
    surface the 20 worst-fit docs — gibberish, boilerplate soup, and
    wrong-language contamination float to the top because the
    corpus's own statistics can't predict them.  2^avg_nll is the
    per-token perplexity.

    Scale: training IS two aggregations (unigram/bigram counts —
    vocab-granular, partial-aggregable); scoring joins each doc
    bigram against those count tables on vocab-bounded keys; the
    per-doc reduction shuffles on doc_id once; the outlier report is
    TakeOrderedAndProject.  No model artifact leaves the cluster —
    the "LM" is a DataFrame.

    Determinism: integer counts; one log2 per bigram in identical
    form both engines; per-doc means round to 6 before the ordered
    head (noise floor ~1e-13 on ~10² log terms, six orders below the
    round); short docs (< 5 bigrams) are excluded from the report.
    """
    return (doc_avg_nll(spark, sf_dir)
            .filter(F.col("n_bigrams") >= 5)
            .orderBy(F.desc("avg_nll"), "doc_id")
            .limit(20))


def doc_avg_nll(spark, sf_dir, docs=None):
    """(doc_id, n_bigrams, avg_nll) for every doc with ≥1 bigram — the
    self-trained add-1 bigram-LM score shared by
    ``bigram_lm_perplexity_filter`` (outlier head) and
    ``curation_funnel_v2`` (threshold gate).  ``docs`` lets a composed
    funnel pass one SHARED identity-deduped documents stage instead of
    each signal re-running unique_documents (guide §2.4)."""
    d = docs if docs is not None \
        else unique_documents(load_table(spark, sf_dir, "documents"))
    t = F.split("text", " ")
    base = d.select("doc_id", t.alias("t"))
    toks = base.select("doc_id", F.explode("t").alias("w"))
    # adjacent bigrams map-side via zip_with of the two shifted slices
    # (the _clf_scores recipe) — identical pair multiset to the old
    # posexplode + doc-keyed lead() window, with ZERO exchange where
    # the window shuffled every corpus token by doc_id (r15, guide
    # §2.4: remove shuffles outright)
    big = (base.select("doc_id", F.explode(F.expr(
               "zip_with(slice(t, 1, size(t) - 1),"
               " slice(t, 2, size(t) - 1),"
               " (a, b) -> struct(a AS w1, b AS w2))")).alias("bg"))
           .select("doc_id", F.col("bg.w1").alias("w1"),
                   F.col("bg.w2").alias("w2")))
    uni = big.groupBy(F.col("w1").alias("w")).agg(F.count("*").alias("c1"))
    vocab = toks.agg(F.count_distinct("w").alias("v"))
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    scored = (big.join(bc, ["w1", "w2"])
              .join(uni.withColumnRenamed("w", "w1"), "w1")
              .crossJoin(F.broadcast(vocab))  # bounded: 1-row vocab size
              .select("doc_id",
                      (-F.log2((F.col("c12") + 1.0)
                               / (F.col("c1") + F.col("v")))).alias("nll")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.sum("nll") / F.count("*"), 6).alias("avg_nll")))
