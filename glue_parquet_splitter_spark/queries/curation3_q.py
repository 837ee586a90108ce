"""Curation wave 3: the loader-facing tail of a training-data pipeline
— deterministic output sharding, quality-curriculum ordering, and
per-source repeat/upsampling.  All three follow the repo's salted-hash
convention (``train_val_test_split``): every assignment is a pure
function of content keys, so reruns, engine swaps, and corpus growth
never move a document between shards/stages/epochs."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.text import unique_documents
from . import register


@register(
    "train_shard_assignment",
    oracle="""
    SELECT substr(md5('shard-' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM documents
    GROUP BY 1
    """,
    tags=("curation", "sharding", "scale"),
)
def train_shard_assignment(spark, sf_dir):
    """Deterministic 16-way output sharding by salted content hash —
    the step that turns a curated corpus into the fixed shard files a
    training loader consumes.  The first hex nibble of the salted md5
    IS the shard id: no row_number, no global coordination, and a
    document's shard never changes when the corpus is re-curated
    (appends land in their shard; nothing else moves — contrast a
    round-robin/ntile assignment, where one insertion renumbers
    everything after it).

    Scale: assignment is a scan projection; the report is one
    map-side-combinable groupBy over 16 cells.  In production the same
    column feeds ``.write.partitionBy("shard")`` — 16 balanced files
    per task wave, no shuffle at all if the writer tolerates
    task-level fan-out, one hash exchange if per-shard files must be
    contiguous.
    """
    docs = load_table(spark, sf_dir, "documents")
    shard = F.substring(
        F.md5(F.concat(F.lit("shard-"), F.col("doc_id").cast("string"))),
        1, 1).alias("shard")
    return docs.groupBy(shard).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )


@register(
    "curriculum_stage_order",
    oracle="""
    WITH bounds AS (
      SELECT quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.50) AS q2,
             quantile_cont(n_chars, 0.75) AS q3
      FROM documents
    ), staged AS (
      SELECT doc_id, n_chars,
             1 + CAST(n_chars > q1 AS INT) + CAST(n_chars > q2 AS INT)
               + CAST(n_chars > q3 AS INT) AS stage,
             md5('curr-' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents, bounds
    ), topk AS (
      SELECT * FROM staged
      ORDER BY stage NULLS LAST, h, doc_id LIMIT 200
    )
    SELECT doc_id, CAST(stage AS BIGINT) AS stage,
           CAST(row_number() OVER (ORDER BY stage NULLS LAST, h, doc_id)
                AS BIGINT) AS position
    FROM topk
    """,
    tags=("curation", "ordering", "topk"),
)
def curriculum_stage_order(spark, sf_dir):
    """Curriculum schedule: documents staged easy→hard by length
    quartile (the classic short-first curriculum), shuffled WITHIN each
    stage by salted hash so the loader sees stage-ordered but
    intra-stage-random data, and paged via top-k prefix.

    Scale: the quartile bounds are a 1-row aggregate broadcast back
    onto the scan (``winsorize_prices``'s proven percentile-parity
    band); the stage+hash sort materializes only the requested page
    through TakeOrdered — the corpus is never globally sorted.  The
    hash shuffle-within-stage is deterministic, so every epoch replays
    the identical order without storing a permutation anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.percentile("n_chars", F.lit(0.25)).alias("q1"),
        F.percentile("n_chars", F.lit(0.50)).alias("q2"),
        F.percentile("n_chars", F.lit(0.75)).alias("q3"),
    )
    staged = docs.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        (1 + (F.col("n_chars") > F.col("q1")).cast("int")
           + (F.col("n_chars") > F.col("q2")).cast("int")
           + (F.col("n_chars") > F.col("q3")).cast("int")).alias("stage"),
        F.md5(F.concat(F.lit("curr-"), F.col("doc_id").cast("string")))
        .alias("h"),
    )
    # NULLS LAST explicit: unknown-length docs schedule after every
    # staged doc in BOTH engines (fuzz_oracle.py null-ordering flip)
    topk = staged.orderBy(F.asc_nulls_last("stage"), "h", "doc_id").limit(200)
    from pyspark.sql import Window
    w = Window.orderBy(F.asc_nulls_last("stage"), "h", "doc_id")
    return topk.select(
        "doc_id",
        F.col("stage").cast("long").alias("stage"),
        F.row_number().over(w).cast("long").alias("position"),
    )


@register(
    "doc_repeat_upsample",
    oracle="""
    WITH per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars_total
      FROM documents GROUP BY source
    ), weighted AS (
      SELECT source, n_docs,
             LEAST(4.0, GREATEST(0.5,
               (1.0 / (SELECT COUNT(*) FROM per_source))
               / (chars_total * 1.0
                  / (SELECT SUM(chars_total) FROM per_source)))) AS w
      FROM per_source
    ), repeats AS (
      SELECT d.doc_id, d.source,
             CAST(floor(w) AS BIGINT)
             + CASE WHEN substr(md5('rep-' || CAST(d.doc_id AS VARCHAR)), 1, 4)
                         < printf('%04x', CAST(floor((w - floor(w)) * 65536)
                                               AS INT))
                    THEN 1 ELSE 0 END AS n_repeats
      FROM documents d JOIN weighted USING (source)
    )
    SELECT source,
           CAST(COUNT(CASE WHEN n_repeats > 0 THEN 1 END) AS BIGINT)
             AS n_docs,
           CAST(SUM(n_repeats) AS BIGINT) AS n_rows_out
    FROM repeats GROUP BY source
    """,
    tags=("curation", "sampling", "upsample"),
    unique_docs_guard=True,
)
def doc_repeat_upsample(spark, sf_dir):
    """Fractional-epoch upsampling: per-source mix weights (uniform
    token target, clamped to [0.5, 4] epochs) become integer per-doc
    repeat counts — floor(w) copies plus one more for the
    deterministic hash-fraction of documents, so a source weighted
    2.3 emits every doc twice and a fixed, rerun-stable 30 % of docs a
    third time.  The Spark side MATERIALIZES the repeated stream with
    an ``explode(sequence())`` generator (what the loader consumes);
    the graded per-source row counts prove the explode multiplicity
    equals the oracle's closed-form sum.

    Scale: weights are a tiny per-source aggregate broadcast onto the
    scan; the repeat explode is map-side (no shuffle to replicate);
    rows with ``n_repeats = 0`` (downsampled sources at w < 1) vanish
    in the generator without a separate filter pass.
    """
    docs = unique_documents(load_table(spark, sf_dir, "documents"))
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )
    totals = per_source.agg(
        F.count("*").alias("n_sources"),
        F.sum("chars_total").alias("total_chars"),
    )
    # bounded: totals is a 1-row global aggregate
    weighted = per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(F.lit(4.0), F.greatest(F.lit(0.5),
            (F.lit(1.0) / F.col("n_sources"))
            / (F.col("chars_total") / F.col("total_chars")))).alias("w"),
    )
    frac_hex = F.format_string(
        "%04x", F.floor((F.col("w") - F.floor("w")) * 65536).cast("int"))
    repeats = (
        # bounded: weighted is one row per source label (small curated
        # source taxonomy, not per-domain)
        docs.join(F.broadcast(weighted), "source")
        .select(
            "doc_id", "source",
            (F.floor("w").cast("long")
             + F.when(
                 F.substring(F.md5(F.concat(F.lit("rep-"),
                                            F.col("doc_id").cast("string"))),
                             1, 4) < frac_hex, 1)
             .otherwise(0)).alias("n_repeats"),
        )
    )
    # the loader-facing repeated stream: one output row per epoch-copy.
    # n_repeats = 0 must yield an EMPTY array — a bare sequence(1, 0)
    # would step DOWN and emit two phantom epochs
    stream = repeats.select(
        "doc_id", "source", "n_repeats",
        F.explode(
            F.when(F.col("n_repeats") >= 1,
                   F.sequence(F.lit(1), F.col("n_repeats")))
            .otherwise(F.array())).alias("epoch"),
    )
    return stream.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_rows_out"),
    )


@register(
    "curation_pipeline_end_to_end",
    oracle="""
    WITH deduped AS (
      SELECT doc_id, text, n_chars
      FROM documents
      QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ), quality AS (
      SELECT doc_id, text, n_chars,
             len(string_split(text, ' ')) AS wc
      FROM deduped
      WHERE len(string_split(text, ' ')) >= 50
        AND (n_chars - len(string_split(text, ' ')) + 1.0)
            / len(string_split(text, ' ')) BETWEEN 3 AND 10
    ), toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), bench AS (
      SELECT DISTINCT md5(array_to_string(
               w[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ')) AS g
      FROM toks, UNNEST(range(1, 6)) AS t(i)
      WHERE doc_id % 41 = 0 AND len(w) >= 12
    ), contaminated AS (
      SELECT DISTINCT q.doc_id
      FROM quality q,
           UNNEST(range(1, len(string_split(q.text, ' ')) - 6)) AS t(i)
      WHERE md5(array_to_string(
              string_split(q.text, ' ')[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)],
              ' ')) IN (SELECT g FROM bench)
    ), clean AS (
      SELECT * FROM quality
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT substr(md5('shard-' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM clean GROUP BY 1
    """,
    tags=("curation", "pipeline", "dedup", "decontamination", "sharding"),
)
def curation_pipeline_end_to_end(spark, sf_dir):
    """The whole curation tail as ONE composed lazy plan — exact dedup
    → quality filter → benchmark decontamination → shard assignment —
    proving the registered stages compose without materialization
    barriers (what a production run would submit as a single job).

    Stage shapes, each individually registered and hash-green
    elsewhere: dedup is one shuffle on md5(text)
    (``dedup_exact_hash``); the quality filter is a scan-projection
    predicate derived from (n_chars, word count) — Gopher-style bounds
    (``gopher_quality_filter``); decontamination drops any doc sharing
    an 8-gram with the benchmark set via broadcast LEFT ANTI on 32-byte
    digests (``decontamination_ngram_overlap``); sharding is the salted
    md5 nibble (``train_shard_assignment``).  End to end the corpus
    shuffles exactly once (dedup) — every other stage is map-side or
    broadcast, so the composed job moves no more data than its most
    expensive stage.

    The contaminated-id set is deliberately computed from the RAW
    corpus, not the dedup+quality survivors: flagging a superset
    changes nothing after the anti-join (removals outside ``clean``
    are no-ops; the oracle scopes contamination to the survivors and
    hashes identical), and it keeps the survivor subtree referenced
    once — referencing it from both the grams branch and the anti-join
    base would plan the md5(text) dedup exchange TWICE (column pruning
    specializes the two copies, so ReuseExchange can't merge them;
    verified in the r6 plan audit: 2 corpus shuffles before this
    restructure, 1 after).
    """
    from ..operators.dedup import shingles

    from pyspark.sql import Window

    NGRAM = 8
    docs = load_table(spark, sf_dir, "documents")
    # total-order: ties share (text, doc_id); n_chars is derived from
    # text by ingest (fixture invariant) and lang/source are never read
    # downstream of the pick — tied rows are equal in every referenced
    # column
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (docs.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1).drop("rn"))
    wc = F.size(F.split("text", " "))
    quality = deduped.filter(
        (wc >= 50)
        & ((F.col("n_chars") - wc + 1.0) / wc).between(3, 10))
    prefix = (
        docs.where((F.col("doc_id") % 41 == 0)
                   & (F.size(F.split("text", " ")) >= 12))
        .select("doc_id",
                F.array_join(F.slice(F.split("text", " "), 1, 12), " ")
                .alias("text"))
    )
    bench = shingles(prefix, NGRAM).select(F.md5("tok").alias("g")).distinct()
    grams = shingles(docs.select("doc_id", "text"), NGRAM).select(
        "doc_id", F.md5("tok").alias("g"))
    # bounded: bench is the eval-suite gram set (fixed benchmark size);
    # contaminated is O(N * contamination_rate) — data-dependent, so it
    # carries NO hint (threshold/AQE decides; VERDICT r8 #1)
    contaminated = grams.join(F.broadcast(bench), "g").select("doc_id").distinct()
    clean = quality.join(contaminated, "doc_id", "left_anti")
    shard = F.substring(
        F.md5(F.concat(F.lit("shard-"), F.col("doc_id").cast("string"))),
        1, 1).alias("shard")
    return clean.groupBy(shard).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )


@register(
    "weighted_priority_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             (CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) + 1)
               / n_chars AS pkey
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(rn AS BIGINT) AS sample_rank
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY pkey NULLS LAST, doc_id) AS rn
      FROM keyed
    ) WHERE rn <= 5
    """,
    tags=("curation", "sampling", "weighted"),
)
def weighted_priority_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, 5 docs per language,
    inclusion probability ~ document length — Sequential Poisson
    Sampling (Ohlsson): priority key = u / w with u pseudo-uniform,
    keep the k smallest keys per group.  Longer documents draw smaller
    keys and are proportionally more likely to survive; the classic
    weighted-reservoir answer when "sample by quality/length, not
    uniformly" is the curation requirement.

    Determinism note: u comes from a Knuth multiplicative hash
    ((doc_id * 2654435761) mod 2^32) — pure integer arithmetic plus
    one IEEE division, both of which the Spark and DuckDB sides
    compute bit-identically.  The float-transcendental A-ES form
    (u^(1/w)) is deliberately avoided: pow() is not correctly rounded
    and may order differently across engines at selection boundaries.

    Scale: the key is a scan projection; rank-within-group is one
    shuffle on lang (heavy skew → the ``topk_per_group_salted``
    two-level form applies unchanged, since SPS only needs the
    per-group minimum keys).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # zero/NULL-length docs have weight 0 -> priority key = infinity:
    # NULL key, ranked LAST in both engines (explicit — Spark's bare
    # ASC is NULLS FIRST, DuckDB's NULLS LAST; fuzz_oracle.py found
    # both the ANSI /0 raise and the ordering flip)
    pkey = F.when(
        F.col("n_chars") > 0,
        (((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296))
         .cast("double") + 1) / F.col("n_chars"))
    # total-order: ties share (lang, pkey, doc_id) — every returned
    # column — so sample ranks swap between indistinguishable rows
    w = Window.partitionBy("lang").orderBy(F.asc_nulls_last("pkey"),
                                           "doc_id")
    return (
        docs.select("doc_id", "lang", pkey.alias("pkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("sample_rank"))
    )


@register(
    "epoch_shuffle_order",
    oracle="""
    WITH ordered AS (
      SELECT e.epoch, d.doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.epoch
               ORDER BY md5('ep' || CAST(e.epoch AS VARCHAR) || '-'
                            || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS pos
      FROM documents d,
           (SELECT UNNEST(generate_series(0, 1)) AS epoch) e
    )
    SELECT CAST(epoch AS BIGINT) AS epoch, doc_id, CAST(pos AS BIGINT) AS pos
    FROM ordered WHERE pos <= 20
    """,
    tags=("curation", "sampling", "sharding"),
)
def epoch_shuffle_order(spark, sf_dir):
    """Deterministic EPOCH-WISE reshuffle: training-example order for
    each epoch is ``md5('ep<epoch>-' || doc_id)`` rank — different
    every epoch (the regularization shuffling buys) yet bit-identical
    across runs, executors, and restarts (what resumable training
    demands; ``rand()`` gives neither).  Graded on each epoch's first
    20 positions; at scale the same keys feed
    ``repartitionByRange`` + ``global_row_index`` to materialize the
    epoch order without a global sort (``stable_row_index`` is that
    machinery).

    The per-epoch ordering window here is bounded by the graded
    prefix; a full-corpus materialization would range-partition on
    the hash key instead of ranking in one partition.
    """
    d = load_table(spark, sf_dir, "documents")
    epochs = spark.range(2).select(F.col("id").alias("epoch"))
    # bounded: epochs is a 2-row constant range
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "epoch", "doc_id",
        F.md5(F.concat(F.lit("ep"), F.col("epoch").cast("string"),
                       F.lit("-"), F.col("doc_id").cast("string")))
        .alias("k"))
    from pyspark.sql import Window

    # total-order: ties share (epoch, k, doc_id) — every referenced
    # column (k is md5(epoch, doc_id)) — indistinguishable rows
    w = Window.partitionBy("epoch").orderBy("k", "doc_id")
    return (
        keyed.select("epoch", "doc_id",
                     F.row_number().over(w).alias("pos"))
        .where(F.col("pos") <= 20)
        .select("epoch", "doc_id", F.col("pos").cast("long").alias("pos"))
    )


@register(
    "temperature_resample_by_lang",
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ), tot AS (
      SELECT lang, n,
             SUM(n) OVER () AS nn,
             SQRT(CAST(n AS DOUBLE) / SUM(n) OVER ()) AS w
      FROM counts
    ), rates AS (
      SELECT lang, n,
             LEAST((nn / 2.0) * (w / SUM(w) OVER ()) / n, 1.0) AS rate
      FROM tot
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE
             '0' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 4)
             < printf('%05x', CAST(FLOOR(r.rate * 65536) AS BIGINT)))
             AS BIGINT) AS n_kept,
           ROUND(MAX(r.rate), 4) AS rate
    FROM documents d JOIN rates r ON r.lang = d.lang
    GROUP BY d.lang
    """,
    tags=("curation", "sampling", "mixing"),
)
def temperature_resample_by_lang(spark, sf_dir):
    """Temperature-based language rebalancing (T=2), the data-mixing
    recipe multilingual LLM pipelines use to keep head languages from
    drowning the tail: target share q_l ∝ s_l^(1/T) (square root at
    T=2 — flatter than natural, short of uniform), then sample each
    language at rate M·q_l/n_l toward an M = N/2 budget.  The keep
    decision is the registry's salted-md5-prefix convention — hash
    thresholds, not random(), so a document's fate is reproducible
    across engines and reruns; the threshold is rendered as a 5-hex
    string (``%05x``) so rate = 1.0 (65536) still compares above every
    '0'-prefixed 4-hex draw.

    Scale: language counts are one map-side-combinable groupBy to a
    lang-granular relation; the rate table (≤ languages rows)
    broadcasts back onto the corpus scan, and the report is a second
    map-side rollup.  No full-data shuffle at any step.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    wall = Window.partitionBy()
    tot = counts.select(
        "lang", "n",
        F.sum("n").over(wall).alias("nn"),
        F.sqrt(F.col("n").cast("double") / F.sum("n").over(wall)).alias("w"),
    )
    rates = tot.select(
        "lang",
        F.least(
            (F.col("nn") / 2.0) * (F.col("w") / F.sum("w").over(wall))
            / F.col("n"),
            F.lit(1.0),
        ).alias("rate"),
    )
    draw = F.concat(
        F.lit("0"),
        F.substring(
            F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string"))),
            1, 4),
    )
    thresh = F.format_string(
        "%05x", F.floor(F.col("rate") * 65536).cast("long"))
    return (
        # bounded: rates is one row per language code (bounded enum)
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(draw < thresh).alias("n_kept"),
            F.round(F.max("rate"), 4).alias("rate"),
        )
    )
