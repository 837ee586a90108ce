"""Curation wave 2: the chunk/cap/mix operators a training-data build
runs after filtering — all JVM-side (no Python in the hot path), all
deterministic so reruns and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.text import unique_documents
from . import register

CHUNK = 100   # tokens per training chunk
STRIDE = 80   # 20-token overlap between consecutive chunks


@register(
    "doc_chunk_overlap_sql",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens
      FROM documents
    ), starts AS (
      SELECT doc_id, tokens, UNNEST(range(0, len(tokens), {STRIDE})) AS start
      FROM toks
    )
    SELECT doc_id, CAST(start AS BIGINT) AS start,
           CAST(LEAST(len(tokens) - start, {CHUNK}) AS BIGINT)
             AS n_chunk_tokens,
           md5(array_to_string(tokens[start + 1 : start + {CHUNK}], ' '))
             AS chunk_hash
    FROM starts
    """,
    tags=("curation", "chunking", "generator"),
)
def doc_chunk_overlap_sql(spark, sf_dir):
    """Sliding-window chunking for LLM training: each document yields
    ``ceil(n_tokens / stride)`` chunks of ≤100 tokens with 20-token
    overlap.  Pure generator + slice expressions — the JVM/codegen
    counterpart of the Python-UDTF chunker (``python_udtf_chunks``),
    and the form that survives 100 TB: ``explode(sequence(...))`` is
    map-side only, no shuffle, no Python.  Chunk text is returned as a
    hash (the identity a dedup/pack stage joins on), not as a second
    copy of the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    # NULL text = no chunks (oracle's range(len(NULL)) yields no rows;
    # found by scripts/fuzz_oracle.py)
    toks = (docs.filter(F.col("text").isNotNull())
            .select("doc_id", F.split("text", " ").alias("tokens")))
    starts = toks.select(
        "doc_id", "tokens",
        F.explode(
            F.sequence(F.lit(0),
                       F.greatest(F.size("tokens") - 1, F.lit(0)),
                       F.lit(STRIDE))
        ).alias("start"),
    )
    return starts.select(
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.least(F.size("tokens") - F.col("start"), F.lit(CHUNK))
         .cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", F.slice("tokens", F.col("start") + 1, CHUNK)))
         .alias("chunk_hash"),
    )


@register(
    "domain_cap_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM documents
    )
    SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 50
    """,
    tags=("curation", "sampling", "window"),
)
def domain_cap_sample(spark, sf_dir):
    """Per-domain document cap (the Common-Crawl "max N pages per
    domain" rule): rank each source's docs by a salted hash — a
    deterministic shuffle, so the sample is stable across reruns and
    machines — and keep the first 50.

    Scale: one hash-partition by ``source`` + in-partition top-N; no
    global sort, no driver state.  Skewed mega-domains are exactly the
    rows the cap discards, so the skew bounds itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    # total-order: ties are duplicate doc_ids equal in every referenced
    # column (doc_id, source) — ranks swap between indistinguishable
    # rows; the <=50 cut keeps the same multiset either way
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", "source",
                    F.row_number().over(w).cast("long").alias("rnk"))
        .where(F.col("rnk") <= 50)
    )


@register(
    "quality_decile_mix",
    oracle="""
    WITH dec AS (
      SELECT n_chars,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents
      WHERE n_chars IS NOT NULL
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           ROUND(SUM(n_chars) / SUM(SUM(n_chars)) OVER (), 4) AS char_share
    FROM dec GROUP BY decile
    """,
    tags=("curation", "sampling", "window"),
)
def quality_decile_mix(spark, sf_dir):
    """Quality-stratified mixing table: bucket the corpus into size
    deciles (``ntile`` with a total order — doc_id tiebreak keeps the
    bucket assignment deterministic) and report each decile's share of
    total characters — the weights a curriculum/mixture sampler
    consumes.

    Scale note: ``ntile`` over a global ORDER BY is a single-partition
    sort — fine for the decile *table* (output is 10 rows) but the
    ranking input at 100 TB should be pre-aggregated or approximated
    via ``approx_percentile`` cutpoints; this query is the exact
    small-side oracle of that pattern.
    """
    docs = load_table(spark, sf_dir, "documents")
    # NULL n_chars cannot be length-binned — excluded in both engines
    # (fuzz_oracle.py: the null-ordering flip put the null docs in
    # decile 1 on one engine and decile 10 on the other)
    dec = docs.filter(F.col("n_chars").isNotNull()).select(
        "n_chars",
        # bounded: corpus-row ordering — deliberately the EXACT oracle
        # form; quality_decile_mix_histogram is the REGISTERED scale
        # substitute (histogram-cumulative, no global sort)
        F.ntile(10).over(Window.orderBy("n_chars", "doc_id")).alias("decile"),
    )
    agg = dec.groupBy("decile").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars_total"),
    )
    return agg.select(
        F.col("decile").cast("int"),
        "n_docs",
        F.col("chars_total").cast("long"),
        F.round(F.col("chars_total") / F.sum("chars_total").over(Window.partitionBy()),
                4).alias("char_share"),
    )


@register(
    "linechunk_dedup_rebuild",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), chunks AS (
      SELECT doc_id, t, UNNEST(range(0, len(t), 10)) AS start FROM toks
    ), named AS (
      SELECT doc_id, CAST(start AS BIGINT) AS start,
             array_to_string(t[start + 1 : start + 10], ' ') AS chunk
      FROM chunks
    ), ranked AS (
      SELECT doc_id, start, chunk,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, start) AS rnk
      FROM named
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           md5(COALESCE(string_agg(CASE WHEN rnk = 1 THEN chunk END,
                                   ' ' ORDER BY start), '')) AS rebuilt_hash
    FROM ranked GROUP BY doc_id
    """,
    tags=("curation", "dedup", "text"),
    unique_docs_guard=True,
)
def linechunk_dedup_rebuild(spark, sf_dir):
    """Span-level dedup with document rebuild (the C4/RefinedWeb "line
    dedup" rule at 10-token granularity): a span repeated anywhere in
    the corpus survives only at its first occurrence (lowest doc_id,
    then position); every document is then reassembled from its kept
    spans, returned as a hash plus kept/total counts.

    Scale: one shuffle on the span hash (short md5 key) for the global
    first-occurrence rank, one shuffle on doc_id for the rebuild —
    never materializes pairs, never compares documents directly
    (contrast ``minhash_lsh_candidates``, which targets whole-doc
    near-duplication; this kills boilerplate spans inside otherwise
    unique docs).
    """
    docs = unique_documents(load_table(spark, sf_dir, "documents"))
    # NULL text = no spans (matches the oracle's range-over-NULL)
    toks = (docs.filter(F.col("text").isNotNull())
            .select("doc_id", F.split("text", " ").alias("t")))
    chunks = toks.select(
        "doc_id", "t",
        F.explode(F.sequence(F.lit(0),
                             F.greatest(F.size("t") - 1, F.lit(0)),
                             F.lit(10))).alias("start"),
    ).select(
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.concat_ws(" ", F.slice("t", F.col("start") + 1, 10)).alias("chunk"),
    )
    # total-order: ties agree on (chunk, doc_id, start) — every column
    # the keep-flag and rebuild read — so rnk==1 lands on an
    # indistinguishable row whatever the roll
    ranked = chunks.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "start")),
    )
    kept_struct = F.when(F.col("rnk") == 1, F.struct("start", "chunk"))
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("rnk") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x["chunk"]),
            " ")).alias("rebuilt_hash"),
    )


@register(
    "quality_decile_mix_histogram",
    oracle="""
    WITH c AS (
      SELECT n_chars, COUNT(*) AS cnt FROM documents
      WHERE n_chars IS NOT NULL GROUP BY n_chars
    ), cum AS (
      SELECT n_chars, cnt,
             SUM(cnt) OVER (ORDER BY n_chars) AS cum,
             SUM(cnt) OVER () AS n
      FROM c
    )
    SELECT CAST((10 * cum + n - 1) // n AS INT) AS decile,
           CAST(SUM(cnt) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars * cnt) AS BIGINT) AS chars_total,
           ROUND(SUM(n_chars * cnt)
                 / SUM(SUM(n_chars * cnt)) OVER (), 4) AS char_share
    FROM cum GROUP BY decile
    """,
    tags=("curation", "sampling", "histogram"),
)
def quality_decile_mix_histogram(spark, sf_dir):
    """The 100 TB-safe companion to ``quality_decile_mix``: decile
    mixing weights WITHOUT a global row sort.

    Plan shape: (1) hash-aggregate the corpus to one row per distinct
    ``n_chars`` value — the only full-data pass, a map-side-combinable
    groupBy; (2) cumulative counts over the tiny aggregated histogram
    (a window sort over distinct VALUES, not rows — bounded by the
    value domain, not the corpus); (3) assign each value its decile by
    integer ceiling-division of its cumulative rank — pure arithmetic,
    no floating-point boundary jitter, bit-identical in any engine.
    Ties share a decile (value-granular buckets), which is exactly what
    a mixture sampler wants: a document's bucket never depends on
    which shard it sat in.

    This is the same pattern as approx_percentile cutpoints + bucket
    join, but exact whenever the value domain is boundable — and
    deterministic, so it hash-matches a DuckDB oracle instead of
    needing a tolerance gate.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = (docs.filter(F.col("n_chars").isNotNull())   # as in the exact twin
         .groupBy("n_chars").agg(F.count("*").alias("cnt")))
    cum = c.select(
        "n_chars", "cnt",
        # bounded: fed by groupBy(n_chars) — one row per distinct
        # document LENGTH (value-domain-bounded, ~thousands max)
        F.sum("cnt").over(
            Window.orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    dec = cum.select(
        "n_chars", "cnt",
        F.expr("(10 * cum + n - 1) div n").cast("int").alias("decile"),
    )
    agg = dec.groupBy("decile").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum(F.col("n_chars") * F.col("cnt")).alias("chars_total"),
    )
    return agg.select(
        "decile", "n_docs",
        F.col("chars_total").cast("long").alias("chars_total"),
        F.round(F.col("chars_total")
                / F.sum("chars_total").over(Window.partitionBy()),
                4).alias("char_share"),
    )
