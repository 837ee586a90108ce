"""Curation wave 7 (round 10, wave 3): source-level mirror detection,
dedup at the streaming ingest boundary, and deterministic quota
apportionment — the operations that sit between per-doc curation and
fleet-level corpus management.

Reference anchor: the reference pipeline stops at per-key parquet
fan-out (src/Split/parquet-splitter.py:166-168); everything here is
north-star LLM-pipeline surface with no reference analogue.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import similarity as S
from . import register

_XS_GRAM = 8        # word n-gram width for cross-source fingerprints
_XS_DF_CAP = 10     # drop fingerprints owned by more than this many docs
_QUOTA_B = 1000     # shards to apportion across sources
_SWEEP_TH = (0.5, 0.6, 0.7, 0.8, 0.9, 0.95)   # eps sweep grid
_SWEEP_BLOCKS = 8   # vec_id % blocks bounds the pairwise work
_NEYMAN_B = 500     # eval-set sample budget


@register(
    "cross_source_overlap_matrix",
    oracle=f"""
    WITH g AS (
      SELECT DISTINCT source, doc_id, md5(gram) AS h
      FROM (
        SELECT source, doc_id,
               array_to_string(a[CAST(i AS INT):CAST(i + {_XS_GRAM} - 1
                 AS INT)], ' ') AS gram
        FROM (SELECT source, doc_id, string_split(text, ' ') AS a
              FROM documents),
             UNNEST(range(1, len(a) - {_XS_GRAM} + 2)) AS u(i)
        WHERE len(a) >= {_XS_GRAM})),
    keep AS (
      SELECT h FROM (SELECT DISTINCT doc_id, h FROM g)
      GROUP BY h HAVING COUNT(*) BETWEEN 2 AND {_XS_DF_CAP}),
    sg AS (SELECT DISTINCT source, h FROM g JOIN keep USING (h)),
    szs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_h
            FROM (SELECT DISTINCT source, h FROM g) GROUP BY source),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM sg a JOIN sg b ON b.h = a.h AND b.source > a.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, shared,
           ROUND(shared / CAST(LEAST(sa.n_h, sb.n_h) AS DOUBLE), 4)
             AS containment
    FROM pairs
    JOIN szs sa ON sa.source = src_a
    JOIN szs sb ON sb.source = src_b
    """,
    tags=("curation", "dedup", "join"),
)
def cross_source_overlap_matrix(spark, sf_dir):
    """Mirror/syndication detection at SOURCE granularity: the
    source-pair matrix of shared word-8-gram fingerprints, scored by
    containment = shared / min(|grams_a|, |grams_b|).  A high-overlap
    pair is a mirror site or syndication feed — dedup at the source
    level (drop the mirror) before per-doc dedup ever runs, the
    cheapest duplicate removal a crawl pipeline has.

    Scale: gram fan-out is map-side (array slice over the token
    array); fingerprints owned by more than {cap} DOCS are dropped
    before anything pairs (boilerplate grams are the skew hazard —
    note the cap is per-doc ownership, catching boilerplate even when
    it lives inside two giant sources); the source-level pair join
    runs on the deduplicated (source, hash) index, so fan-out per
    fingerprint is bounded by min(cap, |sources|).  Only md5s shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", "doc_id", F.split("text", " ").alias("a"))
    g = (toks.filter(F.size("a") >= _XS_GRAM)
         .select("source", "doc_id", F.explode(F.expr(
             f"transform(sequence(1, size(a) - {_XS_GRAM} + 1),"
             f" i -> array_join(slice(a, CAST(i AS INT), {_XS_GRAM}),"
             f" ' '))")).alias("gram"))
         .select("source", "doc_id", F.md5("gram").alias("h"))
         .distinct())
    keep = (g.select("doc_id", "h").distinct()
            .groupBy("h").agg(F.count("*").alias("df"))
            .filter((F.col("df") >= 2) & (F.col("df") <= _XS_DF_CAP))
            .select("h"))
    sg = g.join(keep, "h").select("source", "h").distinct()
    szs = (g.select("source", "h").distinct()
           .groupBy("source").agg(F.count("*").alias("n_h")))
    b = sg.select(F.col("source").alias("src_b"), F.col("h").alias("bh"))
    pairs = (sg.join(b, (F.col("h") == F.col("bh"))
                    & (F.col("src_b") > F.col("source")))
             .groupBy(F.col("source").alias("src_a"), "src_b")
             .agg(F.count("*").alias("shared")))
    sa = szs.select(F.col("source").alias("src_a"),
                    F.col("n_h").alias("n_a"))
    sb = szs.select(F.col("source").alias("src_b"),
                    F.col("n_h").alias("n_b"))
    return (pairs.join(sa, "src_a").join(sb, "src_b")
            .select("src_a", "src_b", "shared",
                    F.round(F.col("shared")
                            / F.least("n_a", "n_b").cast("double"), 4)
                    .alias("containment")))


@register(
    "streaming_ingest_dedup",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 < 8)
    SELECT d.doc_id, d.lang, md5(d.text) AS h
    FROM documents d
    LEFT JOIN hist ON hist.h = md5(d.text)
    WHERE d.doc_id % 10 >= 8 AND hist.h IS NULL
    """,
    tags=("streaming", "dedup"),
)
def streaming_ingest_dedup(spark, sf_dir):
    """Exact dedup AT THE INGEST BOUNDARY as real Structured
    Streaming: new documents arriving as files (the ``doc_id % 10 >=
    8`` slice plays the landing batch) are content-hashed and
    stream-static LEFT ANTI joined against the already-ingested
    history's hash set — only genuinely-new docs pass downstream.
    This is ``dedup_against_history`` moved from nightly batch to
    per-file latency; stateless on the stream side (the static side
    carries all the memory), so append-mode output equals the batch
    anti join row for row — which is what the oracle grades.

    Scale: the static history is a hash-only column (32-char md5s, no
    text); Spark re-plans the static side per micro-batch, so the join
    degrades gracefully from broadcast to shuffle as history grows.
    See :func:`..streaming.windows.run_ingest_dedup_stream`.
    """
    from ..streaming.windows import run_ingest_dedup_stream

    return run_ingest_dedup_stream(spark, f"{sf_dir}/documents.parquet")


@register(
    "embedding_dedup_threshold_sweep",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, vec_id % {_SWEEP_BLOCKS} AS cid, i,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)),
    norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM v
              GROUP BY vec_id),
    ids AS (SELECT DISTINCT vec_id, cid FROM v),
    pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             ROUND(SUM(xa.x * xb.x) / (MIN(na.nrm) * MIN(nb.nrm)), 4) AS c
      FROM ids a JOIN ids b ON b.cid = a.cid AND a.vec_id < b.vec_id
      JOIN v xa ON xa.vec_id = a.vec_id
      JOIN v xb ON xb.vec_id = b.vec_id AND xb.i = xa.i
      JOIN norms na ON na.vec_id = a.vec_id
      JOIN norms nb ON nb.vec_id = b.vec_id
      GROUP BY a.vec_id, b.vec_id),
    th AS (SELECT CAST(unnest([{', '.join(str(t) for t in _SWEEP_TH)}])
             AS DOUBLE) AS thresh),
    nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM ({S.wf_embeddings_sql()}))
    SELECT th.thresh,
           CAST(SUM(CASE WHEN p.c >= th.thresh THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN p.c >= th.thresh THEN p.ib END)
                AS BIGINT) AS n_dropped,
           ROUND(COUNT(DISTINCT CASE WHEN p.c >= th.thresh THEN p.ib END)
                 / (SELECT n FROM nv), 4) AS drop_rate
    FROM th CROSS JOIN pairs p
    GROUP BY th.thresh
    """,
    tags=("similarity", "dedup", "curation"),
)
def embedding_dedup_threshold_sweep(spark, sf_dir):
    """The eps-sensitivity audit SemDeDup deployments run BEFORE
    picking a threshold: compute within-block cosine pairs ONCE, then
    report, for every eps on the grid, how many pairs exceed it and
    how much of the corpus a keep-lowest-id policy would drop.  A
    cliff between adjacent thresholds means the corpus has a dense
    near-dup band and eps needs care; a flat curve means any eps in
    the band is safe.

    Scale: one pass builds the pair similarities (blocked by
    vec_id % {blocks} — the same bounded-pairwise contract as the
    SemDeDup family; production swaps in the k-means assignment) and
    the 6-threshold grid is a map-side literal fan-out over the pair
    rows — the sweep costs one extra agg, NOT six recomputed dedups.
    Cosines round to 4 decimals before the comparison in both engines.
    """
    # finite-vector + identity contract — mirrors the oracle wfd
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    # norm folded once per row, not twice per candidate pair (the
    # knn_graph_lsh recipe).  NO cast is added: this site has always
    # folded the raw array<float> column (the round-4 output absorbs
    # the float-vs-double seam) and the hoisted norm must be the
    # IDENTICAL float expression cosine() would have produced inline.
    v = (e.select("vec_id", (F.col("vec_id") % _SWEEP_BLOCKS).alias("cid"),
                  "embedding")
         .withColumn("_nv", S.l2_norm(F.col("embedding"))))
    b = v.select(F.col("vec_id").alias("ib"), F.col("cid").alias("bcid"),
                 F.col("embedding").alias("be"), F.col("_nv").alias("nb"))
    pairs = (v.join(b, (F.col("cid") == F.col("bcid"))
                    & (F.col("ib") > F.col("vec_id")))
             .select(F.col("vec_id").alias("ia"), "ib",
                     F.round(F.try_divide(
                         S.dot(F.col("embedding"), F.col("be")),
                         F.col("_nv") * F.col("nb")), 4)
                     .alias("c")))
    swept = pairs.select(
        "ia", "ib", "c",
        F.explode(F.array(*[F.lit(t) for t in _SWEEP_TH])).alias("thresh"))
    nv = e.agg(F.count("*").cast("double").alias("n"))
    return (swept.groupBy("thresh")
            .agg(F.sum(F.when(F.col("c") >= F.col("thresh"), 1)
                       .otherwise(0)).cast("long").alias("n_pairs"),
                 F.countDistinct(F.when(F.col("c") >= F.col("thresh"),
                                        F.col("ib"))).alias("n_dropped"))
            .crossJoin(F.broadcast(nv))
            .select("thresh", "n_pairs", "n_dropped",
                    F.round(F.col("n_dropped") / F.col("n"), 4)
                    .alias("drop_rate")))


@register(
    "neyman_allocation_sampling",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sx,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
      FROM documents GROUP BY source),
    w AS (
      SELECT source, n_docs,
             sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)) AS wgt
      FROM s),
    tot AS (SELECT SUM(wgt) AS tw FROM w),
    q AS (
      SELECT source, n_docs, wgt,
             CAST(FLOOR({_NEYMAN_B} * wgt / (SELECT tw FROM tot))
                  AS BIGINT) AS base,
             {_NEYMAN_B} * wgt / (SELECT tw FROM tot)
               - FLOOR({_NEYMAN_B} * wgt / (SELECT tw FROM tot)) AS rem
      FROM w),
    r AS (SELECT source, n_docs, base, rem,
                 row_number() OVER (ORDER BY rem DESC, source NULLS LAST)
               AS rk
          FROM q),
    lo AS (SELECT {_NEYMAN_B} - SUM(base) AS l FROM q)
    SELECT source, n_docs, base,
           CAST(base + CASE WHEN rk <= (SELECT l FROM lo)
                            THEN 1 ELSE 0 END AS BIGINT) AS n_sample
    FROM r
    """,
    tags=("curation", "sampling", "window"),
)
def neyman_allocation_sampling(spark, sf_dir):
    """Neyman allocation for a stratified eval set: per-source sample
    sizes n_h ∝ N_h·σ_h (σ over doc length here), so high-variance
    strata get proportionally MORE eval budget than raw-count
    allocation would give — the minimum-variance estimator's
    allocation.  Integerized with the largest-remainder method so the
    quotas sum to exactly B={b}.

    Determinism note: N_h·σ_h = sqrt(N·Σx² − (Σx)²) — the moments are
    EXACT integer sums and IEEE sqrt is correctly rounded, so the
    weights are bit-identical in Spark and DuckDB; only the 20-term
    weight total is float-ordered, and the stability sweep guards the
    floor boundary.

    Scale: one corpus agg to |sources| rows of integer moments;
    everything after runs on the source dimension (the unpartitioned
    remainder-rank window is bounded by it).
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"))
    w = s.select(
        "source", "n_docs",
        F.sqrt((F.col("n_docs") * F.col("sxx")
                - F.col("sx") * F.col("sx")).cast("double")).alias("wgt"))
    tot = w.agg(F.sum("wgt").alias("tw"))
    # try_divide: a degenerate draw where EVERY stratum has zero
    # length-variance (all-singleton strata — seed-16 tiny spot
    # sweeps) zeroes the weight total; Neyman allocation is undefined
    # there and the whole allocation degrades to NULL quotas on both
    # engines (DuckDB's /0 is already NULL).  Unreachable on any
    # multi-doc-per-source fixture.
    share = F.try_divide(_NEYMAN_B * F.col("wgt"), F.col("tw"))
    q = (w.crossJoin(F.broadcast(tot))
         .select("source", "n_docs", "wgt",
                 F.floor(share).cast("long").alias("base"),
                 (share - F.floor(share)).alias("rem")))
    from pyspark.sql import Window

    # bounded: |sources| rows — the post-aggregate source dimension
    win = Window.orderBy(F.desc("rem"), F.asc("source"))
    r = q.withColumn("rk", F.row_number().over(win))
    lo = q.agg((F.lit(_NEYMAN_B) - F.sum("base")).alias("l"))
    return (r.crossJoin(F.broadcast(lo))
            .select("source", "n_docs", "base",
                    (F.col("base")
                     + F.when(F.col("rk") <= F.col("l"), 1).otherwise(0))
                    .cast("long").alias("n_sample")))


@register(
    "shard_quota_largest_remainder",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS n,
                 CAST(COUNT(*) AS BIGINT) AS k FROM s),
    q AS (
      SELECT source, n_docs,
             CAST(FLOOR({_QUOTA_B} * n_docs / (SELECT n FROM t))
                  AS BIGINT) AS base,
             {_QUOTA_B} * n_docs / (SELECT n FROM t)
               - FLOOR({_QUOTA_B} * n_docs / (SELECT n FROM t)) AS rem
      FROM s),
    r AS (
      SELECT source, n_docs, base, rem,
             row_number() OVER (ORDER BY rem DESC, source NULLS LAST)
               AS rk
      FROM q),
    left_over AS (
      SELECT {_QUOTA_B} - SUM(base) AS lo FROM q)
    SELECT source, n_docs, base,
           CAST(base + CASE WHEN rk <= (SELECT lo FROM left_over)
                            THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM r
    """,
    tags=("curation", "sampling", "window"),
)
def shard_quota_largest_remainder(spark, sf_dir):
    """Deterministic quota apportionment (Hamilton / largest-remainder
    method): split a fixed shard/sampling budget B={b} across sources
    proportional to their doc counts so the quotas are integers AND
    sum to exactly B — floor the proportional share, then hand the
    leftover units to the largest fractional remainders (source-name
    tie-break).  The allocator behind balanced shard layouts and
    per-source sampling budgets; the exactness property (Σ quota = B)
    is what naive rounding loses.

    Scale: one corpus agg to |sources| rows; everything after runs on
    the source dimension.  The unpartitioned remainder-rank window is
    bounded by that dimension's cardinality.
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    t = s.agg(F.sum("n_docs").cast("double").alias("n"))
    q = (s.crossJoin(F.broadcast(t))
         .select("source", "n_docs",
                 F.floor(_QUOTA_B * F.col("n_docs") / F.col("n"))
                 .cast("long").alias("base"),
                 (_QUOTA_B * F.col("n_docs") / F.col("n")
                  - F.floor(_QUOTA_B * F.col("n_docs") / F.col("n")))
                 .alias("rem")))
    from pyspark.sql import Window

    # bounded: |sources| rows — the post-aggregate source dimension
    # NULLS LAST on the tie-break: with tied remainders the NULL-source
    # group must sit at the same rank in both engines (fuzz_oracle.py)
    w = Window.orderBy(F.desc("rem"), F.asc_nulls_last("source"))
    r = q.withColumn("rk", F.row_number().over(w))
    lo = q.agg((F.lit(_QUOTA_B) - F.sum("base")).alias("lo"))
    return (r.crossJoin(F.broadcast(lo))
            .select("source", "n_docs", "base",
                    (F.col("base")
                     + F.when(F.col("rk") <= F.col("lo"), 1).otherwise(0))
                    .cast("long").alias("quota")))


@register(
    "embedding_health_audit",
    oracle="""
    WITH c AS (
      SELECT embedding AS v,
             CAST(embedding AS DOUBLE[]) AS vd,
             embedding IS NULL AS f_null,
             embedding IS NOT NULL AND len(embedding) = 0 AS f_empty,
             embedding IS NOT NULL AND len(embedding) > 0
               AND len(list_filter(embedding, x -> x IS NULL)) > 0
               AS f_nullcomp
      FROM embeddings),
    c2 AS (
      SELECT *,
             NOT f_null AND NOT f_empty AND NOT f_nullcomp AS pre,
             CASE WHEN NOT f_null AND NOT f_empty AND NOT f_nullcomp
                  THEN NOT isfinite(list_sum(list_transform(vd,
                                               x -> abs(x))))
                  ELSE FALSE END AS f_nonfinite
      FROM c),
    c3 AS (
      SELECT *, pre AND NOT f_nonfinite AS f_wfpre,
             CASE WHEN pre AND NOT f_nonfinite
                  THEN sqrt(list_sum(list_transform(vd, x -> x * x)))
             END AS nrm
      FROM c2),
    m AS (
      SELECT len(v) AS modal FROM c3 WHERE f_wfpre
      GROUP BY len(v) ORDER BY COUNT(*) DESC, len(v) LIMIT 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN f_null THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_vec,
           CAST(SUM(CASE WHEN f_empty THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty,
           CAST(SUM(CASE WHEN f_nullcomp THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_comp,
           CAST(SUM(CASE WHEN f_nonfinite THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonfinite,
           CAST(SUM(CASE WHEN f_wfpre AND len(v) <> (SELECT modal FROM m)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ragged,
           CAST(SUM(CASE WHEN f_wfpre AND len(v) = (SELECT modal FROM m)
                          AND nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_norm,
           ROUND(MIN(CASE WHEN f_wfpre AND len(v) = (SELECT modal FROM m)
                          THEN nrm END), 4) AS min_norm,
           ROUND(MAX(CASE WHEN f_wfpre AND len(v) = (SELECT modal FROM m)
                          THEN nrm END), 4) AS max_norm,
           ROUND(percentile_cont(0.5) WITHIN GROUP (
                 ORDER BY CASE WHEN f_wfpre
                                AND len(v) = (SELECT modal FROM m)
                               THEN nrm END), 4) AS median_norm
    FROM c3
    """,
    tags=("similarity", "agg", "quality"),
)
def embedding_health_audit(spark, sf_dir):
    """The embedding-health check every ANN/semantic-dedup pipeline
    runs BEFORE trusting its vectors — the DETECTOR side of the
    ``finite_vectors`` well-formedness contract (ADVICE r11): it
    counts every malformed class that contract excludes (NULL vector,
    empty vector, NULL components, non-finite components, ragged
    length vs the modal corpus dimension) plus the zero-norm count
    (collapsed encodes — cosine is undefined on them) and the norm
    distribution (min/median/max) over the well-formed remainder.
    A nonzero malformed count fails the batch before any expensive
    pairwise work runs.

    Scale: one map-side flag/norm row per vector, a 1-row modal-dim
    aggregate, and a single global aggregate; the median is an exact
    percentile over the norm column (at 100 TB swap in
    ``approx_percentile`` — the sketch family's audited path).  Norms
    are rounded AFTER aggregation; the per-sum accumulation order is
    fixed by the array fold, not partitioning.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    is_null = F.col("embedding").isNull()
    is_empty = ~is_null & (F.size(v) == 0)
    null_comp = (~is_null & (F.size(v) > 0)
                 & F.exists(v, lambda x: x.isNull()))
    pre = ~is_null & ~is_empty & ~null_comp
    s_abs = F.aggregate(F.transform(v, lambda x: F.abs(x)),
                        F.lit(0.0), lambda a, x: a + x)
    nonfinite = F.when(pre, F.isnan(s_abs)
                       | (s_abs == F.lit(float("inf")))).otherwise(F.lit(False))
    wfpre = pre & ~nonfinite
    nrm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                             F.lit(0.0), lambda a, x: a + x))
    fl = e.select(is_null.alias("f_null"), is_empty.alias("f_empty"),
                  null_comp.alias("f_nullcomp"),
                  nonfinite.alias("f_nonfinite"), wfpre.alias("f_wfpre"),
                  F.size(v).alias("sz"),
                  F.when(wfpre, nrm).alias("nrm"))
    modal = (fl.filter("f_wfpre").groupBy("sz")
             .agg(F.count("*").alias("n"))
             .orderBy(F.desc("n"), F.asc("sz")).limit(1)
             .select(F.col("sz").alias("modal_dim")))
    # bounded: modal is at most one row (the corpus dimension); left
    # join keeps the audit non-empty even on an all-malformed corpus
    fl = fl.join(F.broadcast(modal), F.lit(True), "left")
    wf = F.col("f_wfpre") & (F.col("sz") == F.col("modal_dim"))
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return fl.agg(
        F.count("*").alias("n_vectors"),
        cnt(F.col("f_null")).alias("n_null_vec"),
        cnt(F.col("f_empty")).alias("n_empty"),
        cnt(F.col("f_nullcomp")).alias("n_null_comp"),
        cnt(F.col("f_nonfinite")).alias("n_nonfinite"),
        cnt(F.col("f_wfpre")
            & (F.col("sz") != F.col("modal_dim"))).alias("n_ragged"),
        cnt(wf & (F.col("nrm") == 0)).alias("n_zero_norm"),
        F.round(F.min(F.when(wf, F.col("nrm"))), 4).alias("min_norm"),
        F.round(F.max(F.when(wf, F.col("nrm"))), 4).alias("max_norm"),
        F.round(F.expr(
            "percentile(CASE WHEN f_wfpre AND sz = modal_dim "
            "THEN nrm END, 0.5)"), 4).alias("median_norm"))


@register(
    "training_mix_manifest",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS n FROM s),
    q AS (
      SELECT source, n_docs,
             CAST(FLOOR({_QUOTA_B} * n_docs / (SELECT n FROM t))
                  AS BIGINT) AS base,
             {_QUOTA_B} * n_docs / (SELECT n FROM t)
               - FLOOR({_QUOTA_B} * n_docs / (SELECT n FROM t)) AS rem
      FROM s),
    r AS (SELECT source, base, rem,
                 row_number() OVER (ORDER BY rem DESC, source NULLS LAST)
               AS rk
          FROM q),
    lo AS (SELECT {_QUOTA_B} - SUM(base) AS l FROM q),
    quota AS (
      SELECT source,
             base + CASE WHEN rk <= (SELECT l FROM lo)
                         THEN 1 ELSE 0 END AS quota
      FROM r),
    ranked AS (
      SELECT d.doc_id, d.source,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                         d.doc_id) AS rn
      FROM documents d)
    SELECT ranked.source, CAST(ranked.doc_id AS BIGINT) AS doc_id
    FROM ranked JOIN quota ON quota.source = ranked.source
    WHERE rn <= quota.quota
    """,
    tags=("curation", "sampling", "window", "join"),
)
def training_mix_manifest(spark, sf_dir):
    """The SHIPPABLE artifact at the end of the mixture pipeline: the
    actual (source, doc_id) manifest of the training mix — Hamilton
    quotas per source (exact-sum, as in
    ``shard_quota_largest_remainder``) filled by a DETERMINISTIC
    hash-ordered selection within each source (md5(doc_id) order,
    doc_id tie-break), so the manifest is a pure function of the
    corpus and any two runs ship identical bytes.

    Scale: quota math runs on the |sources| dimension; the selection
    window partitions BY SOURCE (bounded per-partition work, no
    global sort) and the quota join is a |sources|-row bounded dim.
    Hash-ordered selection = uniform sampling without an RNG — the
    reproducibility property training-data audits require.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    t = s.agg(F.sum("n_docs").cast("double").alias("n"))
    q = (s.crossJoin(F.broadcast(t))
         .select("source", "n_docs",
                 F.floor(_QUOTA_B * F.col("n_docs") / F.col("n"))
                 .cast("long").alias("base"),
                 (_QUOTA_B * F.col("n_docs") / F.col("n")
                  - F.floor(_QUOTA_B * F.col("n_docs") / F.col("n")))
                 .alias("rem")))
    # bounded: |sources| rows — the post-aggregate source dimension
    wq = Window.orderBy(F.desc("rem"), F.asc("source"))
    lo = q.agg((F.lit(_QUOTA_B) - F.sum("base")).alias("l"))
    quota = (q.withColumn("rk", F.row_number().over(wq))
             .crossJoin(F.broadcast(lo))
             .select("source",
                     (F.col("base")
                      + F.when(F.col("rk") <= F.col("l"), 1).otherwise(0))
                     .alias("quota")))
    # total-order: ties are duplicate doc_ids equal in every referenced
    # column (doc_id, source) — ranks swap between indistinguishable
    # rows and the quota cut keeps the same multiset
    ws = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    ranked = d.select("doc_id", "source",
                      F.row_number().over(ws).alias("rn"))
    return (ranked.join(F.broadcast(quota), "source")  # bounded: |sources|
            .filter(F.col("rn") <= F.col("quota"))
            .select("source", F.col("doc_id").cast("long").alias("doc_id")))
