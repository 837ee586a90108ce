"""Round-3 additions: non-vacuous dedup/near-dup rows + dedup apply.

The sf0.01 fixtures contain no exact-hash duplicates and no cosine
pairs ≥ 0.9, so the round-2 driver rows for ``dedup_exact_hash`` and
``cosine_neardup_pairs`` were green on 0-vs-0 rows — correct but
vacuous.  The ``*_planted`` variants here derive a corpus with KNOWN
duplicates inside the query (a deterministic union of the fixture with
perturbed/verbatim copies, expressed identically in Spark and DuckDB),
so the driver hash row covers real pair-finding, not just agreement on
an empty set.  ``tests/test_similarity_recall.py`` remains the
ground-truth recall baseline for the blocking scheme.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as D
from ..operators import similarity as S
from . import register
from .dedup_q import _MINHASH_ORACLE_CTE


@register(
    "dedup_exact_hash_planted",
    oracle="""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0
    )
    SELECT md5(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT)    AS n_copies
    FROM docs GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
    tags=("dedup",),
)
def dedup_exact_hash_planted(spark, sf_dir):
    """Exact hash dedup over a corpus with planted verbatim copies
    (every 20th doc re-ingested under a shifted id — the "same file
    landed twice" case).  Same operator as ``dedup_exact_hash`` but the
    driver row is guaranteed non-empty: every planted copy must surface
    as a 2-doc cluster keyed by its content hash."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(copies)
    return (
        corpus.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


@register(
    "cosine_neardup_planted",
    oracle=f"""
    WITH wf AS ({S.wf_embeddings_sql()}),
    base AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM wf, UNNEST(generate_series(1, 64)) AS t(i)
    ), v AS (
      SELECT vec_id, i, x FROM base
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, i,
             x + (CASE WHEN i = 2 THEN 0.05 ELSE 0.0 END) AS x
      FROM base WHERE vec_id < 25
    ), norms AS (
      SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM v GROUP BY vec_id
    ), bk AS (
      SELECT vec_id,
             CAST(SUM((CASE WHEN i = 1  AND x > 0 THEN 8 ELSE 0 END)
                    + (CASE WHEN i = 9  AND x > 0 THEN 4 ELSE 0 END)
                    + (CASE WHEN i = 17 AND x > 0 THEN 2 ELSE 0 END)
                    + (CASE WHEN i = 25 AND x > 0 THEN 1 ELSE 0 END)) AS INT) AS bucket
      FROM v WHERE i IN (1, 9, 17, 25) GROUP BY vec_id
    ), cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), pairs AS (
      SELECT cand.vec_a, cand.vec_b, SUM(x1.x * x2.x) AS dot
      FROM cand JOIN v x1 ON x1.vec_id = cand.vec_a
                JOIN v x2 ON x2.vec_id = cand.vec_b AND x2.i = x1.i
      GROUP BY cand.vec_a, cand.vec_b
    )
    SELECT vec_a, vec_b,
           ROUND(dot / (na.nrm * nb.nrm), 4) AS cos_sim
    FROM pairs p JOIN norms na ON na.vec_id = p.vec_a
                 JOIN norms nb ON nb.vec_id = p.vec_b
    WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= 0.9
    """,
    tags=("similarity", "dedup"),
)
def cosine_neardup_planted(spark, sf_dir):
    """LSH-bucketed cosine near-dup pairs over a corpus with planted
    near-duplicates: vectors with vec_id < 25 are re-added under a
    shifted id with dim 2 perturbed by +0.05 (cosine ≈ 0.999, and the
    bucket dims 1/9/17/25 are untouched so blocking provably retains
    each planted pair).  Same plan shape as ``cosine_neardup_pairs``
    (bucket equi-self-join + exact verification on candidates only —
    no cartesian), but the driver row now has ≥ 25 real pairs."""
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    planted = base.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == F.lit(1), x + F.lit(0.05)).otherwise(x)
        ).alias("v"),
    )
    corpus = base.unionByName(planted)
    # norm folded once per row, not twice per candidate pair (the
    # knn_graph_lsh recipe) — same float expression, bit-identical
    bk = (corpus.select("vec_id", "v",
                        S.signbit_bucket(F.col("v")).alias("bucket"))
          .withColumn("_nv", S.l2_norm(F.col("v"))))
    a = bk.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                  F.col("_nv").alias("na"), "bucket")
    b = bk.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                  F.col("_nv").alias("nb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                F.round(F.try_divide(S.dot(F.col("va"), F.col("vb")),
                                     F.col("na") * F.col("nb")), 4)
                .alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.9)
    )


@register(
    "minhash_dedup_apply",
    oracle=_MINHASH_ORACLE_CTE + """
    , sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.doc_a
      JOIN toks tb ON tb.doc_id = p.doc_b AND tb.tok = ta.tok
      GROUP BY p.doc_a, p.doc_b
    ), removed AS (
      SELECT DISTINCT c.doc_b AS doc_id
      FROM common c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - n_common), 4) >= 0.5
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_surviving,
           CAST(SUM(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
    FROM documents d LEFT JOIN removed r USING (doc_id)
    GROUP BY lang
    """,
    tags=("dedup", "lsh", "pipeline"),
)
def minhash_dedup_apply(spark, sf_dir):
    """The APPLY stage of fuzzy dedup — the step a training-data
    pipeline actually ships: MinHash/LSH candidates → exact-Jaccard
    verify (≥ 0.5) → remove the larger-id side of every verified pair
    (deterministic survivor policy) → per-language corpus counts.
    The removal set is O(N * dup_rate) — at web-corpus dup rates
    (30-50 %) it is NOT broadcast-safe, so no ``F.broadcast`` hint: the
    join strategy is left to ``autoBroadcastJoinThreshold``/AQE, which
    broadcasts at fixture scale and degrades gracefully to a shuffle
    join (never an OOM) at 100 TB (VERDICT r8 #1).

    Note ``n_surviving`` counts ALL docs per lang and ``n_removed`` the
    dropped subset, so the surviving corpus per lang is
    ``n_surviving - n_removed`` — both sides computed identically."""
    d = load_table(spark, sf_dir, "documents")
    toks = D.shingles(d, distinct=True)
    pairs = D.candidate_pairs(D.lsh_bands(D.minhash_signatures(d)))
    verified = (
        D.jaccard(pairs, toks)
        .withColumn("jaccard", F.round("jaccard", 4))
        .filter(F.col("jaccard") >= 0.5)
    )
    removed = verified.select(F.col("doc_b").alias("doc_id")).distinct()
    flagged = d.join(removed.withColumn("_removed", F.lit(1)), "doc_id", "left")
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_surviving"),
        F.sum(F.when(F.col("_removed").isNotNull(), 1).otherwise(0)).alias("n_removed"),
    )


@register(
    "agg_approx_distinct_only",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp_exact,
           TRUE AS supp_within_5pct,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part_exact,
           TRUE AS part_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "bench"),
)
def agg_approx_distinct_only(spark, sf_dir):
    """Approximate count-distinct graded by tolerance band — the
    100 TB path is the sketch (partial HLLs merge map-side; no shuffle
    of every distinct key).  Estimates are engine-specific, so the
    hashable contract is the ``wau_hll_rolling`` convention (VERDICT
    r5 #4): return the exact count plus a ``within ±5 %`` boolean on
    the rsd=0.01 estimate — the oracle asserts TRUE, so a drifting
    sketch flips the hash.  The exact side exists only to gate the
    estimate; ``agg_approx_distinct`` remains the combo-plan variant.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_suppkey").alias("n_supp_exact"),
        F.count_distinct("l_partkey").alias("n_part_exact"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("sa"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("pa"),
    )
    return agg.select(
        "l_returnflag",
        "n_supp_exact",
        (F.abs(F.col("sa") - F.col("n_supp_exact"))
         <= 0.05 * F.col("n_supp_exact")).alias("supp_within_5pct"),
        "n_part_exact",
        (F.abs(F.col("pa") - F.col("n_part_exact"))
         <= 0.05 * F.col("n_part_exact")).alias("part_within_5pct"),
    )


@register(
    "embedding_dedup_apply",
    oracle=f"""
    WITH wf AS ({S.wf_embeddings_sql()}),
    base AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM wf, UNNEST(generate_series(1, 64)) AS t(i)
    ), v AS (
      SELECT vec_id, i, x FROM base
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, i,
             x + (CASE WHEN i = 2 THEN 0.05 ELSE 0.0 END) AS x
      FROM base WHERE vec_id < 25
    ), norms AS (
      SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM v GROUP BY vec_id
    ), bk AS (
      SELECT vec_id,
             CAST(SUM((CASE WHEN i = 1  AND x > 0 THEN 8 ELSE 0 END)
                    + (CASE WHEN i = 9  AND x > 0 THEN 4 ELSE 0 END)
                    + (CASE WHEN i = 17 AND x > 0 THEN 2 ELSE 0 END)
                    + (CASE WHEN i = 25 AND x > 0 THEN 1 ELSE 0 END)) AS INT) AS bucket
      FROM v WHERE i IN (1, 9, 17, 25) GROUP BY vec_id
    ), cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), pairs AS (
      SELECT cand.vec_a, cand.vec_b, SUM(x1.x * x2.x) AS dot
      FROM cand JOIN v x1 ON x1.vec_id = cand.vec_a
                JOIN v x2 ON x2.vec_id = cand.vec_b AND x2.i = x1.i
      GROUP BY cand.vec_a, cand.vec_b
    ), verified AS (
      SELECT vec_a, vec_b FROM pairs p
      JOIN norms na ON na.vec_id = p.vec_a
      JOIN norms nb ON nb.vec_id = p.vec_b
      WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= 0.9
    ), removed AS (SELECT DISTINCT vec_b AS vec_id FROM verified)
    SELECT CAST((SELECT COUNT(DISTINCT vec_id) FROM v) AS BIGINT) AS n_corpus,
           CAST((SELECT COUNT(*) FROM removed) AS BIGINT)         AS n_removed,
           CAST((SELECT COUNT(DISTINCT vec_id) FROM v) 
                - (SELECT COUNT(*) FROM removed) AS BIGINT)       AS n_surviving
    """,
    tags=("similarity", "dedup"),
)
def embedding_dedup_apply(spark, sf_dir):
    """The APPLY stage of embedding near-dup removal — the
    ``minhash_dedup_apply`` counterpart for the cosine family (the
    brief's third dedup modality): LSH-bucketed candidates → exact
    cosine ≥ 0.9 verify → drop the larger-id side of every verified
    pair (deterministic survivor policy) over the planted corpus of
    ``cosine_neardup_planted`` (every planted copy must vanish; the
    graded row is never vacuous).

    Scale: the removal set is O(N * dup_rate) — unbounded at corpus
    scale — so the anti-join carries no ``F.broadcast`` hint; AQE/the
    size threshold picks broadcast at fixture scale and a shuffle join
    at 100 TB (VERDICT r8 #1).  The corpus is scanned once for
    blocking and once for the final anti-join count — never shuffled
    on vectors.  The 1-row ``.agg()`` scalars below stay hinted
    (provably bounded).
    """
    from ..operators import similarity as S

    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    planted = base.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == F.lit(1), x + F.lit(0.05)).otherwise(x)
        ).alias("v"),
    )
    corpus = base.unionByName(planted)
    # norm folded once per row, not twice per candidate pair (the
    # knn_graph_lsh recipe) — same float expression, bit-identical
    bk = (corpus.select("vec_id", "v",
                        S.signbit_bucket(F.col("v")).alias("bucket"))
          .withColumn("_nv", S.l2_norm(F.col("v"))))
    a = bk.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                  F.col("_nv").alias("na"), "bucket")
    b = bk.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                  F.col("_nv").alias("nb"), "bucket")
    verified = (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(F.round(F.try_divide(S.dot(F.col("va"), F.col("vb")),
                                     F.col("na") * F.col("nb")), 4)
                >= 0.9)
    )
    removed = verified.select(F.col("vec_b").alias("vec_id")).distinct()
    surviving = corpus.join(removed, "vec_id", "left_anti")
    return (
        corpus.agg(F.count_distinct("vec_id").alias("n_corpus"))
        .crossJoin(F.broadcast(
            removed.agg(F.count("*").alias("n_removed"))))
        .crossJoin(F.broadcast(
            surviving.agg(F.count_distinct("vec_id").alias("n_surviving"))))
    )
