"""Similarity wave 3 (round 9): the IVF recall knob made code, and
contrastive-pair mining for training data.

``ivf_topk_search`` probes ONE inverted list; its docstring (and every
IVF paper) names multi-probe as the recall knob.  Round 8's verdict
pattern: a scale claim that lives only in prose gets registered as
code the next round."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.similarity import cosine
from . import register

_PROBES = 2


def _assigned(spark, sf_dir):
    """(vec_id, v, label, cid ranks 1.._PROBES) — every vector's
    _PROBES nearest of the 4 coarse centroids (vectors 0-3), the
    shared IVF assignment of both queries below.  The argmin orders by
    ROUND(d2, 6) then cid (the registry convention: float noise below
    the round cannot flip a cluster choice)."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", "label",
                    F.col("embedding").cast("array<double>").alias("v"))
    cents = (vecs.filter(F.col("vec_id") < 4)
             .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv")))
    d2 = F.round(F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    w = W.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        # bounded: cents is the k-row centroid table
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "label", "v", "cid", d2.alias("d2"))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= _PROBES)
    )


@register(
    "ann_ivf_multiprobe",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
    ), cent AS (SELECT vec_id AS cid, i, x FROM v WHERE vec_id < 4),
    assign AS (
      SELECT vec_id, cid, rn AS crank FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY ROUND(SUM((v.x - c.x) * (v.x - c.x)), 6), c.cid
               ) AS rn
        FROM v JOIN cent c ON c.i = v.i
        GROUP BY v.vec_id, c.cid)
      WHERE rn <= {_PROBES}
    ), q AS (
      SELECT vec_id AS query_id, cid FROM assign
      WHERE vec_id >= 4 AND vec_id < 12
    ), home AS (SELECT vec_id, cid FROM assign WHERE crank = 1),
    cand AS (
      SELECT DISTINCT q.query_id, h.vec_id AS neighbor_id
      FROM q JOIN home h ON h.cid = q.cid
       AND h.vec_id <> q.query_id AND h.vec_id >= 4
    ), norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM v GROUP BY vec_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND(SUM(a.x * b.x) / (MIN(na.nrm) * MIN(nb.nrm)), 6) AS cos_sim
      FROM cand
      JOIN v a ON a.vec_id = cand.query_id
      JOIN v b ON b.vec_id = cand.neighbor_id AND b.i = a.i
      JOIN norms na ON na.vec_id = cand.query_id
      JOIN norms nb ON nb.vec_id = cand.neighbor_id
      GROUP BY cand.query_id, cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 2
    """,
    tags=("similarity", "ivf"),
)
def ann_ivf_multiprobe(spark, sf_dir):
    """Multi-probe IVF — the recall knob ``ivf_topk_search``'s
    docstring names, as code: each query probes its ``_PROBES``
    nearest inverted lists (corpus vectors stay in their single home
    list), so a neighbor that fell just across a Voronoi boundary —
    single-probe IVF's systematic miss — is found at probes× the
    scoring cost, still never a corpus scan.

    Scale: identical join shape to ``ivf_topk_search`` — candidates
    come from an equi join of the (query, probe-cid) pairs against the
    home-list assignment; cost is probes × list size per query.  The
    dropDuplicates on (query, neighbor) is pair-granular (a candidate
    can enter via both probes).  Centroids broadcast; everything else
    shuffles on cid or the pair key.

    Determinism: the assignment argmin and the final rank both order
    by ROUND(·, 6) with id tiebreaks.
    """
    from pyspark.sql import Window as W

    assign = _assigned(spark, sf_dir)
    home = (assign.filter(F.col("crank") == 1)
            .select("vec_id", "v", "cid"))
    q = (assign.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 12))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("v").alias("qv"), "cid"))
    cand = (
        home.filter(F.col("vec_id") >= 4)
        # bounded: q is the fixed query set x _PROBES probe lists
        .join(F.broadcast(q), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                "qv", "v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 2)
            .select("query_id", "neighbor_id", "cos_sim",
                    F.col("rank").cast("long").alias("rank")))


@register(
    "hard_negative_mining",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
    ), norms AS (
      SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM v GROUP BY vec_id
    ), q AS (
      SELECT DISTINCT vec_id AS query_id, label AS qlabel FROM v
      WHERE vec_id < 8
    ), scored AS (
      SELECT q.query_id, c.vec_id AS negative_id,
             MIN(c.label) AS neg_label,
             ROUND(SUM(qv.x * c.x) / (MIN(nq.nrm) * MIN(nc.nrm)), 6) AS cos_sim
      FROM q
      JOIN v qv ON qv.vec_id = q.query_id
      JOIN v c ON c.i = qv.i AND c.vec_id >= 8 AND c.label <> q.qlabel
      JOIN norms nq ON nq.vec_id = q.query_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      GROUP BY q.query_id, c.vec_id
    )
    SELECT query_id, negative_id, CAST(neg_label AS INT) AS neg_label,
           cos_sim, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, negative_id) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    tags=("similarity", "curation"),
)
def hard_negative_mining(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each anchor
    (the 8-query set), the top-3 most-similar corpus vectors whose
    LABEL DIFFERS — maximally confusable negatives, the pairs a
    contrastive loss learns most from (easy random negatives carry
    ~no gradient).  The label filter runs BEFORE scoring, so
    same-label vectors are never ranked at all.

    Scale: the anchor set is the bounded side (broadcast); the corpus
    is scanned once, filtered map-side on the label inequality, and
    each anchor's top-3 is a per-partition heap via the rank window
    over anchor-granular groups.  At 100 TB the scan arm swaps for
    the IVF probe (``ann_ivf_multiprobe``) exactly as in
    ``hybrid_rrf_fusion_ivf`` — same mining math.

    Determinism: ROUND(cos, 6) + negative_id tiebreak in the rank.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", "label",
                    F.col("embedding").cast("array<double>").alias("v"))
    q = (vecs.filter(F.col("vec_id") < 8)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("label").alias("qlabel"),
                 F.col("v").alias("qv")))
    corpus = vecs.filter(F.col("vec_id") >= 8)
    scored = (
        corpus
        # bounded: q is the fixed 8-anchor query set
        .join(F.broadcast(q), F.col("label") != F.col("qlabel"))
        .select("query_id", F.col("vec_id").alias("negative_id"),
                F.col("label").alias("neg_label"),
                F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "negative_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("query_id", "negative_id", "neg_label", "cos_sim",
                    F.col("rank").cast("long").alias("rank")))


@register(
    "retrieval_eval_metrics",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
    ), norms AS (
      SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM v GROUP BY vec_id
    ), q AS (
      SELECT DISTINCT vec_id AS query_id, label AS qlabel FROM v
      WHERE vec_id < 8
    ), scored AS (
      SELECT q.query_id, q.qlabel, c.vec_id AS neighbor_id,
             MIN(c.label) AS clabel,
             ROUND(SUM(qv.x * c.x) / (MIN(nq.nrm) * MIN(nc.nrm)), 6) AS cos_sim
      FROM q
      JOIN v qv ON qv.vec_id = q.query_id
      JOIN v c ON c.i = qv.i AND c.vec_id >= 8
      JOIN norms nq ON nq.vec_id = q.query_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      GROUP BY q.query_id, q.qlabel, c.vec_id
    ), ranked AS (
      SELECT query_id, (clabel = qlabel) AS rel,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    ), per AS (
      SELECT query_id,
             SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS n_rel,
             SUM(CASE WHEN rel AND rnk <= 10 THEN 1 ELSE 0 END) AS hits10,
             MIN(CASE WHEN rel THEN rnk END) AS first_rel,
             SUM(CASE WHEN rel AND rnk <= 10
                      THEN 1.0 / log2(rnk + 1) ELSE 0 END) AS dcg
      FROM ranked GROUP BY query_id
    )
    SELECT query_id,
           CAST(n_rel AS BIGINT) AS n_rel,
           ROUND(CAST(hits10 AS DOUBLE) / n_rel, 6) AS recall_at_10,
           ROUND(1.0 / first_rel, 6) AS mrr,
           ROUND(dcg / list_sum(list_transform(
               generate_series(1, CAST(LEAST(10, n_rel) AS INT)),
               i -> 1.0 / log2(i + 1))), 6) AS ndcg_at_10
    FROM per
    """,
    tags=("similarity", "eval", "window"),
)
def retrieval_eval_metrics(spark, sf_dir):
    """Retrieval evaluation — Recall@10, MRR, and binary nDCG@10 per
    query, with relevance = "candidate shares the query's label".  The
    op every retrieval/RAG pipeline runs after an index change: rank
    the corpus per query, then reduce the ranking to the three
    standard quality metrics (IDCG normalizes by the ideal ranking of
    min(10, n_rel) relevant hits).

    Scale: queries are the bounded broadcast side; the corpus is
    scanned once and scored map-side.  The only shuffle is the
    per-query rank window — query-granular partitions, so parallelism
    is the query-batch size (eval batches are thousands of queries,
    not one).  The metric reduction is an ordinary partial-aggregable
    groupBy; IDCG is computed per-query from ``n_rel`` alone via a
    bounded 10-element fold, never a second ranking pass.

    Determinism: ranks order by ROUND(cos, 6) with id tiebreaks;
    metric floats are rounded to 6 after integer-rank arithmetic, so
    summation-order noise (~1e-15) cannot reach the compare.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", "label",
                    F.col("embedding").cast("array<double>").alias("v"))
    q = (vecs.filter(F.col("vec_id") < 8)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("label").alias("qlabel"),
                 F.col("v").alias("qv")))
    corpus = vecs.filter(F.col("vec_id") >= 8)
    scored = (
        corpus
        # bounded: q is the fixed 8-anchor eval query set
        .crossJoin(F.broadcast(q))
        .select("query_id",
                (F.col("label") == F.col("qlabel")).alias("rel"),
                F.col("vec_id").alias("neighbor_id"),
                F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    per = ranked.groupBy("query_id").agg(
        F.sum(F.when(F.col("rel"), 1).otherwise(0)).alias("n_rel"),
        F.sum(F.when(F.col("rel") & (F.col("rnk") <= 10), 1)
              .otherwise(0)).alias("hits10"),
        F.min(F.when(F.col("rel"), F.col("rnk"))).alias("first_rel"),
        F.sum(F.when(F.col("rel") & (F.col("rnk") <= 10),
                     F.lit(1.0) / F.log2(F.col("rnk") + 1))
              .otherwise(0.0)).alias("dcg"),
    )
    idcg = F.expr(
        "aggregate(sequence(1, cast(least(10, n_rel) as int)), "
        "cast(0 as double), (a, i) -> a + 1.0 / log2(i + 1))")
    return per.select(
        "query_id", "n_rel",
        F.round(F.col("hits10").cast("double") / F.col("n_rel"), 6)
         .alias("recall_at_10"),
        F.round(F.lit(1.0) / F.col("first_rel"), 6).alias("mrr"),
        F.round(F.col("dcg") / idcg, 6).alias("ndcg_at_10"),
    )
