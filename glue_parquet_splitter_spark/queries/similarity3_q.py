"""Similarity wave 3 (round 9): the IVF recall knob made code, and
contrastive-pair mining for training data.

``ivf_topk_search`` probes ONE inverted list; its docstring (and every
IVF paper) names multi-probe as the recall knob.  Round 8's verdict
pattern: a scale claim that lives only in prose gets registered as
code the next round."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import similarity as S
from ..operators.similarity import cosine
from ..staging import stage_table
from . import register

_PROBES = 2


def _assigned(spark, sf_dir):
    """(vec_id, v, label, cid ranks 1.._PROBES) — every vector's
    _PROBES nearest of the 4 coarse centroids (vectors 0-3), the
    shared IVF assignment of both queries below.  The argmin orders by
    ROUND(d2, 6) then cid (the registry convention: float noise below
    the round cannot flip a cluster choice)."""
    from pyspark.sql import Window as W

    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = e.select("vec_id", "label",
                    F.col("embedding").cast("array<double>").alias("v"))
    cents = (vecs.filter(F.col("vec_id") < 4)
             .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv")))
    d2 = F.round(F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    # total-order: cid is unique per partition — one scored row per
    # (vec_id, cid) by construction of the centroid cross join
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
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
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
    # total-order: ties agree on every returned column (the score and
    # the trailing id ARE the output row) — rank swaps between
    # indistinguishable rows leave the multiset, and any top-k cut of
    # it, unchanged
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 2)
            .select("query_id", "neighbor_id", "cos_sim",
                    F.col("rank").cast("long").alias("rank")))


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
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

    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
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
    # total-order: ties agree on every returned column (the score and
    # the trailing id ARE the output row) — rank swaps between
    # indistinguishable rows leave the multiset, and any top-k cut of
    # it, unchanged
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "negative_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("query_id", "negative_id", "neg_label", "cos_sim",
                    F.col("rank").cast("long").alias("rank")))


@register(
    "retrieval_eval_metrics",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
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
    WHERE n_rel > 0
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

    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
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
    # total-order: ties agree on every returned column (the score and
    # the trailing id ARE the output row) — rank swaps between
    # indistinguishable rows leave the multiset, and any top-k cut of
    # it, unchanged
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
    # n_rel = 0 makes every metric undefined (and under ANSI, 0/0
    # throws while Spark's sequence(1, 0) even DESCENDS to [1, 0]) —
    # such queries are excluded in BOTH engines, the standard IR-eval
    # convention
    return per.filter(F.col("n_rel") > 0).select(
        "query_id", "n_rel",
        F.round(F.col("hits10").cast("double") / F.col("n_rel"), 6)
         .alias("recall_at_10"),
        F.round(F.lit(1.0) / F.col("first_rel"), 6).alias("mrr"),
        F.round(F.col("dcg") / idcg, 6).alias("ndcg_at_10"),
    )


_KNN_COS_CTE = f"""
    WITH v AS (
      -- finite-vector contract (FUZZ.md --nan sweep): a NaN/±Inf
      -- component poisons every cosine and ranks engine-divergently;
      -- embedding_health_audit is the detector, the family EXCLUDES
      SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
    ), norms AS (
      SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM v GROUP BY vec_id
    )
"""


# Shared CTE: the bucket-local kNN edge set (src, dst, cos_sim, rank
# 1..3) — the construction of ``knn_graph_lsh``, reused verbatim by
# ``label_propagation_knn`` so the two oracles cannot drift.
_KNN_EDGES_CTE = _KNN_COS_CTE + f"""
    , bk AS (
      SELECT vec_id,
             ((CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END) * 8 +
              (CASE WHEN CAST(embedding[9] AS DOUBLE) > 0 THEN 1 ELSE 0 END) * 4 +
              (CASE WHEN CAST(embedding[17] AS DOUBLE) > 0 THEN 1 ELSE 0 END) * 2 +
              (CASE WHEN CAST(embedding[25] AS DOUBLE) > 0 THEN 1 ELSE 0 END)) AS bucket
      FROM ({S.wf_embeddings_sql()}) wfb
    ), pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ), scored AS (
      SELECT p.src, p.dst,
             ROUND(SUM(av.x * bv.x) / (MIN(na.nrm) * MIN(nb.nrm)), 6) AS cos_sim
      FROM pairs p
      JOIN v av ON av.vec_id = p.src
      JOIN v bv ON bv.vec_id = p.dst AND bv.i = av.i
      JOIN norms na ON na.vec_id = p.src
      JOIN norms nb ON nb.vec_id = p.dst
      GROUP BY p.src, p.dst
    ), knn AS (
      SELECT src, dst, cos_sim, rank
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                         ORDER BY cos_sim DESC, dst) AS rank
            FROM scored)
      WHERE rank <= 3
    )
"""


@register(
    "knn_graph_lsh",
    oracle=_KNN_EDGES_CTE + """
    SELECT src, dst, cos_sim, CAST(rank AS BIGINT) AS rank FROM knn
    """,
    tags=("similarity", "lsh", "graph"),
)
def knn_graph_lsh(spark, sf_dir):
    """Approximate kNN-GRAPH construction — every vector's top-3
    cosine neighbors among its sign-bit-LSH bucket mates.  The graph
    is the input structure of SemDeDup-style clustering, connected-
    component dedup, and graph-based label spreading: unlike the ANN
    queries (a bounded query set against a corpus), here EVERY vector
    is a query, so the only scalable construction is bucket-local.

    Scale: one self-equi-join on the bucket id — within-bucket pairs
    are N^2/2^b for b sign bits, so b grows with log2(N) to hold the
    per-bucket candidate count constant (the standard LSH-forest
    recipe; the fixture pins b=4).  No broadcast hint: both sides are
    O(N) and must shuffle on the bucket key.  The per-source top-3 is
    a rank window over bucket-local candidates only.

    Determinism: ROUND(cos, 6) before ranking, dst-id tiebreak;
    bucket ids are sign bits of fixed dimensions — repartition-proof.
    """
    return _knn_edges(spark, sf_dir).select(
        "src", "dst", "cos_sim", F.col("rank").cast("long").alias("rank"))


def _knn_edges(spark, sf_dir):
    """(src, dst, cos_sim, rank 1..3) — the bucket-local kNN edge set
    shared by ``knn_graph_lsh`` and ``label_propagation_knn`` (mirrors
    the oracle-side ``_KNN_EDGES_CTE``)."""
    from pyspark.sql import Window as W

    from ..operators import similarity as S

    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    # per-vector norm computed ONCE below the bucket join (VERDICT r11
    # #2): the inline cosine form re-folds BOTH norms per candidate
    # pair — 3 O(dim) folds/pair; carrying the norm through the
    # shuffle (+8 bytes/row) leaves only the dot fold pair-side.
    # Same float expression (sqrt of the x*x fold), so scores are
    # bit-identical to the oracle's separate norms CTE.
    bk = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        S.signbit_bucket(F.col("embedding")).alias("bucket")
    ).withColumn("nv", S.l2_norm(F.col("v")))
    a = bk.select(F.col("vec_id").alias("src"), F.col("v").alias("av"),
                  F.col("nv").alias("na"), "bucket")
    b = bk.select(F.col("vec_id").alias("dst"), F.col("v").alias("bv"),
                  F.col("nv").alias("nb"), "bucket")
    scored = (a.join(b, "bucket")
              .filter(F.col("src") != F.col("dst"))
              .select("src", "dst",
                      F.round(F.try_divide(
                          S.dot(F.col("av"), F.col("bv")),
                          F.col("na") * F.col("nb")), 6)
                       .alias("cos_sim")))
    # total-order: ties agree on every returned column (the score and
    # the trailing id ARE the output row) — rank swaps between
    # indistinguishable rows leave the multiset, and any top-k cut of
    # it, unchanged
    w = W.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3))


@register(
    "ranking_eval_auc",
    oracle=_KNN_COS_CTE + """
    , q AS (
      SELECT DISTINCT vec_id AS anchor_id, label AS qlabel FROM v
      WHERE vec_id < 4
    ), scored AS (
      SELECT q.anchor_id, q.qlabel, c.vec_id,
             (MIN(c.label) = q.qlabel) AS pos,
             ROUND(SUM(qv.x * c.x) / (MIN(nq.nrm) * MIN(nc.nrm)), 6) AS s
      FROM q
      JOIN v qv ON qv.vec_id = q.anchor_id
      JOIN v c ON c.i = qv.i AND c.vec_id >= 4
      JOIN norms nq ON nq.vec_id = q.anchor_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      GROUP BY q.anchor_id, q.qlabel, c.vec_id
    ), ranked AS (
      SELECT anchor_id, qlabel, pos,
             RANK() OVER (PARTITION BY anchor_id ORDER BY s) AS r,
             COUNT(*) OVER (PARTITION BY anchor_id, s) AS cnt
      FROM scored
    ), agg AS (
      SELECT anchor_id, qlabel,
             SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
             SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg,
             SUM(CASE WHEN pos THEN r + (cnt - 1) / 2.0 ELSE 0 END) AS rpos
      FROM ranked GROUP BY anchor_id, qlabel
    )
    SELECT anchor_id, CAST(qlabel AS BIGINT) AS qlabel,
           CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           ROUND((rpos - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg), 6) AS auc
    FROM agg
    WHERE n_pos > 0 AND n_neg > 0
    """,
    tags=("similarity", "eval", "window", "stats"),
)
def ranking_eval_auc(spark, sf_dir):
    """ROC AUC of a retrieval scorer, per anchor query — the
    Mann-Whitney rank-sum form: AUC = P(score(pos) > score(neg)) =
    (R+ - n+(n+ + 1)/2) / (n+ * n-), with AVERAGE ranks on score ties
    (the unbiased tie convention sklearn uses).  The eval every
    scorer/reranker change runs; label = "candidate shares the
    anchor's class".

    Scale: the 4-anchor eval set broadcasts against one corpus scan
    (bounded side only); ranking is a per-anchor window (parallelism =
    eval-batch size); the AUC reduction is a partial-aggregable
    groupBy.  No n+ x n- pair materialization EVER — the rank-sum
    identity is exactly what makes AUC computable at corpus scale.

    Determinism: ranks over ROUND(score, 6); average-rank tie handling
    makes the statistic independent of intra-tie order, so no id
    tiebreak is even needed; rank sums are exact half-integers.
    """
    from pyspark.sql import Window as W

    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = e.select("vec_id", "label",
                    F.col("embedding").cast("array<double>").alias("v"))
    q = (vecs.filter(F.col("vec_id") < 4)
         .select(F.col("vec_id").alias("anchor_id"),
                 F.col("label").alias("qlabel"), F.col("v").alias("qv")))
    corpus = vecs.filter(F.col("vec_id") >= 4)
    scored = (corpus
              # bounded: q is the fixed 4-anchor eval set
              .crossJoin(F.broadcast(q))
              .select("anchor_id", "qlabel",
                      (F.col("label") == F.col("qlabel")).alias("pos"),
                      F.round(cosine(F.col("qv"), F.col("v")), 6).alias("s")))
    ranked = scored.select(
        "anchor_id", "qlabel", "pos",
        F.rank().over(W.partitionBy("anchor_id").orderBy("s")).alias("r"),
        F.count("*").over(W.partitionBy("anchor_id", "s")).alias("cnt"))
    agg = (ranked.groupBy("anchor_id", "qlabel")
           .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("n_pos"),
                F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("n_neg"),
                F.sum(F.when(F.col("pos"),
                             F.col("r") + (F.col("cnt") - 1) / 2.0)
                      .otherwise(0.0)).alias("rpos")))
    # an anchor whose label covers all of the corpus (n_neg=0) or none
    # of it (n_pos=0) has undefined AUC — excluded in BOTH engines
    # rather than 0/0-crashing under ANSI
    return (agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
            .select(
        "anchor_id", F.col("qlabel").cast("long").alias("qlabel"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round((F.col("rpos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
                / (F.col("n_pos") * F.col("n_neg")), 6).alias("auc")))


@register(
    "calibration_ece_bins",
    oracle=_KNN_COS_CTE + """
    , q AS (
      SELECT vec_id, label FROM embeddings WHERE vec_id = 0
    ), scored AS (
      SELECT c.vec_id, (MIN(c.label) = MIN(q.label)) AS pos,
             ROUND((SUM(qv.x * c.x) / (MIN(nq.nrm) * MIN(nc.nrm)) + 1)
                   / 2, 6) AS conf
      FROM q
      JOIN v qv ON qv.vec_id = q.vec_id
      JOIN v c ON c.i = qv.i AND c.vec_id >= 4
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      GROUP BY c.vec_id
    ), binned AS (
      SELECT LEAST(CAST(floor(conf * 10) AS BIGINT), 9) AS bin, conf, pos
      FROM scored
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(conf) / COUNT(*), 6) AS avg_conf,
           ROUND(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS frac_pos,
           ROUND(ABS(ROUND(SUM(conf) / COUNT(*), 6)
                     - ROUND(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END)
                                  AS DOUBLE) / COUNT(*), 6)), 6) AS abs_gap
    FROM binned GROUP BY bin
    """,
    tags=("similarity", "eval", "stats", "agg"),
)
def calibration_ece_bins(spark, sf_dir):
    """Calibration reliability bins — the per-bin rows behind an ECE
    (expected calibration error) number and a reliability diagram:
    confidence = (cos+1)/2 against a fixed anchor, 10 equal-width
    bins, and per bin the mean confidence vs the empirical positive
    rate plus their absolute gap.  The eval that catches a scorer
    that RANKS well (AUC high) but whose scores can't be thresholded.

    Scale: one corpus scan scored map-side against a 1-row broadcast
    anchor, then a 10-group partial-aggregable groupBy — the cheapest
    shape in the registry; ECE itself is the n-weighted mean of
    ``abs_gap``, a driver-free fold over 10 rows.

    Determinism: conf is ROUND(.,6) before binning and summing (bin
    edges hit exactly); per-bin means re-round to 6, and the gap is
    computed from the two ALREADY-rounded means identically in both
    engines, so double noise cannot reach the compare.
    """
    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = e.select("vec_id", "label",
                    F.col("embedding").cast("array<double>").alias("v"))
    q = (vecs.filter(F.col("vec_id") == 0)
         .select(F.col("label").alias("qlabel"), F.col("v").alias("qv")))
    corpus = vecs.filter(F.col("vec_id") >= 4)
    scored = (corpus
              # bounded: q is the single fixed anchor (1 row)
              .crossJoin(F.broadcast(q))
              .select((F.col("label") == F.col("qlabel")).alias("pos"),
                      F.round((cosine(F.col("qv"), F.col("v")) + 1) / 2, 6)
                       .alias("conf")))
    binned = scored.select(
        F.least(F.floor(F.col("conf") * 10).cast("long"), F.lit(9).cast("long"))
         .alias("bin"), "conf", "pos")
    agg = (binned.groupBy("bin")
           .agg(F.count("*").alias("n"),
                F.sum("conf").alias("sum_conf"),
                F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("n_pos")))
    avg_conf = F.round(F.col("sum_conf") / F.col("n"), 6)
    frac_pos = F.round(F.col("n_pos").cast("double") / F.col("n"), 6)
    return agg.select(
        "bin", F.col("n").cast("long").alias("n"),
        avg_conf.alias("avg_conf"), frac_pos.alias("frac_pos"),
        F.round(F.abs(avg_conf - frac_pos), 6).alias("abs_gap"))


@register(
    "mmr_diversified_topk",
    oracle=_KNN_COS_CTE + """
    , q AS (
      SELECT DISTINCT vec_id AS anchor_id FROM v WHERE vec_id < 4
    ), rels AS (
      SELECT q.anchor_id, c.vec_id,
             ROUND(SUM(qv.x * c.x) / (MIN(nq.nrm) * MIN(nc.nrm)), 6) AS rel
      FROM q
      JOIN v qv ON qv.vec_id = q.anchor_id
      JOIN v c ON c.i = qv.i AND c.vec_id >= 4
      JOIN norms nq ON nq.vec_id = q.anchor_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      GROUP BY q.anchor_id, c.vec_id
    ), pool AS (
      SELECT anchor_id, vec_id, rel
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY rel DESC, vec_id) AS rn
            FROM rels)
      WHERE rn <= 8
    ), psim AS (
      SELECT a.anchor_id, a.vec_id AS ia, b.vec_id AS ib,
             ROUND(SUM(av.x * bv.x) / (MIN(na.nrm) * MIN(nb.nrm)), 6) AS sim
      FROM pool a JOIN pool b
        ON a.anchor_id = b.anchor_id AND a.vec_id <> b.vec_id
      JOIN v av ON av.vec_id = a.vec_id
      JOIN v bv ON bv.vec_id = b.vec_id AND bv.i = av.i
      JOIN norms na ON na.vec_id = a.vec_id
      JOIN norms nb ON nb.vec_id = b.vec_id
      GROUP BY a.anchor_id, a.vec_id, b.vec_id
    ), s1 AS (
      SELECT anchor_id, vec_id, ROUND(0.7 * rel, 6) AS score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY ROUND(0.7 * rel, 6) DESC,
                                                  vec_id) AS rn
            FROM pool)
      WHERE rn = 1
    ), c2 AS (
      SELECT p.anchor_id, p.vec_id,
             ROUND(0.7 * p.rel - 0.3 * ps.sim, 6) AS score
      FROM pool p
      JOIN s1 ON s1.anchor_id = p.anchor_id AND p.vec_id <> s1.vec_id
      JOIN psim ps ON ps.anchor_id = p.anchor_id
                  AND ps.ia = p.vec_id AND ps.ib = s1.vec_id
    ), s2 AS (
      SELECT anchor_id, vec_id, score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY score DESC, vec_id) AS rn
            FROM c2)
      WHERE rn = 1
    ), c3 AS (
      SELECT p.anchor_id, p.vec_id,
             ROUND(0.7 * p.rel
                   - 0.3 * GREATEST(p1.sim, p2.sim), 6) AS score
      FROM pool p
      JOIN s1 ON s1.anchor_id = p.anchor_id AND p.vec_id <> s1.vec_id
      JOIN s2 ON s2.anchor_id = p.anchor_id AND p.vec_id <> s2.vec_id
      JOIN psim p1 ON p1.anchor_id = p.anchor_id
                  AND p1.ia = p.vec_id AND p1.ib = s1.vec_id
      JOIN psim p2 ON p2.anchor_id = p.anchor_id
                  AND p2.ia = p.vec_id AND p2.ib = s2.vec_id
    ), s3 AS (
      SELECT anchor_id, vec_id, score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY score DESC, vec_id) AS rn
            FROM c3)
      WHERE rn = 1
    )
    SELECT anchor_id, CAST(pick AS BIGINT) AS pick, vec_id, score AS mmr_score
    FROM (SELECT anchor_id, 1 AS pick, vec_id, score FROM s1
          UNION ALL SELECT anchor_id, 2, vec_id, score FROM s2
          UNION ALL SELECT anchor_id, 3, vec_id, score FROM s3)
    """,
    tags=("similarity", "ranking", "pandas_udf", "topk"),
)
def mmr_diversified_topk(spark, sf_dir):
    """MMR (maximal marginal relevance) diversified top-k — the rerank
    behind "don't return 3 near-identical passages": greedily pick
    k=3 of a top-8 relevance pool, each step maximizing
    λ·rel − (1−λ)·max_sim_to_already_selected (λ=0.7, empty-set
    max_sim = 0).  Deduplication applied at SERVING time rather than
    corpus time — the RAG-stack twin of SemDeDup.

    Scale: the greedy loop is inherently sequential, so the design
    bounds it: relevance pooling is the distributed part (one corpus
    scan + per-anchor top-8 rank window), and MMR itself runs
    per-anchor over the BOUNDED pool inside one ``applyInPandas``
    group — O(k·pool) work on ≤ 8 rows, with pairwise sims computed
    in-group, never shuffled.  Parallelism = the anchor batch, the
    pool never leaves its executor, and no stage is quadratic in the
    corpus.

    Determinism: rel and every pairwise sim are ROUND(.,6) before the
    greedy compare; each argmax breaks ties by vec_id; the oracle
    unrolls the same greedy steps (s1→s2→s3) with identical rounding.
    """
    import pandas as pd

    from pyspark.sql import Window as W

    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = e.select("vec_id",
                    F.col("embedding").cast("array<double>").alias("v"))
    q = (vecs.filter(F.col("vec_id") < 4)
         .select(F.col("vec_id").alias("anchor_id"),
                 F.col("v").alias("qv")))
    corpus = vecs.filter(F.col("vec_id") >= 4)
    rels = (corpus
            # bounded: q is the fixed 4-anchor eval set
            .crossJoin(F.broadcast(q))
            .select("anchor_id", "vec_id", "v",
                    F.round(cosine(F.col("qv"), F.col("v")), 6).alias("rel")))
    w = W.partitionBy("anchor_id").orderBy(F.desc("rel"), "vec_id")
    pool = (rels.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 8)
            .select("anchor_id", "vec_id", "rel", "v"))

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        def r6(x):  # HALF-AWAY-FROM-ZERO, matching Spark/DuckDB ROUND
            return np.floor(np.abs(x) * 1e6 + 0.5) / 1e6 * np.sign(x)

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        nrm = np.sqrt((mat * mat).sum(axis=1))
        sim = r6(mat @ mat.T / np.outer(nrm, nrm))
        rel = pdf["rel"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        selected, rows = [], []
        for pick in range(1, 4):
            best = None
            for i in range(len(ids)):
                if i in selected:
                    continue
                ms = max((sim[i, j] for j in selected), default=0.0)
                score = float(r6(0.7 * rel[i] - 0.3 * ms))
                key = (-score, ids[i])
                if best is None or key < best[0]:
                    best = (key, i, score)
            _, i, score = best
            selected.append(i)
            rows.append((int(pdf["anchor_id"].iloc[0]), pick,
                         int(ids[i]), float(score)))
        return pd.DataFrame(rows, columns=["anchor_id", "pick",
                                           "vec_id", "mmr_score"])

    return (pool.groupBy("anchor_id")
            .applyInPandas(mmr, "anchor_id long, pick long, "
                                "vec_id long, mmr_score double"))


@register(
    "label_propagation_knn",
    oracle=_KNN_EDGES_CTE + f"""
    , lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
              FROM ({S.wf_embeddings_sql()}) wfl),
    votes AS (
      SELECT k.src, l.label AS nb_label, COUNT(*) AS n
      FROM knn k JOIN lab l ON l.vec_id = k.dst
      GROUP BY k.src, l.label
    ), new_lab AS (
      SELECT src, nb_label AS new_label
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                         ORDER BY n DESC,
                                                  nb_label NULLS LAST) AS rn
            FROM votes)
      WHERE rn = 1
    )
    SELECT o.label AS old_label, nl.new_label,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(CASE WHEN o.label <> nl.new_label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
    FROM new_lab nl JOIN lab o ON o.vec_id = nl.src
    GROUP BY o.label, nl.new_label
    """,
    tags=("similarity", "graph", "window"),
)
def label_propagation_knn(spark, sf_dir):
    """One synchronous round of label propagation over the LSH-built
    kNN graph — each node adopts the MAJORITY label of its ≤3 nearest
    bucket-mates (ties → smallest label), reported as an
    (old_label → new_label) transition matrix.  The semi-supervised
    pass that spreads a small seed of human labels across a corpus
    (or, read diagonally, a label-noise audit: off-diagonal mass =
    points whose neighborhoods disagree with their label).  Composes
    ``knn_graph_lsh`` — graph build and propagation share one
    construction (``_knn_edges``), so the edge semantics cannot drift.

    Scale: per round, one equi join of the O(3N) edge list against the
    label table on the node key, a (node, label)-granular count, and a
    per-node argmax window — each shuffle is keyed on node id, none is
    quadratic.  Rounds are driver-sequenced like ``kmeans_lloyd_iters``
    (bounded iteration count, no growing lineage per round).

    Determinism: majority votes are integer counts; the argmax breaks
    ties by (count DESC, label ASC); the underlying edges inherit
    ``knn_graph_lsh``'s rounded-cosine, id-tiebroken ranking.
    """
    from pyspark.sql import Window as W

    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    lab = e.select("vec_id", F.col("label").cast("long").alias("label"))
    knn = _knn_edges(spark, sf_dir)
    votes = (knn.join(lab.withColumnRenamed("vec_id", "dst"), "dst")
             .groupBy("src", F.col("label").alias("nb_label"))
             .agg(F.count("*").alias("n")))
    # EXPLICIT null ordering: an unlabeled (NULL) neighbor loses a tie
    # against any real label.  Spark's bare ASC is NULLS FIRST while
    # DuckDB's is NULLS LAST — left implicit, a null-vs-real tie flips
    # the vote cross-engine (found by scripts/fuzz_oracle.py).
    # total-order: nb_label is unique per src — votes is the
    # groupBy(src, nb_label) output
    w = W.partitionBy("src").orderBy(F.desc("n"),
                                     F.asc_nulls_last("nb_label"))
    new_lab = (votes.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select("src", F.col("nb_label").alias("new_label")))
    old = lab.select(F.col("vec_id").alias("src"),
                     F.col("label").alias("old_label"))
    return (new_lab.join(old, "src")
            .groupBy("old_label", "new_label")
            .agg(F.count("*").alias("n_nodes"),
                 F.sum(F.when(F.col("old_label") != F.col("new_label"), 1)
                       .otherwise(0)).alias("n_changed")))


@register(
    "hard_negative_mining_ivf",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
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
    ), lab AS (SELECT DISTINCT vec_id, label FROM v),
    q AS (
      SELECT a.vec_id AS query_id, a.cid, l.label AS qlabel
      FROM assign a JOIN lab l ON l.vec_id = a.vec_id
      WHERE a.vec_id >= 4 AND a.vec_id < 12
    ), home AS (
      SELECT a.vec_id, a.cid, l.label
      FROM assign a JOIN lab l ON l.vec_id = a.vec_id
      WHERE a.crank = 1 AND a.vec_id >= 12
    ), cand AS (
      SELECT DISTINCT q.query_id, h.vec_id AS negative_id,
             h.label AS neg_label
      FROM q JOIN home h ON h.cid = q.cid AND h.label <> q.qlabel
    ), norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM v GROUP BY vec_id),
    scored AS (
      SELECT cand.query_id, cand.negative_id, MIN(cand.neg_label) AS neg_label,
             ROUND(SUM(a.x * b.x) / (MIN(na.nrm) * MIN(nb.nrm)), 6) AS cos_sim
      FROM cand
      JOIN v a ON a.vec_id = cand.query_id
      JOIN v b ON b.vec_id = cand.negative_id AND b.i = a.i
      JOIN norms na ON na.vec_id = cand.query_id
      JOIN norms nb ON nb.vec_id = cand.negative_id
      GROUP BY cand.query_id, cand.negative_id
    )
    SELECT query_id, negative_id, CAST(neg_label AS INT) AS neg_label,
           cos_sim, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, negative_id) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    tags=("similarity", "curation", "ivf"),
)
def hard_negative_mining_ivf(spark, sf_dir):
    """IVF-armed hard-negative mining — ``hard_negative_mining``'s
    docstring claims its corpus-scan arm "swaps for the IVF probe at
    100 TB, same mining math"; this registers the swap as code (the
    r8/r9 rule: a scale claim that lives only in prose gets coded).
    Candidates come from each anchor's ``_PROBES`` nearest inverted
    lists instead of a full scan; the label-differs filter and the
    top-3 rank are the identical mining math.

    Scale: candidate generation is the cid equi join of the anchor
    probe set against home lists — probes x list size per anchor,
    never a corpus scan; the label filter prunes before scoring.
    Recall caveat inherited from IVF: a hard negative in a list
    neither probe touches is missed — multi-probe is the knob.

    Determinism: same argmin/rank rounding and id tiebreaks as
    ``ann_ivf_multiprobe``.
    """
    from pyspark.sql import Window as W

    assign = _assigned(spark, sf_dir)
    q = (assign.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 12))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("v").alias("qv"),
                 F.col("label").alias("qlabel"), "cid"))
    home = (assign.filter((F.col("crank") == 1) & (F.col("vec_id") >= 12))
            .select("vec_id", "v", "label", "cid"))
    cand = (
        home
        # bounded: q is the fixed 8-anchor set x _PROBES probe lists
        .join(F.broadcast(q), "cid")
        .filter(F.col("label") != F.col("qlabel"))
        .select("query_id", F.col("vec_id").alias("negative_id"),
                F.col("label").alias("neg_label"), "qv", "v")
        .dropDuplicates(["query_id", "negative_id"]))
    scored = cand.select(
        "query_id", "negative_id", "neg_label",
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"))
    # total-order: ties agree on every returned column (the score and
    # the trailing id ARE the output row) — rank swaps between
    # indistinguishable rows leave the multiset, and any top-k cut of
    # it, unchanged
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "negative_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("query_id", "negative_id",
                    F.col("neg_label").cast("int").alias("neg_label"),
                    "cos_sim", F.col("rank").cast("long").alias("rank")))


@register(
    "mutual_knn_pairs",
    oracle=_KNN_EDGES_CTE + """
    SELECT a.src AS vec_a, a.dst AS vec_b, a.cos_sim,
           CAST(a.rank AS BIGINT) AS rank_ab,
           CAST(b.rank AS BIGINT) AS rank_ba
    FROM knn a JOIN knn b ON b.src = a.dst AND b.dst = a.src
    WHERE a.src < a.dst
    """,
    tags=("similarity", "graph", "dedup"),
)
def mutual_knn_pairs(spark, sf_dir):
    """Reciprocal (mutual) nearest neighbors over the LSH kNN graph —
    pairs where EACH vector ranks the other in its own top-3.  The
    asymmetry filter that separates a true near-duplicate/match from
    a hub artifact: a generic centroid-ish vector appears in
    thousands of top-k lists (high in-degree) but reciprocates almost
    none of them, so one-directional kNN edges over-merge exactly
    where the corpus is densest.  r-NN pairs are the standard
    high-precision seed set for dedup clustering and entity matching.

    Scale: one self-equi-join of the O(3N) directed edge list on the
    reversed pair key — edge-granular, never corpus-granular; the
    graph build itself is shared code (``_knn_edges``) and oracle CTE
    with ``knn_graph_lsh``, so semantics cannot drift.

    Determinism: inherits the rounded-cosine, id-tiebroken edge
    ranking; the pair emits once (src < dst) with both direction
    ranks.
    """
    knn = _knn_edges(spark, sf_dir)
    rev = knn.select(F.col("src").alias("dst"), F.col("dst").alias("src"),
                     F.col("rank").alias("rank_ba"))
    return (knn.join(rev, ["src", "dst"])
            .filter(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("vec_a"), F.col("dst").alias("vec_b"),
                    "cos_sim", F.col("rank").cast("long").alias("rank_ab"),
                    F.col("rank_ba").cast("long").alias("rank_ba")))


@register(
    "embedding_centroid_drift",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, vec_id % 2 AS half, i,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
    ), cent AS (
      SELECT label, half, i, AVG(x) AS c,
             COUNT(DISTINCT vec_id) AS n
      FROM v GROUP BY label, half, i
    ), joined AS (
      SELECT a.label, a.i, a.c AS ca, b.c AS cb,
             MIN(a.n) OVER (PARTITION BY a.label) AS n_a,
             MIN(b.n) OVER (PARTITION BY a.label) AS n_b
      FROM cent a JOIN cent b
        ON b.label = a.label AND b.i = a.i AND a.half = 0 AND b.half = 1
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(MIN(n_a) AS BIGINT) AS n_a,
           CAST(MIN(n_b) AS BIGINT) AS n_b,
           ROUND(SUM(ca * cb) / (sqrt(SUM(ca * ca)) * sqrt(SUM(cb * cb))),
                 6) AS centroid_cos
    FROM joined GROUP BY label
    """,
    tags=("similarity", "monitoring", "stats"),
)
def embedding_centroid_drift(spark, sf_dir):
    """Per-label embedding centroid drift between two deterministic
    corpus halves (vec_id parity stands in for yesterday's vs today's
    snapshot) — the cheapest meaningful monitor for "did the
    embedding model / upstream text change under us": per-class mean
    vectors are stable under sampling, so a centroid cosine falling
    from ~1 flags representation drift per class long before
    downstream recall does.

    Scale: a centroid is a MERGEABLE MEAN — per-dimension partial
    sums in the map stage, one (label, half, dim)-granular aggregate
    (dims are bounded), then a dimension-wise join and a per-label
    cosine fold over ≤ d rows.  Raw vectors never shuffle; only
    d-row centroid summaries do.  The same shape computes drift
    between ANY two snapshot predicates.

    Determinism: per-dim means are sums of doubles rounded only at
    the final cosine (noise ~1e-15 vs the 1e-6 round); integer
    half-counts; label-keyed output.
    """
    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    v = (e.select("vec_id", "label", (F.col("vec_id") % 2).alias("half"),
                  F.posexplode(F.col("embedding").cast("array<double>"))
                  .alias("i0", "x")))
    cent = (v.groupBy("label", "half", "i0")
            .agg(F.avg("x").alias("c"),
                 F.count_distinct("vec_id").alias("n")))
    a = cent.filter(F.col("half") == 0).select(
        "label", "i0", F.col("c").alias("ca"), F.col("n").alias("n_a"))
    b = cent.filter(F.col("half") == 1).select(
        "label", "i0", F.col("c").alias("cb"), F.col("n").alias("n_b"))
    return (a.join(b, ["label", "i0"])
            .groupBy("label")
            .agg(F.min("n_a").cast("long").alias("n_a"),
                 F.min("n_b").cast("long").alias("n_b"),
                 F.round(F.sum(F.col("ca") * F.col("cb"))
                         / (F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                            * F.sqrt(F.sum(F.col("cb") * F.col("cb")))), 6)
                  .alias("centroid_cos"))
            .select(F.col("label").cast("long").alias("label"),
                    "n_a", "n_b", "centroid_cos"))


# ======================================================================
# IVF-PQ composed ANN (VERDICT r11 #5) — the production index shape
# ======================================================================

_IVFPQ_K = 10

# Shared CTE chain: model build (cents from ids 0..3, codebook from the
# deterministic sample ids 5..40 — all inside the incremental path's
# BASE corpus, vec_id < pipeline.ivfpq_ingest.BASE_SPLIT) → residual
# encode → ADC score → top-k.  ``ivfpq_topk_search`` appends its exact
# recall arm; ``ivfpq_incremental_ingest`` grades straight off
# ``ivf_top`` — the FUNNEL_SIGNAL_CTES discipline, so the two oracles
# can never disagree about what the index computes.
_IVFPQ_CTES = f"""
    WITH wf AS ({S.wf_embeddings_sql()}),
    v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM wf, UNNEST(generate_series(1, 64)) AS t(i)
    ), cent AS (SELECT vec_id AS cid, i, x AS cx FROM v WHERE vec_id < 4),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY ROUND(SUM((v.x - c.cx) * (v.x - c.cx)), 6),
                          c.cid) AS rn
        FROM v JOIN cent c ON c.i = v.i
        GROUP BY v.vec_id, c.cid) WHERE rn = 1
    ), resid AS (
      SELECT v.vec_id, a.cid, v.i, v.x - c.cx AS rx
      FROM v JOIN assign a ON a.vec_id = v.vec_id
      JOIN cent c ON c.cid = a.cid AND c.i = v.i
      WHERE v.vec_id >= 4
    ), book AS (
      SELECT CAST(vec_id / 5 AS BIGINT) AS j,
             CAST((i - 1) // 16 AS INT) AS s, i, rx AS bx
      FROM resid
      WHERE vec_id % 5 = 0 AND vec_id >= 5 AND vec_id <= 40
    ), codes AS (
      SELECT vec_id, cid, s, j FROM (
        SELECT r.vec_id, MIN(r.cid) AS cid, b.s, b.j,
               ROW_NUMBER() OVER (
                 PARTITION BY r.vec_id, b.s
                 ORDER BY ROUND(SUM((r.rx - b.bx) * (r.rx - b.bx)), 6),
                          b.j) AS rn
        FROM resid r JOIN book b ON b.i = r.i
        GROUP BY r.vec_id, b.s, b.j) WHERE rn = 1
    ), adc AS (
      SELECT q.vec_id AS query_id, q.cid AS qcid, b.s, b.j,
             ROUND(SUM((q.rx - b.bx) * (q.rx - b.bx)), 6) AS qd2
      FROM (SELECT * FROM resid
            WHERE vec_id >= 4 AND vec_id < 12) q
      JOIN book b ON b.i = q.i
      GROUP BY q.vec_id, q.cid, b.s, b.j
    ), est AS (
      SELECT a.query_id, c.vec_id AS neighbor_id,
             ROUND(SUM(a.qd2), 4) AS est_d2
      FROM codes c JOIN adc a
        ON a.qcid = c.cid AND a.s = c.s AND a.j = c.j
      WHERE c.vec_id <> a.query_id
      GROUP BY a.query_id, c.vec_id
    ), ivf_top AS (
      SELECT query_id, neighbor_id, est_d2, rk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY est_d2, neighbor_id) AS rk
        FROM est) WHERE rk <= {_IVFPQ_K}
    )"""


@register(
    "ivfpq_topk_search",
    oracle=f"""{_IVFPQ_CTES}, exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND(SUM((q.x - c.x) * (q.x - c.x)), 6),
                          c.vec_id) AS rk
        FROM (SELECT * FROM v WHERE vec_id >= 4 AND vec_id < 12) q
        JOIN v c ON c.i = q.i AND c.vec_id >= 4
                AND c.vec_id <> q.vec_id
        GROUP BY q.vec_id, c.vec_id) WHERE rk <= {_IVFPQ_K}
    )
    SELECT t.query_id,
           MIN(CASE WHEN t.rk = 1 THEN t.neighbor_id END) AS top1_id,
           CAST(COUNT(*) AS BIGINT) AS n_topk,
           ROUND(CAST(SUM(CASE WHEN e.neighbor_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / {_IVFPQ_K}, 4) AS recall_at_10
    FROM ivf_top t
    LEFT JOIN exact e ON e.query_id = t.query_id
                     AND e.neighbor_id = t.neighbor_id
    GROUP BY t.query_id
    """,
    tags=("similarity", "ivf", "quantization"),
)
def ivfpq_topk_search(spark, sf_dir):
    """IVF-PQ composed ANN — the production index shape (VERDICT r11
    #5, the FAISS IVFPQ recipe) assembled from the repo's two halves:
    coarse-quantize the corpus to 4 inverted lists (``ivf_topk_search``
    shape), PQ-encode each vector's RESIDUAL against its coarse
    centroid as 4 sub-codes from an 8-entry/subspace codebook
    (``pq_adc_topk`` shape, built on residuals of a deterministic
    corpus sample), and answer each query (vectors 4..11) with ADC
    lookups over its OWN inverted list only.  Per query it reports
    the IVFPQ top-1, how many candidates ranked, and recall@10
    against the exact L2 top-10 over the full corpus — the accuracy
    column every ANN entry in this registry carries.

    Scale: candidate scoring is m=4 integer-keyed table lookups per
    (candidate, query) inside one inverted list — no full-vector
    arithmetic per candidate and no full-corpus scan on the query
    path (the exact arm exists only to grade recall, exactly like the
    other ANN evals).  Codes are m small ints per vector (the 100 TB
    storage form: 4 bytes/vector vs 256 for float32x64); the ADC
    table is metadata (8 queries x 32 rows) and broadcasts.
    Determinism: every distance rounds to 6 before argmin ranks
    (j/cid/neighbor tie-breaks), estimates round to 4 before the
    top-k rank — the ``pq_adc_topk`` conventions.
    """
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = (e.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v"))
            # consumed by centroids, codebook, corpus encode, query
            # slice AND the exact recall arm — without the lineage cut
            # the well-formedness contract re-ran per consumer (6
            # embeddings scans in the r15 before-plan); guide §3.3.
            # A/B-measured in one session: 3.9 s -> 3.0 s at sf0.1
            )
    vecs = stage_table(vecs, label="ivfpq_vecs")
    ivf = S.ivfpq_topk(vecs, n_coarse=4, m=4, dsub=16, nc=8, stride=5,
                       k=_IVFPQ_K)
    # exact arm (recall grading only): full-corpus L2 top-10 per query
    corpus = vecs.filter(F.col("vec_id") >= 4)
    q = (corpus.filter(F.col("vec_id") < 12)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("v").alias("qv")))
    d2x = F.round(F.aggregate(
        F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    from pyspark.sql import Window as W

    w_x = W.partitionBy("query_id").orderBy("d2x", "vec_id")
    exact = (
        # bounded: q is the fixed 8-vector query set
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", d2x.alias("d2x"))
        .withColumn("rk", F.row_number().over(w_x))
        .filter(F.col("rk") <= _IVFPQ_K)
        .select("query_id", F.col("vec_id").alias("x_neighbor")))
    hit = (ivf.join(exact,
                    (ivf["query_id"] == exact["query_id"])
                    & (ivf["neighbor_id"] == exact["x_neighbor"]),
                    "left")
           .select(ivf["query_id"], "neighbor_id", "rank", "x_neighbor"))
    return (hit.groupBy("query_id").agg(
        F.min(F.when(F.col("rank") == 1, F.col("neighbor_id")))
        .alias("top1_id"),
        F.count("*").alias("n_topk"),
        F.round(F.sum(F.when(F.col("x_neighbor").isNotNull(), 1)
                      .otherwise(0)).cast("double") / _IVFPQ_K, 4)
        .alias("recall_at_10")))


@register(
    "ivfpq_incremental_ingest",
    oracle=f"""{_IVFPQ_CTES}
    SELECT query_id,
           MIN(CASE WHEN rk = 1 THEN neighbor_id END) AS top1_id,
           CAST(COUNT(*) AS BIGINT) AS n_topk,
           TRUE AS incr_eq_scratch
    FROM ivf_top
    GROUP BY query_id
    """,
    tags=("similarity", "ivf", "quantization", "incremental", "pipeline"),
)
def ivfpq_incremental_ingest(spark, sf_dir):
    """IVFPQ incremental ingest (VERDICT r12 #3) — the production
    index-refresh pattern: the frozen model (coarse centroids + PQ
    codebooks) and the base corpus codes are MATERIALIZED parquet
    stage tables (:mod:`..pipeline.ivfpq_ingest`, the
    ``tokenizer_pipeline_audit`` discipline); a delta batch (vec_id >=
    BASE_SPLIT) is encoded against that frozen model only and
    appended to the stored inverted lists; search runs over
    base∪delta.  Per query the result carries ``incr_eq_scratch``:
    TRUE iff every (rank, neighbor, est_d2) of the incremental top-k
    equals a one-shot encode of the full corpus against the same
    model — exact, not recall-banded, because per-vector encoding
    against a frozen model makes append-only ingest algebraically
    lossless (``ivfpq_assign``/``ivfpq_encode`` docstrings).

    The oracle replays the from-scratch arm through the SHARED
    ``_IVFPQ_CTES`` chain (same model, same corpus) and pins the
    equality flag TRUE — the ``approx_percentile_stats`` flag-grading
    pattern.  tests/test_ivfpq_incremental.py additionally pins the
    freeze bit-identically (delta codes equal the delta rows of the
    scratch encoding; base-built centroids equal full-built) and the
    serving plan to NO base re-encoding (base rows enter only through
    the ivf_codes_base parquet scan; every embeddings scan carries a
    pushed vec_id filter).

    Scale: a refresh reads the delta batch + the metadata-sized model
    (broadcast); cost is independent of base corpus size.  The
    certification arm re-encodes everything, but exists only to grade
    — the ANN exact-arm convention.
    """
    from ..pipeline.ivfpq_ingest import run_incremental_ivfpq

    return run_incremental_ivfpq(spark, sf_dir)
