"""Similarity-search queries over ``embeddings`` (north-star, M4).

DuckDB oracles compute cosine with explicit position-joined double
arithmetic so the float path (double accumulation over elements) is
comparable with Spark's fold; all scores rounded before thresholds.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import similarity as S
from . import register

# Shared CTE: per-pair cosine from double-cast elements.
_COS_CTE = """
    WITH v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
    ), norms AS (
      SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM v GROUP BY vec_id
    )
"""


@register(
    "embedding_norms",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2_norm,
           label
    FROM embeddings
    """,
    tags=("similarity",),
)
def embedding_norms(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.round(F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)), 4).alias("l2_norm"),
        "label",
    )


@register(
    "cosine_neardup_pairs",
    oracle=_COS_CTE + """
    , pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.x * b.x) AS dot
      FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT vec_a, vec_b,
           ROUND(dot / (na.nrm * nb.nrm), 4) AS cos_sim
    FROM pairs p JOIN norms na ON na.vec_id = p.vec_a
                 JOIN norms nb ON nb.vec_id = p.vec_b
    WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= 0.9
    """,
    tags=("similarity", "dedup"),
)
def cosine_neardup_pairs(spark, sf_dir):
    """Embedding near-duplicate pairs (cosine ≥ 0.9), brute force.
    The scale path for this operator is ``ann_lsh_bucketed`` (bucketed
    candidates); this exact variant is the correctness baseline."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").cast("array<double>").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").cast("array<double>").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(S.cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.9)
    )


@register(
    "ann_topk_bruteforce",
    oracle=_COS_CTE + """
    , q AS (SELECT vec_id, i, x FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(SUM(q.x * c.x) / (MIN(nq.nrm) * MIN(nc.nrm)), 6) AS cos_sim
      FROM q JOIN v c ON q.i = c.i AND c.vec_id <> q.vec_id
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      GROUP BY q.vec_id, c.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    tags=("similarity", "topk"),
)
def ann_topk_bruteforce(spark, sf_dir):
    """Exact top-3 cosine neighbors for query vectors (vec_id < 5)."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(e.filter(F.col("vec_id") < 5), e, k=3)


@register(
    "ann_lsh_bucketed",
    oracle=_COS_CTE + """
    , bk AS (
      SELECT vec_id,
             ((CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END) * 8 +
              (CASE WHEN CAST(embedding[9] AS DOUBLE) > 0 THEN 1 ELSE 0 END) * 4 +
              (CASE WHEN CAST(embedding[17] AS DOUBLE) > 0 THEN 1 ELSE 0 END) * 2 +
              (CASE WHEN CAST(embedding[25] AS DOUBLE) > 0 THEN 1 ELSE 0 END)) AS bucket
      FROM embeddings
    ), q AS (SELECT vec_id, bucket FROM bk WHERE vec_id < 20),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM q JOIN bk c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    ), scored AS (
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
    tags=("similarity", "lsh"),
)
def ann_lsh_bucketed(spark, sf_dir):
    """Bucketed ANN: sign-bit LSH (dims 1,9,17,25) restricts candidates
    to the query's bucket → ~16× fewer comparisons; at scale the corpus
    is written bucketed on this id so a query touches one bucket."""
    e = load_table(spark, sf_dir, "embeddings")
    bk = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        S.signbit_bucket(F.col("embedding")).alias("bucket"),
    )
    q = bk.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    cand = bk.join(F.broadcast(q), "bucket").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        F.round(S.cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


@register(
    "embedding_label_centroids",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 6) AS dim1_mean,
           ROUND(AVG(CAST(embedding[2] AS DOUBLE)), 6) AS dim2_mean
    FROM embeddings GROUP BY label
    """,
    tags=("similarity", "agg"),
)
def embedding_label_centroids(spark, sf_dir):
    """Per-label centroid components — the reduce step of IVF coarse
    quantization (centroids then become the bucket index)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    return e.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg(F.element_at(emb, 1)), 6).alias("dim1_mean"),
        F.round(F.avg(F.element_at(emb, 2)), 6).alias("dim2_mean"),
    )
