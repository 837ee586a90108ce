"""Similarity search over embedding columns (``array<float>``).

Spark-first: cosine is a higher-order-function fold (``zip_with`` +
``aggregate``) — JVM-side, no Python. Two search paths:

- brute-force top-k: cross join + window top-k. Exact; O(Q·N) — fine
  when Q (the query set) is small; at 100 TB N-side it's one broadcast
  of Q against a partitioned scan of N, no shuffle of the corpus.
- sign-bit LSH buckets: partition the corpus by the sign pattern of a
  fixed dimension subset (axis-aligned random hyperplanes); candidates
  only within the query's bucket. The bucket id is computed in the
  scan projection, so the "index" is a cheap repartition/bucketed
  layout at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b) -> F.Column:
    """Dot product of two array<double> columns (deterministic left
    fold over zip_with — fixed element order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v) -> F.Column:
    """||v||₂ over an array<double> column."""
    v = F.col(v) if isinstance(v, str) else v
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def finite_vectors(df: DataFrame,
                   vec: str = "embedding") -> DataFrame:
    """Keep only well-formed, all-finite vectors.  The EXCLUSION
    contract (explicit on both engines, ADVICE r11) drops a vector
    that is (a) NULL, (b) empty, (c) has any NULL component, or
    (d) has any non-finite component (NaN/±Inf — failed encodes).

    Rationale: a non-finite component makes every downstream
    similarity NaN, and NaN's "greater than everything" rank ordering
    is engine-divergent; NULL components and empty arrays are
    engine-divergent in the OPPOSITE direction (DuckDB ``list_sum``
    skips NULL elements and returns NULL for ``[]``, Spark
    ``aggregate`` propagates NULL and returns 0.0 for ``[]``), so the
    contract names all four shapes rather than letting the fold's
    engine semantics decide.  Oracle mirror::

        v IS NOT NULL AND len(v) > 0
        AND len(list_filter(v, x -> x IS NULL)) = 0
        AND isfinite(list_sum(list_transform(v, x -> abs(x))))

    (abs folds ±Inf to +Inf and NaN stays NaN, so the sum is finite
    iff every component is).  ``embedding_health_audit`` is the
    detector that reports such vectors before a pipeline runs.  Found
    by the --nan fuzz sweep (FUZZ.md); NULL-component/empty shapes
    are in the fuzzer's embedding generator."""
    v = F.col(vec).cast("array<double>")
    s = F.aggregate(F.transform(v, lambda x: F.abs(x)),
                    F.lit(0.0), lambda a, x: a + x)
    return df.filter(F.col(vec).isNotNull() & (F.size(v) > 0)
                     & ~F.exists(v, lambda x: x.isNull())
                     & ~F.isnan(s) & (s != F.lit(float("inf"))))


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", l2_norm(F.col(vec).cast("array<double>")))


def cosine(a, b):
    """Cosine similarity between two array<double> columns.

    NULL when either vector has zero norm (cosine is undefined there;
    a 100 TB embedding corpus WILL contain zero vectors from failed
    encodes/padding).  NULL matches DuckDB's division-by-zero → NULL
    contract, so oracles need no special-casing, and NULL similarity
    drops out of ≥-threshold filters and top-k ranks in both engines.
    Found by scripts/fuzz_oracle.py (zero-vector hostility).

    ``try_divide``, not ``F.when(denom != 0, ...)``: the when-form
    names the norm-product fold in BOTH the predicate and the
    divisor, and codegen does not CSE the aggregate-HOF across the
    branches — it re-folded every candidate pair (knn_graph_lsh
    +64 % wall in the r11 canonical run); try_divide evaluates the
    denominator once and returns NULL on zero."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 3) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` / ``corpus``: (vec_id, embedding). Queries are
    broadcast; the corpus is never shuffled.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    scored = (
        # bounded: q is the query set (k query vectors, caller-bounded)
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def signbit_bucket(vec, dims: tuple = (1, 9, 17, 25)) -> F.Column:
    """LSH bucket id from the sign bits of fixed dimensions (1-based)."""
    b = F.lit(0)
    for d in dims:
        b = b * 2 + F.when(F.element_at(vec, d) > 0, 1).otherwise(0)
    return b.cast("int")


def pq_adc_topk(emb: DataFrame, query_id: int, m: int = 4, dsub: int = 16,
                nc: int = 8, stride: int = 5, k: int = 10) -> DataFrame:
    """Product-quantization top-k via asymmetric distance computation.

    ``emb``: (vec_id, e: array<double>), dim = m·dsub.  Codebook =
    corpus vectors {0, stride, …, (nc−1)·stride} sliced per subspace
    (a deterministic sample standing in for per-subspace k-means).
    Encoding: nearest centroid per (vector, subspace) via a 
    broadcast fan-out (m·nc small rows) + argmin — one corpus scan, no
    corpus shuffle.  Query: sum of ADC table lookups over the codes.

    Estimated distances round before the sum and the rank so the
    result is stable across engines' float accumulation orders.
    """
    s_col = F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("s")
    sub = emb.select("vec_id", "e", s_col).select(
        "vec_id", "s", F.slice("e", F.col("s") * dsub + 1, dsub).alias("sv")
    )
    cent = (
        emb.where((F.col("vec_id") % stride == 0) & (F.col("vec_id") < stride * nc))
        .select((F.col("vec_id") / stride).cast("long").alias("j"), "e", s_col)
        .select("j", "s", F.slice("e", F.col("s") * dsub + 1, dsub).alias("cv"))
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id", "s").orderBy("d2", "j")
    assign = (
        # bounded: cent is the PQ codebook (n_sub x 256 centroids, constant)
        sub.join(F.broadcast(cent), "s")
        .select("vec_id", "s", "j", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "s", "j")
    )
    q = emb.where(F.col("vec_id") == query_id).select(F.col("e").alias("qe"))
    qd2 = F.aggregate(
        F.zip_with(
            F.slice("qe", F.col("s") * dsub + 1, dsub), F.col("cv"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    # bounded: q is a single query vector (1 row)
    qdist = cent.crossJoin(F.broadcast(q)).select(
        "s", "j", F.round(qd2, 6).alias("qd2")
    )
    return (
        # bounded: qdist = codebook x 1 query (n_sub x 256 rows, constant)
        assign.join(F.broadcast(qdist), ["s", "j"])
        .where(F.col("vec_id") != query_id)
        .groupBy("vec_id")
        .agg(F.round(F.sum("qd2"), 4).alias("est_dist2"))
        .orderBy("est_dist2", "vec_id")
        .limit(k)
    )
