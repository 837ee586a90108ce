"""ANN scale techniques round 3: int8 quantization and multi-probe LSH.

Two levers a 100 TB vector corpus actually pulls:

- **Quantization** — store/scan int8 codes instead of float32 (4×
  less I/O and cache footprint).  Per-vector symmetric max-abs
  scaling; the scales cancel in cosine, so quantized cosine is just
  the cosine of the integer code vectors.
- **Multi-probe** — instead of widening buckets (which re-inflates
  every query), probe the query's bucket PLUS its Hamming-distance-1
  neighbors: sign-bit LSH loses exactly the near-dups that straddle
  one hyperplane, and those land in a 1-bit-flipped bucket.  Probes
  multiply only the (tiny) query side of the join; the corpus layout
  and scan stay identical to single-probe.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import similarity as S
from . import register

# long-format base + per-vector max-abs + floor-int8 codes (mirrors the
# Spark array expressions bit for bit: floor() is identical in both
# engines, unlike round/cast whose tie and truncation rules differ)
_QUANT_CTE = f"""
    WITH v AS (
      -- finite-vector contract (FUZZ.md --nan sweep)
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
    ), sc AS (
      SELECT vec_id, GREATEST(MAX(ABS(x)), 1e-12) AS maxabs FROM v GROUP BY vec_id
    ), q8 AS (
      SELECT v.vec_id, i, CAST(FLOOR(x * 127 / maxabs) AS DOUBLE) AS q
      FROM v JOIN sc ON sc.vec_id = v.vec_id
    ), qn AS (
      SELECT vec_id, SQRT(SUM(q * q)) AS nrm FROM q8 GROUP BY vec_id
    )
"""


@register(
    "ann_topk_quantized",
    oracle=_QUANT_CTE + """
    , qry AS (SELECT vec_id, i, q FROM q8 WHERE vec_id < 5),
    scored AS (
      SELECT qry.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(SUM(qry.q * c.q) / (MIN(nq.nrm) * MIN(nc.nrm)), 6) AS cos_q8
      FROM qry JOIN q8 c ON c.i = qry.i AND c.vec_id <> qry.vec_id
      JOIN qn nq ON nq.vec_id = qry.vec_id
      JOIN qn nc ON nc.vec_id = c.vec_id
      GROUP BY qry.vec_id, c.vec_id
    )
    SELECT query_id, neighbor_id, cos_q8, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_q8 DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    tags=("similarity", "quantization"),
)
def ann_topk_quantized(spark, sf_dir):
    """Top-3 neighbors by INT8-QUANTIZED cosine: per-vector max-abs
    scale, codes = floor(x·127/maxabs), and since symmetric scales
    cancel in cosine the score is the cosine of the code vectors.
    At 100 TB the codes column is what's stored and scanned — 4×
    smaller than float32; ``tests/test_similarity_recall.py`` shows
    the quantized top-1 matches the exact top-1.  floor (not
    round/cast) keeps the codes bit-identical across engines."""
    # finite-vector contract — mirrors the oracle CTE (FUZZ.md)
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    v = F.col("v")
    maxabs = F.greatest(
        F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))),
        F.lit(1e-12),
    )
    codes = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("maxabs", maxabs)
        .select(
            "vec_id",
            F.transform(v, lambda x: F.floor(x * 127 / F.col("maxabs"))
                        .cast("double")).alias("q"),
        )
    )
    qry = codes.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv"))
    scored = (
        # bounded: qry is the fixed query set (5 vectors)
        codes.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(S.cosine(F.col("qv"), F.col("q")), 6).alias("cos_q8"))
    )
    # total-order: ties agree on every returned column (the score and
    # the trailing id ARE the output row) — rank swaps between
    # indistinguishable rows leave the multiset, and any top-k cut of
    # it, unchanged
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_q8"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cos_q8",
                F.col("rank").cast("long").alias("rank"))
    )


_COS_CTE = f"""
    WITH wf AS ({S.wf_embeddings_sql()}),
    v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM wf, UNNEST(generate_series(1, 64)) AS t(i)
    ), norms AS (
      SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM v GROUP BY vec_id
    ), bk AS (
      SELECT vec_id,
             CAST(SUM((CASE WHEN i = 1  AND x > 0 THEN 8 ELSE 0 END)
                    + (CASE WHEN i = 9  AND x > 0 THEN 4 ELSE 0 END)
                    + (CASE WHEN i = 17 AND x > 0 THEN 2 ELSE 0 END)
                    + (CASE WHEN i = 25 AND x > 0 THEN 1 ELSE 0 END)) AS INT) AS bucket
      FROM v WHERE i IN (1, 9, 17, 25) GROUP BY vec_id
    )
"""


@register(
    "ann_lsh_multiprobe",
    oracle=_COS_CTE + """
    , q AS (SELECT vec_id, bucket FROM bk WHERE vec_id < 20),
    probes AS (
      SELECT vec_id, bucket AS probe FROM q
      UNION ALL SELECT vec_id, xor(bucket, 8) FROM q
      UNION ALL SELECT vec_id, xor(bucket, 4) FROM q
      UNION ALL SELECT vec_id, xor(bucket, 2) FROM q
      UNION ALL SELECT vec_id, xor(bucket, 1) FROM q
    ), cand AS (
      SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM probes p JOIN bk c ON c.bucket = p.probe AND c.vec_id <> p.vec_id
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
def ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe sign-bit LSH: each query (vec_id < 20) probes its
    own bucket plus the 4 buckets one sign-flip away, recovering the
    neighbors single-probe loses when a near-dup straddles one
    hyperplane.  The probe explosion multiplies only the broadcast
    query side (5 rows per query); the corpus scan, bucket layout and
    join shape are identical to ``ann_lsh_bucketed``."""
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    bk = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        S.signbit_bucket(F.col("embedding")).alias("bucket"),
    )
    q = bk.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket")
    probes = q.select(
        "query_id", "qv",
        F.explode(F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(m) for m in (8, 4, 2, 1)],
        )).alias("bucket"),
    )
    cand = (
        # bounded: probes is query_set x 5 probe buckets (fixed)
        bk.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qv", "v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(S.cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"))
    # total-order: ties agree on every returned column (the score and
    # the trailing id ARE the output row) — rank swaps between
    # indistinguishable rows leave the multiset, and any top-k cut of
    # it, unchanged
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("query_id", "neighbor_id", "cos_sim",
                F.col("rank").cast("long").alias("rank"))
    )


@register(
    "ann_pq_adc_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), sub AS (  -- corpus subvectors: 4 subspaces x 16 dims
      SELECT vec_id, s, e[CAST(s*16+1 AS BIGINT):CAST(s*16+16 AS BIGINT)] AS sv
      FROM v, UNNEST([0, 1, 2, 3]) AS t(s)
    ), cent AS (  -- codebook: 8 sampled corpus vectors per subspace
      SELECT CAST(v.vec_id / 5 AS BIGINT) AS j, s,
             e[CAST(s*16+1 AS BIGINT):CAST(s*16+16 AS BIGINT)] AS cv
      FROM v, UNNEST([0, 1, 2, 3]) AS t(s)
      WHERE v.vec_id % 5 = 0 AND v.vec_id < 40
    ), assign AS (  -- encode: nearest centroid per (vector, subspace)
      SELECT vec_id, s, j FROM (
        SELECT sub.vec_id, sub.s, cent.j,
               row_number() OVER (
                 PARTITION BY sub.vec_id, sub.s
                 ORDER BY list_reduce(list_transform(list_zip(sv, cv),
                            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a+b),
                          cent.j) AS rn
        FROM sub JOIN cent USING (s)
      ) WHERE rn = 1
    ), qdist AS (  -- ADC table: query subvector -> each centroid
      SELECT cent.s AS s, cent.j AS j,
             ROUND(list_reduce(list_transform(list_zip(
                     q.e[CAST(cent.s*16+1 AS BIGINT):CAST(cent.s*16+16 AS BIGINT)], cv),
                   p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a+b), 6) AS qd2
      FROM cent, (SELECT e FROM v WHERE vec_id = 1) q
    )
    SELECT vec_id, ROUND(SUM(qd2), 4) AS est_dist2
    FROM assign JOIN qdist USING (s, j)
    WHERE vec_id <> 1
    GROUP BY vec_id
    ORDER BY est_dist2, vec_id
    LIMIT 10
    """,
    tags=("similarity", "ann", "pq"),
)
def ann_pq_adc_topk(spark, sf_dir):
    """Product quantization with asymmetric distance computation (the
    IVF-PQ memory layout): split 64-dim vectors into 4×16-dim
    subspaces, encode each subvector as its nearest of 8 codebook
    centroids (here a deterministic corpus sample; production trains
    per-subspace k-means — ``kmeans_assign_step`` is that step), then
    answer queries from a 4×8-entry distance table — the scan reads
    4-byte codes, never the float vectors.

    Scale: the codebook (32 subvectors) broadcasts; encoding is a
    32-way broadcast fan-out + per-(vector, subspace) argmin — one
    corpus scan, no corpus shuffle (codes would be written once at
    ingest).  The query side touches only the 32-entry ADC table and
    the code column.  Estimated distances are rounded before the sum
    and the rank (cross-engine float-accumulation guard); exact-recall
    proof vs brute force lives in tests/test_similarity_recall.py.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return S.pq_adc_topk(emb, query_id=1, m=4, dsub=16, nc=8, stride=5, k=10)


@register(
    "mips_norm_bound_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
    ), q AS (SELECT vec_id, i, x FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(SUM(q.x * c.x), 4) AS dot_score
      FROM q JOIN v c ON c.i = q.i AND c.vec_id <> q.vec_id
      GROUP BY q.vec_id, c.vec_id
    )
    SELECT query_id, neighbor_id, dot_score, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY dot_score DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    tags=("similarity", "topk", "scale"),
)
def mips_norm_bound_topk(spark, sf_dir):
    """EXACT maximum-inner-product top-3 with Cauchy-Schwarz pruning —
    the retrieval scoring (un-normalized dot product) where cosine LSH
    does not apply.  Two phases, provably complete:

    1. Seed bound: score only the 32 highest-norm vectors (a
       TakeOrdered, never a global sort) — the k-th best seed dot is a
       LOWER bound L on each query's true k-th score.
    2. Prune: any vector with ``|q|·|v| < L`` cannot beat L
       (Cauchy-Schwarz), so the exact pass scores only survivors.
       The margin 1e-3 on the threshold covers the output rounding
       granularity (1e-4), so even rounded-score ties at the k-th rank
       see every contender the brute-force oracle sees.

    Norms are one map-side pass; queries, seeds, and bounds are all
    tiny broadcasts; the corpus is scanned, never shuffled.  On
    real embedding distributions (norms concentrated, scores spread)
    the norm filter drops most of the corpus; the oracle is the full
    brute-force MIPS, so the hash gate proves the pruning lossless.
    """
    # finite-vector + identity contract — mirrors the oracle wfd
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    nrm = F.sqrt(F.aggregate(
        F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    corpus = vecs.select("vec_id", "v", nrm.alias("nrm"))
    queries = (corpus.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qv"), F.col("nrm").alias("qnrm")))
    seeds = (corpus.orderBy(F.col("nrm").desc(), "vec_id").limit(32)
             .select(F.col("vec_id").alias("neighbor_id"),
                     F.col("v").alias("cv")))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    bounds = (
        # bounded: seeds is a 32-row limit; queries is the fixed query set
        queries.join(F.broadcast(seeds),
                     F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", dot.alias("d"))
        .groupBy("query_id")
        .agg(F.expr("sort_array(collect_list(d), false)[2]").alias("kth"))
        .select("query_id", (F.col("kth") - 1e-3).alias("lb"))
    )
    # bounded: bounds is one row per query (fixed query set)
    qb = queries.join(F.broadcast(bounds), "query_id")
    cand = corpus.join(
        # bounded: qb is the fixed query set with its per-query bound
        F.broadcast(qb),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("nrm") * F.col("qnrm") >= F.col("lb")),
    ).select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        F.round(F.aggregate(
            F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x), 4).alias("dot_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        # total-order: ties agree on every returned column (the score and
        # the trailing id ARE the output row) — rank swaps between
        # indistinguishable rows leave the multiset, and any top-k cut of
        # it, unchanged
        F.col("dot_score").desc(), "neighbor_id")
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("query_id", "neighbor_id", "dot_score",
                    F.col("rank").cast("long").alias("rank")))


@register(
    "ann_jl_projection_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
    ), proj AS (
      SELECT vec_id, j,
             SUM(CASE WHEN ((j * 73 + d * 151) % 7) < 4 THEN x ELSE -x END)
               AS p
      FROM v, UNNEST(generate_series(0, 7)) AS s(j)
      GROUP BY vec_id, j
    ), pn AS (
      SELECT vec_id, sqrt(SUM(p * p)) AS nrm FROM proj GROUP BY vec_id
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(q.p * c.p) / (MIN(nq.nrm) * MIN(nc.nrm)) AS pc
      FROM proj q JOIN proj c ON c.j = q.j AND c.vec_id <> q.vec_id
      JOIN pn nq ON nq.vec_id = q.vec_id
      JOIN pn nc ON nc.vec_id = c.vec_id
      WHERE q.vec_id < 5
      GROUP BY q.vec_id, c.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, ROUND(pc, 4) AS proj_cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(pc, 6) DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, proj_cos, CAST(rk AS BIGINT) AS rank
    FROM ranked WHERE rk <= 3
    """,
    tags=("similarity", "projection"),
)
def ann_jl_projection_topk(spark, sf_dir):
    """Johnson-Lindenstrauss random-projection ANN — the
    dimensionality-REDUCTION member of the scale family (quantization
    shrinks bits/dim, LSH shrinks candidates, JL shrinks DIMENSIONS):
    project 64-dim vectors to 8 dims through a deterministic ±1 sign
    matrix (s(j,d) = +1 iff (73j + 151d) mod 7 < 4 — fixed, so both
    engines build the identical matrix), then rank neighbors by
    projected cosine.  Top-3 per query by (round-6 projected cosine,
    id) — float noise cannot flip ranks.

    Scale: the projection is a map-side fold per row — the 100 TB
    corpus is REWRITTEN once at 1/8th the width, and every downstream
    scan/shuffle/compare pays 8 floats instead of 64.  JL's guarantee
    is distance preservation within 1±ε, so recall loss is bounded
    and `tests/test_similarity_recall.py` pins the planted-structure
    recall.  The sign matrix needs no storage on executors — it is an
    expression, not data.
    """
    # finite-vector + identity contract — mirrors the oracle wfd
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    base = e.select("vec_id",
                    F.col("embedding").cast("array<double>").alias("v"))
    # p[j] = sum_d s(j,d) * v[d], left-fold — deterministic order
    proj = base.select(
        "vec_id",
        F.expr(
            "transform(sequence(0, 7), j -> "
            " aggregate(zip_with(v, sequence(0, size(v) - 1), "
            "  (x, d) -> if(((j * 73 + d * 151) % 7) < 4, x, -x)), "
            "  0.0D, (acc, y) -> acc + y))"
        ).alias("p"),
    )
    nrm = F.sqrt(F.aggregate(
        F.transform("p", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    pv = proj.select("vec_id", "p", nrm.alias("nrm"))
    q = pv.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("p").alias("qp"),
        F.col("nrm").alias("qn"))
    # bounded: q is the fixed query set (5 vectors)
    cand = pv.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    # NULL when either projected norm is zero (zero input vectors
    # project to zero) — matches DuckDB's division-by-zero → NULL
    pc = F.when(
        F.col("nrm") * F.col("qn") != 0,
        F.aggregate(F.zip_with("p", "qp", lambda a, b: a * b),
                    F.lit(0.0), lambda a, x: a + x)
        / (F.col("nrm") * F.col("qn")))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), pc.alias("pc"))
    w = Window.partitionBy("query_id").orderBy(
        # total-order: ties agree on every returned column (the score and
        # the trailing id ARE the output row) — rank swaps between
        # indistinguishable rows leave the multiset, and any top-k cut of
        # it, unchanged
        F.desc(F.round(F.col("pc"), 6)), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id",
                F.round("pc", 4).alias("proj_cos"),
                F.col("rank").cast("long").alias("rank"))
    )


@register(
    "topk_incremental_merge",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
    ), q AS (
      SELECT i, x AS qx FROM v WHERE vec_id = 1
    ), corpus AS (
      SELECT vec_id, i, x FROM v WHERE vec_id >= 10
      UNION ALL
      SELECT 2000000 AS vec_id, i, qx * 1.5 AS x FROM q
      UNION ALL
      SELECT vec_id + 2000001 AS vec_id, i,
             x + (CASE WHEN i = 3 THEN 0.01 ELSE 0.0 END) AS x
      FROM v WHERE vec_id >= 10 AND vec_id < 20
    ), norms AS (
      SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM corpus GROUP BY vec_id
    ), qn AS (
      SELECT sqrt(SUM(qx * qx)) AS qnrm FROM q
    ), scored AS (
      SELECT corpus.vec_id,
             SUM(corpus.x * q.qx) / (MIN(norms.nrm) * MIN(qn.qnrm)) AS cos_q
      FROM corpus JOIN q USING (i)
      JOIN norms ON norms.vec_id = corpus.vec_id
      CROSS JOIN qn
      GROUP BY corpus.vec_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY ROUND(cos_q, 6) DESC, vec_id)
                AS BIGINT) AS rank,
           vec_id,
           ROUND(cos_q, 6) AS cos_q,
           vec_id >= 2000000 AS from_delta
    FROM scored ORDER BY ROUND(cos_q, 6) DESC, vec_id LIMIT 10
    """,
    tags=("similarity", "topk", "incremental"),
)
def topk_incremental_merge(spark, sf_dir):
    """Incremental top-k similarity serving — the pattern an ANN index
    uses to stay fresh without rescanning the base: the BASE corpus's
    top-k is computed once (in production: cached/materialized), each
    arriving DELTA batch is scored alone, and the served result is the
    k-merge of the two k-row lists.  Top-k is associative, so the
    staged merge must equal a direct top-k over base ∪ delta — and
    that is exactly what the oracle certifies: Spark runs the staged
    base-topk ∪ delta-topk → re-rank path, DuckDB scores the unioned
    corpus directly, and the results must hash-match.  The delta
    plants a scaled copy of the query itself (cosine exactly 1 →
    guaranteed rank 1 from the delta) plus perturbed near-copies of
    base vectors, so the merge is non-vacuous by construction.

    Scale: the base scan never re-runs for a delta batch — each
    increment costs one delta-sized scan plus a 2k-row merge; both
    arm top-ks are ``TakeOrderedAndProject`` (per-partition heaps)
    and the merge sorts ≤ 2k rows.  This composes with any scoring
    arm (brute cosine here; IVF/LSH at 100 TB) because only the
    per-batch top-k lists cross stages.

    Engine parity: ranks order by ``ROUND(cos, 6)`` desc with vec_id
    tie-break (the registry's argmax convention); the planted
    cosine-1.0 row pins the head deterministically.
    """
    # finite-vector + identity contract — mirrors the oracle wfd
    e = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    qv = (vecs.where(F.col("vec_id") == 1)
          .select(F.col("v").alias("qv")))
    base = vecs.where(F.col("vec_id") >= 10)
    delta = (
        qv.select(F.lit(2000000).cast("long").alias("vec_id"),
                  F.transform("qv", lambda x: x * 1.5).alias("v"))
        .unionByName(
            vecs.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
            .select((F.col("vec_id") + 2000001).alias("vec_id"),
                    F.transform(
                        "v", lambda x, i: F.when(i == F.lit(2), x + F.lit(0.01))
                        .otherwise(x)).alias("v")))
    )

    def topk(df, k=10):
        return (
            # bounded: qv is a single query vector (1 row)
            df.crossJoin(F.broadcast(qv))
            .select("vec_id", S.cosine(F.col("v"), F.col("qv")).alias("cos_q"))
            .orderBy(F.desc(F.round("cos_q", 6)), "vec_id").limit(k)
        )

    merged = (
        topk(base).unionByName(topk(delta))
        .orderBy(F.desc(F.round("cos_q", 6)), "vec_id").limit(10)
    )
    return merged.select(
        F.row_number().over(
            Window.orderBy(F.desc(F.round("cos_q", 6)), "vec_id"))
        .cast("long").alias("rank"),
        "vec_id",
        F.round("cos_q", 6).alias("cos_q"),
        (F.col("vec_id") >= 2000000).alias("from_delta"),
    )
