"""Scale-technique queries: each demonstrates a 100 TB pattern whose
RESULT is still oracle-checkable (the technique changes the plan, not
the answer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import similarity as S
from . import register


@register(
    "salted_skew_join",
    oracle="""
    SELECT c.c_mktsegment AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("scale", "join", "skew"),
)
def salted_skew_join(spark, sf_dir):
    """Skew-mitigation by salting: the (potentially hot) fact key is
    salted 8 ways and the dim side replicated ×8, so one hot key spreads
    over 8 reducers. Result is identical to the plain join — the oracle
    IS the plain join. (AQE's skew-join handles this automatically; the
    manual pattern is for engines/joins AQE can't rewrite.)"""
    n_salt = 8
    o = load_table(spark, sf_dir, "orders").withColumn(
        "_salt", (F.abs(F.hash("o_orderkey")) % n_salt).cast("int")
    )
    salts = spark.range(n_salt).select(F.col("id").cast("int").alias("_salt"))
    # bounded: salts is an 8-row constant range
    c = load_table(spark, sf_dir, "customer").crossJoin(F.broadcast(salts))
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o._salt == c._salt))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "deterministic_sample",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE CAST(substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 4) AS VARCHAR) < '1999'
    """,
    tags=("scale", "sampling"),
)
def deterministic_sample(spark, sf_dir):
    """~10% deterministic sample via content hashing (md5 prefix <
    '1999' ≈ 0x1999/0xffff ≈ 10%). Unlike ``TABLESAMPLE``, the picked
    set is stable across engines, runs, and partitionings — the
    reproducibility property a training-data pipeline needs."""
    from ..functions import content_sample_pred

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(content_sample_pred(["l_orderkey", "l_linenumber"]))
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
    )


@register(
    "posexplode_tokens",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         UNNEST(generate_series(1, array_length(t))) AS u(i)
    WHERE doc_id < 50
    """,
    tags=("scale", "generator"),
)
def posexplode_tokens(spark, sf_dir):
    """Positional explode (generator/UDTF shape)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    )


@register(
    "union_by_name",
    oracle="""
    SELECT key, CAST(SUM(n) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS key, 1 AS n FROM customer
      UNION ALL BY NAME
      SELECT 1 AS n, s_nationkey AS key FROM supplier
    ) GROUP BY key
    """,
    tags=("scale", "setop"),
)
def union_by_name(spark, sf_dir):
    """Schema-aligned union (column order independent) — the safe way
    to append heterogeneous batches in a long-lived pipeline."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("key"), F.lit(1).alias("n"))
    s = load_table(spark, sf_dir, "supplier").select(F.lit(1).alias("n"), F.col("s_nationkey").alias("key"))
    return c.unionByName(s).groupBy("key").agg(F.sum("n").alias("n"))


@register(
    "histogram_fixed_buckets",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
    tags=("scale", "agg"),
)
def histogram_fixed_buckets(spark, sf_dir):
    """Fixed-width histogram — single map-side bucketing + one agg;
    the building block for distribution profiling at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "event_sequence_first_after",
    oracle="""
    WITH sign AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT s.user_id AS user_id,
           strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_at,
           strftime(MIN(e.ts), '%Y-%m-%d %H:%M:%S')   AS first_purchase_after
    FROM sign s JOIN events e
      ON e.user_id = s.user_id AND e.event_type = 'purchase' AND e.ts > s.signup_ts
    GROUP BY s.user_id, s.signup_ts
    """,
    tags=("scale", "events", "sequence"),
)
def event_sequence_first_after(spark, sf_dir):
    """Event sequencing: first purchase strictly after each user's
    first signup — two group-bys and one equi-join, no window needed."""
    ev = load_table(spark, sf_dir, "events")
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("signup_ts"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    return (
        sign.join(pur, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            F.date_format("signup_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_at"),
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("first_purchase_after"),
        )
    )


@register(
    "kmeans_assign_step",
    oracle=f"""
    WITH wf AS ({S.wf_embeddings_sql()}),
    v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM wf, UNNEST(generate_series(1, 64)) AS t(i)
    ), cent AS (SELECT vec_id AS cid, i, x FROM v WHERE vec_id < 4),
    dists AS (
      SELECT v.vec_id, c.cid, SUM((v.x - c.x) * (v.x - c.x)) AS d2
      FROM v JOIN cent c ON c.i = v.i
      WHERE v.vec_id >= 4
      GROUP BY v.vec_id, c.cid
    ), assigned AS (
      SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM dists
    )
    SELECT cid AS centroid_id, CAST(COUNT(*) AS BIGINT) AS n_assigned
    FROM assigned WHERE rn = 1 GROUP BY cid
    """,
    tags=("scale", "similarity", "iterative"),
)
def kmeans_assign_step(spark, sf_dir):
    """One k-means assignment step (k=4, centroids = vectors 0..3):
    the inner loop of Lloyd's algorithm as a broadcast-centroid pass —
    the iterative-algorithm shape on DataFrames (each iteration is one
    scan + one small agg; centroids always broadcast).  The corpus
    enters through the finite_vectors well-formedness contract."""
    from ..operators.similarity import finite_vectors
    e = finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        vecs.filter(F.col("vec_id") >= 4)
        # bounded: cents is the k-row centroid table
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", d2.alias("d2"))
        # argmin via min_by on (d2, cid) — total order (cid unique per
        # candidate row), same winner as the old rank-1 sort window,
        # map-side combinable (the _semdedup_assign recipe)
        .groupBy("vec_id")
        .agg(F.min_by("cid", F.struct("d2", "cid")).alias("centroid_id"))
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n_assigned"))
    )


@register(
    "bloom_join_pruning",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#23'
    GROUP BY l_returnflag
    """,
    tags=("scale", "join", "bloom"),
)
def bloom_join_pruning(spark, sf_dir):
    """Selective fact⋈dim join — the shape Spark's runtime Bloom filter
    prunes: the dim filter (p_brand) survives ~1/25 of part, so the
    optimizer can build a Bloom filter on the surviving p_partkey set
    and push a might_contain() predicate into the lineitem scan,
    skipping fact rows before the shuffle.  Injection is governed by
    size thresholds (`spark.sql.optimizer.runtime.bloomFilter.*`, on by
    default at 10 GiB app-side) — at bench scale the join broadcasts
    instead; `tests/test_bloom_filter.py` lowers the thresholds and
    asserts the bloom_filter_agg/might_contain plan nodes appear.  The
    answer is plan-independent, which is what the oracle checks."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@register(
    "kmeans_lloyd_iters",
    oracle=f"""
    WITH wf AS ({S.wf_embeddings_sql()}),
    v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM wf, UNNEST(generate_series(1, 64)) AS t(i)
    ), c0 AS (
      SELECT vec_id AS cid, i, ROUND(x, 8) AS x FROM v WHERE vec_id < 4
    ), d1 AS (
      SELECT v.vec_id, c.cid, SUM((v.x - c.x) * (v.x - c.x)) AS d2
      FROM v JOIN c0 c ON c.i = v.i GROUP BY v.vec_id, c.cid
    ), a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d1) WHERE rn = 1
    ), c1 AS (
      SELECT a.cid, v.i, ROUND(AVG(v.x), 8) AS x
      FROM a1 a JOIN v ON v.vec_id = a.vec_id GROUP BY a.cid, v.i
    ), dd2 AS (
      SELECT v.vec_id, c.cid, SUM((v.x - c.x) * (v.x - c.x)) AS d2
      FROM v JOIN c1 c ON c.i = v.i GROUP BY v.vec_id, c.cid
    ), a2 AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM dd2) WHERE rn = 1
    )
    SELECT cid AS centroid_id, CAST(COUNT(*) AS BIGINT) AS n_assigned,
           ROUND(SUM(d2), 2) AS inertia
    FROM a2 GROUP BY cid
    """,
    tags=("scale", "similarity", "iterative"),
)
def kmeans_lloyd_iters(spark, sf_dir):
    """TWO full Lloyd iterations (assign → recompute centroids →
    re-assign), unrolled into one lazy plan — ``kmeans_assign_step``
    is the inner loop; this is the LOOP, with the centroid-update
    step the assign-only query never exercises.  Returns final
    cluster sizes + inertia (sum of squared distances), the quantity
    Lloyd's monotonically decreases.

    Per iteration: one corpus scan with the k=4 centroid table
    broadcast (k×n fan-out, per-vector argmin), then the update — a
    posexplode to (cid, dim) and a map-side-combinable groupBy over
    k×64 groups, re-assembled to centroid arrays via array_sort on
    (index, mean) structs.  Centroid means round to 8 decimals each
    iteration (same drift discipline as ``pagerank_fixed_iters``:
    cross-engine float-sum order differences stay far below the
    graded precision, and a near-tie argmin flip would need two
    centroids within 1e-8).  Unrolling recomputes iteration 1 inside
    iteration 2's lineage — the honest cost of one oracle-gradable
    lazy job; the convergence-loop form with per-iteration
    localCheckpoint lives in ``operators/graph.py``.  The corpus
    enters through the finite_vectors well-formedness contract.
    """
    from ..operators.similarity import finite_vectors
    e = finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"),
        F.expr("transform(v, x -> round(x, 8))").alias("cv"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    for it in range(2):
        assigned = (
            # bounded: cents is the k-row centroid table
            vecs.crossJoin(F.broadcast(cents))
            .select("vec_id", "v", "cid", d2.alias("d2"))
            # argmin via min_by on (d2, cid) — total order (cid unique
            # per candidate row), same winner as the old rank-1 sort
            # window, but the k candidate rows per vector combine
            # MAP-SIDE before any exchange (the _semdedup_assign /
            # ivfpq_assign recipe): no sort, 1/k the shuffled rows
            .groupBy("vec_id")
            .agg(F.min_by(F.struct("cid", "d2", "v"),
                          F.struct("d2", "cid")).alias("b"))
            .select("vec_id", F.col("b.v").alias("v"),
                    F.col("b.cid").alias("cid"), F.col("b.d2").alias("d2"))
        )
        if it == 1:
            return assigned.groupBy(F.col("cid").alias("centroid_id")).agg(
                F.count("*").alias("n_assigned"),
                F.round(F.sum("d2"), 2).alias("inertia"),
            )
        means = (
            assigned.select("cid", F.posexplode("v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.round(F.avg("x"), 8).alias("x"))
        )
        cents = (
            means.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "x"))).alias("s"))
            .select("cid", F.expr("transform(s, p -> p.x)").alias("cv"))
        )
