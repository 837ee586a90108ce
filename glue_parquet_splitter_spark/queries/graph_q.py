"""Dedup clustering (connected components), incremental history dedup,
and Z-order layout keys.

These close the loop from "find duplicate pairs" to "ship a deduped
corpus": pairs → transitive clusters → survivor policy, plus the
incremental variant (dedup a new batch against an already-ingested
history) and the multi-dimension clustering key a 100 TB layout wants.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as D
from ..operators.graph import connected_components
from . import register
from .dedup_q import _MINHASH_ORACLE_CTE

# The recursive closure needs the RECURSIVE keyword on the WITH list.
_MINHASH_RECURSIVE_CTE = _MINHASH_ORACLE_CTE.replace("WITH ", "WITH RECURSIVE ", 1)

# MinHash pairs -> verified duplicate edges -> transitive closure.  A
# shared prefix: dedup_connected_components derives components from it,
# leakage_safe_split_by_cluster additionally folds + audits leaks.
_CC_ORACLE_CTES = _MINHASH_RECURSIVE_CTE + """
    , sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.doc_a
      JOIN toks tb ON tb.doc_id = p.doc_b AND tb.tok = ta.tok
      GROUP BY p.doc_a, p.doc_b
    ), verified AS (
      SELECT c.doc_a, c.doc_b
      FROM common c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - n_common), 4) >= 0.5
    ), und AS (
      SELECT doc_a AS u, doc_b AS v FROM verified
      UNION
      SELECT doc_b AS u, doc_a AS v FROM verified
    ), reach AS (
      SELECT u, v FROM und
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON e.u = r.v
    )
"""


def _verified_pairs(spark, sf_dir):
    """Shared Spark prefix of the CC family: LSH candidate pairs
    verified at exact Jaccard >= 0.5 -> (doc_a, doc_b) edges."""
    d = load_table(spark, sf_dir, "documents")
    toks = D.shingles(d, distinct=True)
    pairs = D.candidate_pairs(D.lsh_bands(D.minhash_signatures(d)))
    return (
        D.jaccard(pairs, toks)
        .withColumn("jaccard", F.round("jaccard", 4))
        .filter(F.col("jaccard") >= 0.5)
    )


@register(
    "dedup_connected_components",
    oracle=_CC_ORACLE_CTES + """
    SELECT CAST(u AS BIGINT) AS doc_id,
           CAST(LEAST(u, MIN(v)) AS BIGINT) AS component
    FROM reach GROUP BY u
    """,
    tags=("dedup", "graph"),
)
def dedup_connected_components(spark, sf_dir):
    """Duplicate CLUSTERS from duplicate PAIRS: MinHash/LSH candidates
    → exact-Jaccard verify (≥ 0.5) → connected components (iterative
    min-label propagation, :mod:`..operators.graph`).  One row per doc
    that has at least one verified duplicate; ``component`` (= min
    doc_id in the cluster) is the survivor the keep-policy retains.
    The oracle re-derives the closure with a recursive CTE — the
    algorithms differ, the fixpoint must not."""
    verified = _verified_pairs(spark, sf_dir)
    comp = connected_components(verified, "doc_a", "doc_b")
    return comp.select(F.col("vertex").alias("doc_id"), "component")


@register(
    "leakage_safe_split_by_cluster",
    oracle=_CC_ORACLE_CTES + """
    , comp AS (
      SELECT CAST(u AS BIGINT) AS doc_id,
             CAST(LEAST(u, MIN(v)) AS BIGINT) AS component
      FROM reach GROUP BY u
    ), fold AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component,
             COALESCE(c.component, d.doc_id) % 5 AS fold
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ), leak AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS leak_pairs
      FROM verified v
      JOIN fold a ON a.doc_id = v.doc_a
      JOIN fold b ON b.doc_id = v.doc_b
      WHERE a.fold <> b.fold
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components,
           (SELECT leak_pairs FROM leak) AS leak_pairs
    FROM fold GROUP BY fold
    """,
    tags=("dedup", "graph", "curation"),
)
def leakage_safe_split_by_cluster(spark, sf_dir):
    """Train/eval splitting that cannot leak near-duplicates across the
    boundary: fold assignment is a function of the DEDUP CLUSTER, not
    the document — every doc inherits its connected component's id
    (singletons are their own component), and fold = component % 5.
    Since fold is constant within a component, no verified duplicate
    pair can straddle two folds; the query PROVES it by re-joining the
    verified edges against the fold map (``leak_pairs`` must be 0 — a
    per-doc random split would leak at the duplicate rate).

    Output: per-fold doc count, cluster count, and the global leak
    audit.

    Scale: reuses the LSH candidate path (banded, no all-pairs) and
    the iterative min-label CC operator; the fold map adds one
    doc_id-keyed left join, and the leak audit joins edges (O(dup
    pairs)) to the fold map on doc ids — all evenly-partitioned keys.
    The 1-row leak count rides a bounded crossJoin (global agg).
    """
    d = load_table(spark, sf_dir, "documents")
    verified = _verified_pairs(spark, sf_dir)
    comp = connected_components(verified, "doc_a", "doc_b")
    folds = (d.select("doc_id")
             .join(comp.withColumnRenamed("vertex", "doc_id"),
                   "doc_id", "left")
             .select("doc_id",
                     F.coalesce("component", "doc_id").alias("component"))
             .withColumn("fold", F.col("component") % 5))
    fa = folds.select(F.col("doc_id").alias("doc_a"),
                      F.col("fold").alias("fold_a"))
    fb = folds.select(F.col("doc_id").alias("doc_b"),
                      F.col("fold").alias("fold_b"))
    # coalesce: SUM over ZERO verified edges is NULL in Spark while
    # the oracle's COUNT(*) is 0 — a corpus with rows but no duplicate
    # pairs (the --tiny regime; any clean shard at 100 TB) must audit
    # "0 leaks", not "unknown"
    leak = (verified.join(fa, "doc_a").join(fb, "doc_b")
            .agg(F.coalesce(
                F.sum(F.when(F.col("fold_a") != F.col("fold_b"), 1)
                      .otherwise(0)), F.lit(0))
                 .cast("long").alias("leak_pairs")))
    return (folds.groupBy("fold")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("component").alias("n_components"))
            .crossJoin(F.broadcast(leak))  # bounded: 1-row global agg
            .select(F.col("fold").cast("long").alias("fold"),
                    "n_docs", "n_components", "leak_pairs"))


@register(
    "dedup_against_history",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 < 8
    ), incoming AS (
      SELECT doc_id + 1000000 AS doc_id, lang, md5(text) AS h
      FROM documents WHERE doc_id % 25 = 0
      UNION ALL
      SELECT doc_id, lang, md5(text) AS h
      FROM documents WHERE doc_id % 10 >= 8
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_incoming,
           CAST(SUM(CASE WHEN hist.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_vs_history,
           CAST(SUM(CASE WHEN hist.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)     AS n_ingested
    FROM incoming LEFT JOIN hist ON incoming.h = hist.h
    GROUP BY lang
    """,
    tags=("dedup", "incremental"),
)
def dedup_against_history(spark, sf_dir):
    """Incremental-ingest dedup: a new batch is checked against the
    content-hash set of the already-ingested history (docs with
    ``doc_id % 10 < 8``; the batch = re-ingested copies of every 25th
    history doc + the genuinely-new tail).  The check is a left join
    on the 32-byte hash — at 100 TB the history side is a hash-only
    column (no text shuffled), and when the daily batch is small
    relative to history the same plan runs as a Bloom-filter
    pre-prune + shuffled join on survivors (``bloom_join_pruning``
    shows that variant)."""
    d = load_table(spark, sf_dir, "documents")
    hist = (
        d.filter(F.col("doc_id") % 10 < 8)
        .select(F.md5("text").alias("h")).distinct()
    )
    incoming = (
        d.filter(F.col("doc_id") % 25 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "lang",
                F.md5("text").alias("h"))
        .unionByName(
            d.filter(F.col("doc_id") % 10 >= 8)
            .select("doc_id", "lang", F.md5("text").alias("h"))
        )
    )
    joined = incoming.join(
        hist.withColumn("_dup", F.lit(1)), "h", "left"
    )
    return joined.groupBy("lang").agg(
        F.count("*").alias("n_incoming"),
        F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0)).alias("n_dup_vs_history"),
        F.sum(F.when(F.col("_dup").isNull(), 1).otherwise(0)).alias("n_ingested"),
    )


def z_value(x_col, y_col, bits: int = 16):
    """Morton/Z-order interleave of two ``bits``-wide bucket ids
    (JVM-side integer expressions only).  Sorting or range-partitioning
    by the z-value co-clusters BOTH dimensions, so per-file min/max
    stats prune point/box queries on either column — the layout trick
    Delta/Iceberg OPTIMIZE ZORDER applies, expressed as a plain
    column.  Inputs must already be normalized to ``[0, 2^bits)``:
    interleaving RAW values whose ranges differ by orders of magnitude
    degenerates to a sort on the wide dimension (its high bits own
    every significant z-bit), which is why real z-order
    implementations bucketize per-column first."""
    terms = [
        (F.shiftright(x_col, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        for i in range(bits)
    ] + [
        (F.shiftright(y_col, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
        for i in range(bits)
    ]
    return reduce(lambda a, b: a + b, terms)


_Z_BITS = 8
# SQL form of the 8-bit interleave, generated once so Spark and DuckDB
# share identical bit arithmetic: bit i of x -> bit 2i, of y -> 2i+1.
_Z_SQL = " + ".join(
    [f"((x >> {i}) & 1) * {1 << (2 * i)}" for i in range(_Z_BITS)]
    + [f"((y >> {i}) & 1) * {1 << (2 * i + 1)}" for i in range(_Z_BITS)]
)


@register(
    "zorder_interleave",
    oracle=f"""
    SELECT o_orderkey, {_Z_SQL} AS zval
    FROM (
      SELECT o_orderkey,
             CAST(FLOOR(CAST(o_custkey AS DOUBLE) * 256 / (ck_max + 1)) AS BIGINT) AS x,
             CAST(FLOOR(CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS DOUBLE)
                        * 256 / (day_max + 1)) AS BIGINT) AS y
      FROM orders CROSS JOIN (
        SELECT MAX(o_custkey) AS ck_max,
               MAX(date_diff('day', DATE '1992-01-01', o_orderdate)) AS day_max
        FROM orders)
    )
    """,
    tags=("scale", "layout"),
)
def zorder_interleave(spark, sf_dir):
    """Z-order clustering key over orders(o_custkey, o_orderdate):
    each dimension is first normalized into 256 equal-width buckets
    over its observed range (1-row global-max dim, broadcast and kept
    in-plan — no collect), then Morton-interleaved to a 16-bit zval.
    The normalization is the load-bearing step: custkey and epoch-day
    spans differ by orders of magnitude, and interleaving raw values
    would let the wide dimension own every significant bit.  The write
    path pairs this with ``repartitionByRange(zval)`` so each output
    file covers a small rectangle of (customer, date) space —
    ``tests/test_zorder.py`` measures the min/max pruning win on both
    dimensions vs a single-column sort."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff("o_orderdate", F.lit("1992-01-01"))
    bounds = o.agg(F.max("o_custkey").alias("ck_max"),
                   F.max(day).alias("day_max"))
    x = F.floor(F.col("o_custkey").cast("double") * 256 / (F.col("ck_max") + 1))
    y = F.floor(day.cast("double") * 256 / (F.col("day_max") + 1))
    return (
        o.crossJoin(F.broadcast(bounds))
        .select("o_orderkey", z_value(x, y, bits=_Z_BITS).alias("zval"))
    )


def _pr_iter_sql(prev: str, out: str) -> str:
    """One chained-CTE PageRank step (the oracle's unrolled loop)."""
    return f"""{out} AS (
      SELECT n.node,
             ROUND(0.15 / (SELECT n FROM meta)
                   + 0.85 * COALESCE(x.c, 0), 10) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst, SUM(r.rank / o.deg) AS c
        FROM edges e
        JOIN {prev} r ON r.node = e.src
        JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
      ) x ON x.dst = n.node
    )"""


@register(
    "pagerank_fixed_iters",
    oracle=f"""
    WITH edges AS (
      -- NULL-key contract (--nullkeys fuzz): a NULL key is not a graph
      -- node — pooling anonymous rows into one phantom vertex would
      -- concentrate rank mass AND tie-break nondeterministically at
      -- the top-k cut (NULL orders first in Spark, last in DuckDB)
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL
    ), nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), meta AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (
      SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src
    ), r0 AS (
      SELECT node, 1.0 / (SELECT n FROM meta) AS rank FROM nodes
    ), {_pr_iter_sql('r0', 'r1')}, {_pr_iter_sql('r1', 'r2')},
    {_pr_iter_sql('r2', 'r3')}
    SELECT node, ROUND(rank, 6) AS rank
    FROM r3 ORDER BY rank DESC, node LIMIT 20
    """,
    tags=("graph", "iterative", "topk"),
)
def pagerank_fixed_iters(spark, sf_dir):
    """PageRank (3 fixed iterations, damping 0.85) over the bipartite
    customer→supplier purchase graph — the iterative numeric algorithm
    family: each iteration is a DataFrame-composed join + aggregate,
    and the loop unrolls into ONE lazy plan the oracle mirrors as
    chained CTEs (fixed iteration count keeps it SQL-expressible, so
    this stays hash-verified rather than rows-only).  Ranks round to
    10 decimals per iteration — float summation order differs between
    engines, and re-rounding each step keeps the drift far below the
    graded 6-decimal precision.

    Scale: per iteration the rank frame joins edges on src and
    aggregates per dst.  Because the loop UNROLLS into one plan,
    iteration i's lineage contains iterations 1..i-1 — bounded 3×
    recompute here (the r6 plan audit counts 39 exchanges at
    fixture scale), which is the honest cost of staying a single lazy,
    oracle-gradable job.  A production run at high iteration counts
    breaks the lineage instead: ``localCheckpoint()`` (or a parquet
    round-trip) per iteration, plus edges/ranks pre-partitioned on
    src so each step's join is co-located — the
    ``dedup_connected_components`` operator implements exactly that
    convergence-loop form.  Dangling mass (suppliers have no
    out-edges) is deliberately not redistributed — the standard
    simplified form, identical on both sides.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        # NULL key is not a node — see oracle comment
        .filter(F.col("o_custkey").isNotNull()
                & F.col("l_suppkey").isNotNull())
        .select(F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"))
        .distinct()
    )
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node"))).distinct())
    outdeg = edges.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    n_nodes = nodes.agg(F.count("*").alias("n_nodes"))
    base = nodes.crossJoin(F.broadcast(n_nodes))
    ranks = base.select("node", "n_nodes",
                        (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
    for _ in range(3):
        contrib = (
            edges.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .select("node", "n_nodes",
                    F.round(0.15 / F.col("n_nodes")
                            + 0.85 * F.coalesce("c", F.lit(0.0)), 10)
                    .alias("rank"))
        )
    return (ranks.select("node", F.round("rank", 6).alias("rank"))
            .orderBy(F.desc("rank"), "node").limit(20))


@register(
    "dup_cluster_canonical_pick",
    oracle=_MINHASH_RECURSIVE_CTE + """
    , sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.doc_a
      JOIN toks tb ON tb.doc_id = p.doc_b AND tb.tok = ta.tok
      GROUP BY p.doc_a, p.doc_b
    ), verified AS (
      SELECT c.doc_a, c.doc_b
      FROM common c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - n_common), 4) >= 0.5
    ), und AS (
      SELECT doc_a AS u, doc_b AS v FROM verified
      UNION
      SELECT doc_b AS u, doc_a AS v FROM verified
    ), reach AS (
      SELECT u, v FROM und
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON e.u = r.v
    ), comps AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
      FROM reach GROUP BY u
    ), scored AS (
      SELECT c.component, c.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY c.component) AS n_members
      FROM comps c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(doc_id AS BIGINT) AS canonical_doc,
           CAST(n_chars AS BIGINT) AS canonical_chars,
           CAST(n_members AS BIGINT) AS n_members
    FROM scored WHERE rk = 1
    """,
    tags=("dedup", "graph", "curation"),
)
def dup_cluster_canonical_pick(spark, sf_dir):
    """Survivor SELECTION for duplicate clusters: rather than the
    min-id convention (``dedup_connected_components``'s ``component``
    label), keep the best-quality member of each cluster — here the
    longest document (``n_chars``, doc_id tiebreak), the policy real
    curation uses so a truncated copy never shadows the full text.
    Output: one row per dup cluster with its canonical doc and size.

    Completes the dedup pipeline story: detect pairs (MinHash/LSH) →
    verify (exact Jaccard) → cluster (connected components) → CHOOSE
    the representative by content quality.

    Scale: clusters and members are pair-graph-granular (docs with at
    least one verified dup — a small fraction of the corpus); the
    quality join is doc-level on the cluster members only, and the
    pick is one window over cluster-sized partitions.  The doc_id
    tiebreak makes the pick deterministic under equal quality.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = D.shingles(d, distinct=True)
    pairs = D.candidate_pairs(D.lsh_bands(D.minhash_signatures(d)))
    verified = (
        D.jaccard(pairs, toks)
        .withColumn("jaccard", F.round("jaccard", 4))
        .filter(F.col("jaccard") >= 0.5)
    )
    comp = connected_components(verified, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), "component")
    scored = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    wc = Window.partitionBy("component")
    # total-order: ties agree on (component, n_chars, doc_id) — every
    # returned column — so the canonical pick is roll-invariant
    ranked = scored.select(
        "component", "doc_id", "n_chars",
        F.row_number().over(
            wc.orderBy(F.desc("n_chars"), F.asc("doc_id"))).alias("rk"),
        F.count("*").over(wc).alias("n_members"),
    )
    return ranked.where(F.col("rk") == 1).select(
        "component",
        F.col("doc_id").alias("canonical_doc"),
        F.col("n_chars").alias("canonical_chars"),
        "n_members",
    )


@register(
    "dedup_cluster_size_distribution",
    oracle=_CC_ORACLE_CTES + """
    , comp AS (
      SELECT CAST(u AS BIGINT) AS doc_id,
             CAST(LEAST(u, MIN(v)) AS BIGINT) AS component
      FROM reach GROUP BY u
    ), cs AS (
      SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM cs GROUP BY sz
    UNION ALL
    SELECT 1,
           CAST((SELECT COUNT(*) FROM documents)
                - (SELECT COUNT(*) FROM comp) AS BIGINT),
           CAST((SELECT COUNT(*) FROM documents)
                - (SELECT COUNT(*) FROM comp) AS BIGINT)
    """,
    tags=("dedup", "graph", "agg"),
)
def dedup_cluster_size_distribution(spark, sf_dir):
    """The duplicate-cluster SIZE histogram — the power-law audit run
    before choosing a dedup execution strategy: web corpora follow a
    heavy-tailed cluster-size law, and whether the largest cluster
    holds 10 docs or 10 million decides between a plain groupBy
    survivor pick and the capped/salted machinery
    (``semdedup_capped_*``, the DF caps).  One row per observed
    cluster size (verified-duplicate connected components; size-1 =
    docs with no duplicate), with cluster and doc counts.

    Scale: the CC input path is the banded LSH pipeline (never
    all-pairs); the histogram itself is two tiny aggs over the
    component map plus a 1-row singleton count — the audit costs
    nothing beyond the clustering it audits.
    """
    d = load_table(spark, sf_dir, "documents")
    comp = connected_components(_verified_pairs(spark, sf_dir),
                                "doc_a", "doc_b")
    cs = comp.groupBy("component").agg(F.count("*").alias("sz"))
    hist = (cs.groupBy("sz")
            .agg(F.count("*").alias("n_clusters"),
                 F.sum("sz").alias("n_docs"))
            .select(F.col("sz").cast("long").alias("cluster_size"),
                    "n_clusters", F.col("n_docs").cast("long")
                    .alias("n_docs")))
    totals = d.agg(F.count("*").alias("n_total"))
    clustered = comp.agg(F.count("*").alias("n_clustered"))
    singles = (totals.crossJoin(F.broadcast(clustered))
               .select(F.lit(1).cast("long").alias("cluster_size"),
                       (F.col("n_total") - F.col("n_clustered"))
                       .alias("n_clusters"),
                       (F.col("n_total") - F.col("n_clustered"))
                       .alias("n_docs")))
    return hist.unionByName(singles)
