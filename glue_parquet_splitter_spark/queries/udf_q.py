"""UDF / UDAF / UDTF coverage (SURVEY.md §2 taxonomy row: absent from
the reference — every transform there is driver-side Python; here each
Python-extension API is exercised with Arrow vectorization where the
API supports it, and every function is deterministic so the oracle
still applies)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import similarity as S
from ..operators.text import unique_documents
from . import register


@register(
    "pandas_udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf", "udaf"),
)
def pandas_udaf_weighted_avg(spark, sf_dir):
    """Grouped-agg Pandas UDF (vectorized UDAF): quantity-weighted mean
    price per return flag. Arrow moves each group's columns in one
    batch; the Python work is two numpy dot products."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        # sign-flipped quantities can cancel a group's weight sum to
        # exactly zero on a tiny corpus (seed-15 --tiny --negative
        # roll): numpy float /0 yields inf where DuckDB SUM/SUM yields
        # NULL — return None to match the SQL degenerate answer
        den = float(qty.sum())
        if den == 0.0:
            return None
        return float((price * qty).sum() / den)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("weighted_avg_price"))
    )


@register(
    "python_udtf_chunks",
    oracle="""
    SELECT doc_id,
           CAST(c - 1 AS BIGINT) AS chunk_idx,
           array_to_string(t[(c - 1) * 10 + 1 : c * 10], ' ') AS chunk_text
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 30),
         UNNEST(generate_series(1, CAST(CEIL(array_length(t) / 10.0) AS BIGINT))) AS u(c)
    """,
    tags=("udf", "udtf"),
)
def python_udtf_chunks(spark, sf_dir):
    """Python UDTF (table function): chunk each document into 10-token
    windows — the canonical pre-tokenization step of a training-data
    pipeline (context-length packing). One input row → N output rows."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id bigint, chunk_idx bigint, chunk_text string")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            if text is None:       # NULL text chunks to nothing (the
                return             # oracle's UNNEST over NULL is empty)
            toks = text.split(" ")
            for c, start in enumerate(range(0, len(toks), 10)):
                yield doc_id, c, " ".join(toks[start:start + 10])

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("doc_chunker", Chunker)
    return spark.sql(
        "SELECT c.* FROM _udtf_docs d, LATERAL doc_chunker(d.doc_id, d.text) c"
    )


@register(
    "ivf_topk_search",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM ({S.wf_embeddings_sql()}) wfd,
           UNNEST(generate_series(1, 64)) AS t(i)
    ), cent AS (SELECT vec_id AS cid, i, x FROM v WHERE vec_id < 4),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY SUM((v.x - c.x) * (v.x - c.x)), c.cid) AS rn
        FROM v JOIN cent c ON c.i = v.i
        GROUP BY v.vec_id, c.cid)
      WHERE rn = 1
    ), q AS (SELECT vec_id AS query_id, cid FROM assign WHERE vec_id >= 4 AND vec_id < 12),
    cand AS (
      SELECT q.query_id, a.vec_id AS neighbor_id
      FROM q JOIN assign a ON a.cid = q.cid
       AND a.vec_id <> q.query_id AND a.vec_id >= 4
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
def ivf_topk_search(spark, sf_dir):
    """IVF-style ANN: coarse-quantize the corpus to its nearest of 4
    centroids (vectors 0–3), then search only the query's inverted
    list. At scale the assignment is a bucketed/partitioned layout and
    a query touches one partition; centroids always broadcast."""
    from pyspark.sql import Window

    from ..operators.similarity import finite_vectors

    # finite-vector + identity contract — mirrors the oracle wfd
    e = finite_vectors(load_table(spark, sf_dir, "embeddings"))
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = vecs.filter(F.col("vec_id") < 4).select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    # total-order: cid is unique per partition — one scored row per
    # (vec_id, cid) by construction of the centroid cross join
    w_assign = Window.partitionBy("vec_id").orderBy("d2", "cid")
    assign = (
        # bounded: cents is the k-row centroid table
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "cid", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )
    corpus = assign.filter(F.col("vec_id") >= 4)
    q = corpus.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cid"
    )
    from ..operators.similarity import cosine

    # bounded: q is the fixed query set (8 vectors)
    cand = corpus.join(F.broadcast(q), "cid").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    # total-order: ties agree on every returned column (the score and
    # the trailing id ARE the output row) — rank swaps between
    # indistinguishable rows leave the multiset, and any top-k cut of
    # it, unchanged
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


@register(
    "embedding_norms_map_in_arrow",
    oracle=f"""
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 4) AS l2_norm,
           label
    FROM ({S.wf_embeddings_sql()})
    """,
    tags=("udf", "arrow", "similarity"),
)
def embedding_norms_map_in_arrow(spark, sf_dir):
    """``mapInArrow`` coverage (the zero-copy sibling of
    ``mapInPandas``): L2 norms computed straight from the Arrow list
    buffers — flat values + offsets → one vectorized
    ``np.add.reduceat`` per batch, no pandas conversion, no per-row
    Python.  Same contract as the JVM-side ``embedding_norms``
    (``F.aggregate`` fold), which remains the preferred form; this
    entry exists because real pipelines drop to Arrow batches when the
    per-element op ISN'T expressible in SQL (learned scorers, codecs),
    and the batch-shape plumbing is what needs proving.
    """
    import numpy as np
    import pyarrow as pa

    def norms(batches):
        for b in batches:
            col = b.column(b.schema.get_field_index("embedding"))
            if isinstance(col, pa.ChunkedArray):  # single-chunk per batch
                col = col.combine_chunks()
            flat = np.asarray(col.values, dtype=np.float64)
            offs = np.asarray(col.offsets, dtype=np.int64)
            sq = flat * flat
            sums = np.add.reduceat(sq, offs[:-1])
            sums[offs[:-1] == offs[1:]] = 0.0  # empty lists
            def plain(name, typ):
                # decode any dictionary encoding — the Arrow eval path
                # reads the declared schema's physical layout verbatim
                c = b.column(b.schema.get_field_index(name))
                if isinstance(c, pa.ChunkedArray):
                    c = c.combine_chunks()
                if pa.types.is_dictionary(c.type):
                    c = c.dictionary_decode()
                return c.cast(typ)

            yield pa.RecordBatch.from_arrays(
                [
                    plain("vec_id", pa.int64()),
                    pa.array(np.round(np.sqrt(sums), 4),
                             type=pa.float64()),
                    plain("label", pa.string()),
                ],
                names=["vec_id", "l2_norm", "label"],
            )

    from ..operators.similarity import finite_vectors

    # well-formedness contract BEFORE the Arrow pass: the np path
    # (values+offsets reduceat) would silently mis-sum NULL components
    # and ragged lists the JVM-side contract excludes
    e = finite_vectors(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding", "label")
    return e.mapInArrow(norms, "vec_id long, l2_norm double, label string")


@register(
    "pandas_udf_scalar_iter",
    oracle="""
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
    """,
    tags=("udf", "pandas_udf", "text"),
)
def pandas_udf_scalar_iter(spark, sf_dir):
    """ITERATOR-form pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``) — the variant that amortizes per-partition
    setup (model load, tokenizer init) ONCE across all Arrow batches
    instead of per batch: exactly the shape a real tokenizer/inference
    UDF needs.  Here the "expensive init" is a compiled regex; the
    per-batch work is vectorized pandas.  The oracle is the plain
    whitespace token count — init amortization must not change the
    answer.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def tok_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import re

        splitter = re.compile(r" ")  # stands in for tokenizer init
        for s in batches:
            # None-safe: NULL text -> NULL count (SUM skips it in both
            # engines; found by scripts/fuzz_oracle.py)
            yield s.map(lambda t: None if t is None
                        else len(splitter.split(t)))

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", tok_count("text").alias("k"))
        .groupBy("lang").agg(F.sum("k").alias("n_tokens"))
    )


@register(
    "grouped_pandas_linear_fit",
    # the oracle spells out the SAME two-pass centered algebra the
    # pandas body computes, instead of DuckDB's one-pass regr_slope /
    # regr_intercept co-moment recurrences: the two algorithms agree
    # only to ~1e-9 RELATIVE error, and an ill-conditioned fit (two
    # points a fractional second apart -> |slope| ~ 1e5; seed-15
    # --dupkeys --dates roll) pushes that disagreement past the
    # fixed-decimal ROUND.  With identical algebra the remaining
    # difference is summation order (numpy pairwise vs sequential) on
    # CENTERED terms — no cancellation amplification.  A zero-variance
    # or pair-less group is NULL on both engines.
    oracle="""
    WITH fin AS (
      SELECT event_type,
             (epoch(ts) - epoch(TIMESTAMP '2024-01-01')) / 3600.0 AS x,
             value AS y
      FROM events
      WHERE value IS NULL OR isfinite(value)
    ), m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             AVG(x) FILTER (WHERE x IS NOT NULL AND y IS NOT NULL) AS mx,
             AVG(y) FILTER (WHERE x IS NOT NULL AND y IS NOT NULL) AS my
      FROM fin GROUP BY event_type
    ), s AS (
      -- IS NOT DISTINCT FROM: event_type is a NULLABLE group key and
      -- Spark's groupBy treats the NULL group as ordinary — a plain
      -- equi-join would silently drop its fit (--nan --nullkeys)
      SELECT f.event_type,
             SUM((f.x - m.mx) * (f.y - m.my)) AS cov,
             SUM((f.x - m.mx) * (f.x - m.mx)) AS var
      FROM fin f JOIN m ON f.event_type IS NOT DISTINCT FROM m.event_type
      WHERE f.x IS NOT NULL AND f.y IS NOT NULL
      GROUP BY f.event_type
    )
    SELECT m.event_type, m.n,
           ROUND(CASE WHEN s.var = 0 THEN NULL
                      ELSE s.cov / s.var END, 4) + 0 AS slope,
           ROUND(CASE WHEN s.var = 0 THEN NULL
                      ELSE m.my - (s.cov / s.var) * m.mx END, 2) + 0
             AS intercept
    FROM m LEFT JOIN s ON m.event_type IS NOT DISTINCT FROM s.event_type
    """,
    tags=("udf", "pandas", "stats"),
)
def grouped_pandas_linear_fit(spark, sf_dir):
    """Per-group OLS fit (value ~ hours-since-2024-01-01; rebased so
    the regressor mean is O(100), keeping intercept = my - slope*mx
    float-stable to the rounded digit across engines) via
    ``applyInPandas`` — the grouped-ML API path — checked for EXACT
    parity against an oracle that spells out the SAME two-pass
    centered algebra (slope = cov/var on centered sums; since r15 —
    DuckDB's one-pass ``regr_slope`` recurrence agrees with the
    two-pass form only to ~1e-9 relative, which an ill-conditioned
    fit pushes past the fixed-decimal ROUND).  The Python path is
    graded to the digit, not just "runs": the pattern to copy when a
    per-group scikit-style fit must stay auditable against SQL.  ``+ 0`` / ``+ 0.0`` normalizes a rounded ``-0.0``
    to ``+0.0`` in both engines (near-zero slopes land there).
    The regressor is ``cast(ts as double)`` — FRACTIONAL epoch
    seconds, matching DuckDB's ``epoch(ts)`` exactly; Spark's
    ``unix_timestamp`` truncates to whole seconds and would fit a
    different x vector (every fixture ts is sub-second), leaving
    parity to rounding luck.

    Scale: one shuffle on the group key; each group's fit is a single
    Arrow batch in one Python worker — fine while every group fits in
    memory (event types here; for billions-per-group, use the
    algebraic ``regr_*``/``linear_regression_aggs`` form instead,
    which never materializes a group).
    """
    ev = load_table(spark, sf_dir, "events")
    # finite-measure contract (FUZZ.md --nan sweep): pandas' NaN-skip
    # and ±Inf arithmetic diverge from regr_* moment handling — drop
    # non-finite on both sides, keep NULLs (regr skips null pairs)
    ev = ev.filter(F.col("value").isNull()
                   | (~F.isnan("value")
                      & (F.abs("value") != F.lit(float("inf")))))
    ev = ev.select(
        "event_type",
        ((F.col("ts").cast("double")
          - F.lit("2024-01-01").cast("timestamp").cast("double"))
         / 3600.0).alias("x"),
        F.col("value").alias("y"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        n = len(pdf)                      # COUNT(*) — all rows
        # the OLS fits over complete (x, y) PAIRS only; pandas'
        # NaN-skipping .sum() would otherwise mix all-x variance with
        # non-null-y covariance (fuzz_oracle.py)
        fitp = pdf.dropna(subset=["x", "y"])
        x, y = fitp["x"], fitp["y"]
        # a pair-less or zero-variance group has no defined fit: NULL
        # on both engines (the oracle's CASE WHEN var = 0 / missing-s
        # row; found latent by the seed-15 roll's degenerate draws —
        # pandas 0/0 would yield NaN-vs-NULL, c/0 inf-vs-NULL)
        if len(fitp) == 0:
            return pd.DataFrame({"event_type": [pdf["event_type"].iloc[0]],
                                 "n": [n], "slope": [None],
                                 "intercept": [None]})
        mx, my = x.mean(), y.mean()
        cov = ((x - mx) * (y - my)).sum()
        var = ((x - mx) ** 2).sum()
        if var == 0:
            return pd.DataFrame({"event_type": [pdf["event_type"].iloc[0]],
                                 "n": [n], "slope": [None],
                                 "intercept": [None]})
        slope = cov / var

        # HALF-AWAY rounding, not Python's banker's round(): DuckDB's
        # ROUND ties away from zero, and a 2-point fit over the fuzz
        # mutation grid lands slope EXACTLY on a half boundary
        # (-1.53125 → banker's -1.5312 vs DuckDB -1.5313; caught by
        # the --malformed --dupkeys seed-2 sweep).  The half-away test
        # compares the exact fractional part of the PRODUCT (frac is
        # exact for |x| < 2^52: floor(x) and x share a binade), which
        # is std::round semantics — the same thing DuckDB applies to
        # value*10^nd — WITHOUT the floor(x + 0.5) binary-carry
        # artifact on doubles just below a .5 boundary (ADVICE r14).
        # Decimal(repr(v)).quantize(ROUND_HALF_UP) was rejected: true
        # decimal half-up DIVERGES from DuckDB's double-product path
        # (ROUND(2.675, 2) is 2.67 in DuckDB, 2.68 in Decimal).
        def rnd(v, nd):
            if v != v or math.isinf(v):
                return v
            x = abs(v) * 10.0 ** nd
            fx = math.floor(x)
            if x - fx >= 0.5:
                fx += 1.0
            return math.copysign(fx, v) / 10.0 ** nd

        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [n],
                "slope": [rnd(slope, 4) + 0.0],
                "intercept": [rnd(my - slope * mx, 2) + 0.0],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        fit, "event_type string, n long, slope double, intercept double"
    )


@register(
    "python_udtf_polymorphic_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, tok, COUNT(*) AS n
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
            FROM documents WHERE doc_id < 50)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT doc_id, tok,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY n DESC, tok) AS rk
      FROM tok
    )
    SELECT doc_id,
           MAX(CASE WHEN rk = 1 THEN tok END) AS top_1,
           MAX(CASE WHEN rk = 2 THEN tok END) AS top_2,
           MAX(CASE WHEN rk = 3 THEN tok END) AS top_3
    FROM ranked GROUP BY doc_id
    """,
    tags=("udf", "udtf", "spark4"),
    unique_docs_guard=True,
)
def python_udtf_polymorphic_topk(spark, sf_dir):
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()`` API): the output
    schema is computed at plan time from the constant ``k`` argument —
    ``top_tokens(doc_id, text, 3)`` materializes columns
    ``top_1..top_3``; call it with 5 and you get five, no code change.
    The static-schema UDTF (``python_udtf_chunks``) can't express
    this; ``analyze`` is the hook for table functions whose shape
    depends on their arguments.  Per-doc top tokens use (-count,
    token) ordering so the result is deterministic and the SQL
    pivot oracle reproduces it exactly.

    Scale: the UDTF is a map-side generator over each doc (Arrow
    batches, one Python worker per task) — no shuffle at all; the
    heavy version of this op (corpus-level term stats) is
    ``term_frequency_top20``.
    """
    from collections import Counter

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class TopTokens:
        @staticmethod
        def analyze(doc_id: AnalyzeArgument, text: AnalyzeArgument,
                    k: AnalyzeArgument) -> AnalyzeResult:
            st = StructType().add("doc_id", LongType())
            for i in range(k.value):
                st = st.add(f"top_{i + 1}", StringType())
            return AnalyzeResult(st)

        def eval(self, doc_id: int, text: str, k: int):
            if text is None:       # NULL text: no token rows -> the
                return             # doc is absent in BOTH engines
            counts = Counter(text.split(" "))
            top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            vals = [t for t, _ in top] + [None] * (k - len(top))
            yield (doc_id, *vals)

    d = unique_documents(load_table(spark, sf_dir, "documents")).filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("_udtf_topk_docs")
    spark.udtf.register("top_tokens", TopTokens)
    return spark.sql(
        "SELECT c.* FROM _udtf_topk_docs d, "
        "LATERAL top_tokens(d.doc_id, d.text, 3) c"
    )
