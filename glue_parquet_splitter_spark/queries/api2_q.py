"""API-surface wave: the Spark 4 surfaces a reference user migrating a
modern pipeline expects — Arrow-native grouped UDFs (no pandas
conversion), SQL LATERAL correlated subqueries, and the relational
unpivot/melt — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import similarity as S
from . import register


@register(
    "arrow_grouped_centroid",
    oracle=f"""
    WITH wf AS ({S.wf_embeddings_sql()}),
    u AS (
      SELECT label, i, embedding[i] AS x
      FROM wf, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ), dims AS (
      SELECT label, i, AVG(x) AS m
      FROM u GROUP BY label, i
    )
    SELECT CAST(label AS INT) AS label,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM wf e
             WHERE e.label IS NOT DISTINCT FROM dims.label) AS n_vecs,
           ROUND(sqrt(SUM(m * m)), 3) AS centroid_norm
    FROM dims GROUP BY label
    """,
    tags=("udf", "arrow", "similarity"),
)
def arrow_grouped_centroid(spark, sf_dir):
    """Per-label embedding centroid via ``applyInArrow`` — the
    Arrow-NATIVE grouped UDF (Spark 4): each group arrives as a
    ``pyarrow.Table``, no pandas materialization, zero-copy into
    numpy.  Complements the pandas UDAF (``pandas_udaf_weighted_avg``)
    as the lower-overhead path for numeric batch math.

    Scale: one shuffle on ``label``; per-group work is a vectorized
    mean over the group's Arrow batch.  Output is one row per label.
    """
    import pyarrow as pa

    from ..operators.similarity import finite_vectors

    # well-formedness contract BEFORE the grouped Arrow pass: np.array
    # over a ragged/NULL-bearing group would silently build an object
    # array (or throw) — the contract excludes those rows identically
    # in both engines
    emb = finite_vectors(load_table(spark, sf_dir, "embeddings"))

    def centroid(table: pa.Table) -> pa.Table:
        import numpy as np

        vecs = np.array(table.column("embedding").to_pylist(),
                        dtype=np.float64)
        m = vecs.mean(axis=0)
        lab = table.column("label")[0].as_py()   # None-safe: the NULL
        #                                          label group is a real
        #                                          group in both engines
        return pa.table({
            "label": pa.array([None if lab is None else int(lab)],
                              type=pa.int32()),
            "n_vecs": pa.array([vecs.shape[0]], type=pa.int64()),
            "centroid_norm": pa.array(
                [round(float(np.sqrt((m * m).sum())), 3)],
                type=pa.float64()),
        })

    return (emb.groupBy("label")
            .applyInArrow(centroid,
                          schema="label int, n_vecs long, centroid_norm double"))


@register(
    "lateral_topn_per_nation",
    oracle="""
    SELECT n.n_name AS nation, t.c_custkey, ROUND(t.c_acctbal, 2) AS acctbal
    FROM nation n,
         LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                   WHERE c.c_nationkey = n.n_nationkey
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    """,
    tags=("relational", "lateral", "topk"),
)
def lateral_topn_per_nation(spark, sf_dir):
    """Correlated LATERAL subquery (SQL:2016, Spark 4 SQL): top-2
    customers by balance *per nation*, written the way an analyst
    migrating from Postgres/DuckDB writes it.  Catalyst de-correlates
    this into the same window-rank plan ``topk_per_group`` builds with
    the DataFrame API — the point is surface parity, same physical
    shape.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql("""
        SELECT n.n_name AS nation, t.c_custkey,
               ROUND(t.c_acctbal, 2) AS acctbal
        FROM v_nation n,
             LATERAL (SELECT c_custkey, c_acctbal FROM v_customer c
                       WHERE c.c_nationkey = n.n_nationkey
                       ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    """)


@register(
    "unpivot_revenue_components",
    oracle="""
    WITH melted AS (
      SELECT l_returnflag, 'gross' AS component,
             l_extendedprice AS amount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount',
             -l_extendedprice * l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'tax',
             l_extendedprice * (1 - l_discount) * l_tax FROM lineitem
    )
    SELECT l_returnflag, component,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(amount), 0) AS total
    FROM melted GROUP BY l_returnflag, component
    """,
    tags=("relational", "unpivot", "agg"),
)
def unpivot_revenue_components(spark, sf_dir):
    """Wide→long reshape with the native ``unpivot``/melt operator:
    three derived revenue components become (component, amount) rows,
    then a grouped rollup — the inverse of ``pivot_status``.

    Scale: unpivot is a map-side generator (rows×3, no shuffle); the
    only exchange is the final small-key aggregation.  Totals rounded
    to whole units: the three-way melt triples the float-sum
    population, so sub-unit digits are summation-order noise at any
    scale.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("gross"),
        (-F.col("l_extendedprice") * F.col("l_discount")).alias("discount"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax"))
        .alias("tax"),
    )
    melted = li.unpivot(
        ids=["l_returnflag"],
        values=["gross", "discount", "tax"],
        variableColumnName="component",
        valueColumnName="amount",
    )
    return melted.groupBy("l_returnflag", "component").agg(
        F.count("*").alias("n"),
        F.round(F.sum("amount"), 0).alias("total"),
    )
