"""Multi-probe hybrid retrieval (VERDICT r11 #6): the probes=2
semantic candidate set must STRICTLY contain the probes=1 set (the
second inverted list adds candidates, never replaces them), and the
registered query's p1_overlap_at_50 column must be a single value in
(0, 1]."""

import pyspark.sql.functions as F
import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _cand_ids(spark, sf_dir, probes):
    from glue_parquet_splitter_spark.queries.ranking_q import (
        _hybrid_ivf_parts,
    )

    return {r.vec_id for r in _hybrid_ivf_parts(spark, sf_dir, probes)
            .select("vec_id").collect()}


def test_probe2_candidates_strictly_contain_probe1(spark, sf_dir):
    p1 = _cand_ids(spark, sf_dir, 1)
    p2 = _cand_ids(spark, sf_dir, 2)
    assert p1 < p2, (len(p1), len(p2))  # strict subset
    # the second probe is exactly one more inverted list: candidates
    # added, none removed, and the addition is non-empty
    assert len(p2) > len(p1) > 0


def test_probe_rank_partitions_candidates(spark, sf_dir):
    """Every probes=2 candidate carries probe_rank 1 or 2, and the
    rank-1 slice IS the probes=1 candidate set."""
    from glue_parquet_splitter_spark.queries.ranking_q import (
        _hybrid_ivf_parts,
    )

    cand = _hybrid_ivf_parts(spark, sf_dir, 2).select(
        "vec_id", "probe_rank")
    ranks = {r.probe_rank for r in cand.select("probe_rank")
             .distinct().collect()}
    assert ranks == {1, 2}
    p1_slice = {r.vec_id for r in
                cand.filter(F.col("probe_rank") == 1).collect()}
    assert p1_slice == _cand_ids(spark, sf_dir, 1)


def test_overlap_column_is_scalar_fraction(spark, sf_dir):
    from glue_parquet_splitter_spark.queries import load_all_modules

    reg = load_all_modules()
    rows = reg["hybrid_rrf_fusion_ivf_mp"].fn(spark, sf_dir).collect()
    vals = {r.p1_overlap_at_50 for r in rows}
    assert len(vals) == 1  # one in-query scalar, constant across rows
    (v,) = vals
    assert 0.0 < v <= 1.0
