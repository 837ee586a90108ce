"""Cross-query consistency of the round-10 audit family: each audit
must agree with the operator it audits — properties no single-query
oracle can check.
"""

from pyspark.sql import functions as F

from glue_parquet_splitter_spark.queries import load_all_modules

REG = load_all_modules()


def test_band_tuning_candidates_are_nested(spark, sf_dir):
    """A pair matching at rows-per-band r necessarily matches at any
    smaller r (its bands are refinements), so candidate counts must be
    monotone: 8x1 >= 4x2 >= 2x4 >= 1x8."""
    rows = {r["rows_per_band"]: r["n_candidates"]
            for r in REG["lsh_band_tuning_audit"].fn(spark, sf_dir)
            .collect()}
    assert rows[1] >= rows[2] >= rows[4] >= rows[8]
    # and the 4x2 arm IS the production banding: equals the registry's
    # candidate query row count
    n_prod = REG["minhash_lsh_candidates"].fn(spark, sf_dir).count()
    assert rows[2] == n_prod


def test_leaderboard_agrees_with_funnel(spark, sf_dir):
    """source_quality_leaderboard and curation_funnel_v2 share signal
    CTEs; their per-source numbers must reconcile exactly:
    n_docs == n_raw and dup_rate * n_docs == n_raw - n_after_dedup."""
    lead = {r["source"]: r for r in
            REG["source_quality_leaderboard"].fn(spark, sf_dir).collect()}
    fun = {r["source"]: r for r in
           REG["curation_funnel_v2"].fn(spark, sf_dir).collect()}
    assert set(lead) == set(fun)
    for s in lead:
        assert lead[s]["n_docs"] == fun[s]["n_raw"]
        n_dup = fun[s]["n_raw"] - fun[s]["n_after_dedup"]
        assert round(lead[s]["dup_rate"] * lead[s]["n_docs"]) == n_dup


def test_mix_manifest_respects_quotas(spark, sf_dir):
    """training_mix_manifest ships exactly min(quota, n_docs) docs per
    source, where quota is shard_quota_largest_remainder's number with
    B scaled identically."""
    quota = {r["source"]: r for r in
             REG["shard_quota_largest_remainder"].fn(spark, sf_dir)
             .collect()}
    manifest = (REG["training_mix_manifest"].fn(spark, sf_dir)
                .groupBy("source").agg(F.count("*").alias("n"))
                .collect())
    got = {r["source"]: r["n"] for r in manifest}
    for s, q in quota.items():
        assert got.get(s, 0) == min(q["quota"], q["n_docs"]), s


def test_skew_audit_implied_pairs_bound_actual(spark, sf_dir):
    """The skew audit's implied pair total (sum over buckets of
    c*(c-1)/2, summed across bands) upper-bounds the DISTINCT
    candidate count (bands can rediscover the same pair)."""
    implied = sum(r["implied_pairs"] for r in
                  REG["lsh_bucket_skew_audit"].fn(spark, sf_dir)
                  .collect())
    actual = REG["minhash_lsh_candidates"].fn(spark, sf_dir).count()
    assert implied >= actual
