"""Warehouse-op semantics the oracle hash alone can't pin down:
MERGE branch coverage (an oracle sharing a three-valued-logic bug
would still hash-match) and profile shape."""

from glue_parquet_splitter_spark.queries import load_all_modules

REG = load_all_modules()


def test_merge_exercises_every_branch_and_keeps_base(spark, sf_dir):
    out = REG["merge_upsert_apply"].fn(spark, sf_dir).collect()
    actions = {r.merge_action for r in out}
    assert actions == {"kept", "updated", "inserted"}

    base_keys = {
        r.o_orderkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey").collect()
        if r.o_orderkey % 4 != 3
    }
    kept_or_updated = {r.o_orderkey for r in out if r.merge_action != "inserted"}
    deleted = {k for k in base_keys if k % 3 == 0 and k % 9 == 0}
    # every base row survives except matched deletes — the three-valued
    # logic regression (NULL op dropping unchanged rows) would fail here
    assert kept_or_updated == base_keys - deleted


def test_merge_inserts_only_new_keys(spark, sf_dir):
    out = REG["merge_upsert_apply"].fn(spark, sf_dir).collect()
    inserted = [r.o_orderkey for r in out if r.merge_action == "inserted"]
    assert inserted and all(k % 4 == 3 for k in inserted)


def test_dq_profile_rows(spark, sf_dir):
    rows = {r.col_name: r for r in REG["dq_profile_summary"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"}
    assert all(r.null_count == 0 for r in rows.values())
    assert rows["o_orderstatus"].distinct_count <= 3


def test_dp_noisy_counts_production_mode(spark, sf_dir):
    """The production form (VERDICT r9 #8) must publish ONLY the
    noised counts (no n_true / abs_noise leak) and must not be
    md5-seeded — two independent runs draw different noise."""
    from glue_parquet_splitter_spark.queries.governance_q import (
        dp_noisy_counts_impl,
    )

    prod = dp_noisy_counts_impl(spark, sf_dir, mode="production")
    assert prod.columns == ["segment", "n_noisy"]
    a = {r.segment: r.n_noisy for r in prod.collect()}
    b = {r.segment: r.n_noisy
         for r in dp_noisy_counts_impl(spark, sf_dir,
                                       mode="production").collect()}
    assert set(a) == set(b) and len(a) == 5
    assert a != b  # unseeded rand(): 5 identical Laplace draws ~ never

    import pytest as _pytest
    with _pytest.raises(ValueError):
        dp_noisy_counts_impl(spark, sf_dir, mode="debug")
