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
