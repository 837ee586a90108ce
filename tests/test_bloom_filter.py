"""Runtime Bloom-filter join pruning: with a selective dim filter, the
optimizer builds a Bloom filter from the surviving keys and pushes a
might_contain() predicate into the fact scan — fact rows drop before
the shuffle.  Default thresholds target 10 GiB+ app sides, so the test
lowers them (and disables broadcast, which would bypass the shuffle
join) to exercise the rewrite at fixture scale."""

import pytest
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.catalog import load_table
from glue_parquet_splitter_spark.plans import physical_plan

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture
def bloom_confs(spark):
    old = {k: spark.conf.get(k) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


def test_bloom_filter_injected_and_answer_unchanged(spark, sf_dir, bloom_confs):
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_items"))
    )
    with_bloom = {(r.l_returnflag, r.n_items) for r in j.collect()}
    plan = physical_plan(j)
    assert "might_contain" in plan, "runtime bloom filter was not injected"
    assert "bloom_filter_agg" in plan

    # the filter prunes, never changes the answer
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        plain = {(r.l_returnflag, r.n_items) for r in j.collect()}
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_bloom == plain
