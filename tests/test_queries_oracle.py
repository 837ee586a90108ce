"""Every registered query must match its DuckDB oracle at sf0.001.

This is the local replica of the driver's t2 gate (run it at sf0.01
via scripts/check_queries.py before shipping).
"""

import pytest

from glue_parquet_splitter_spark.oracle import run_one
from glue_parquet_splitter_spark.queries import load_all_modules

REGISTRY = load_all_modules()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    ok, msg = run_one(spark, sf_dir, name)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
