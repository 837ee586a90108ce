"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``glue_parquet_splitter_spark.queries``
(one registered QuerySpec per implemented operator, SURVEY.md §2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from glue_parquet_splitter_spark.queries import load_all_modules, ordered_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation
    (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region,
    broadcast dims, group-agg)."""
    reg = load_all_modules()
    return reg["q5_region_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries without a green row in any committed
    CORRECTNESS_r*.json come first — the driver grades a capped prefix,
    and rotation gets every query a hard correctness row across rounds.
    """
    reg = ordered_registry()
    return {name: spec.fn for name, spec in reg.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    reg = ordered_registry()
    return {name: spec.oracle for name, spec in reg.items() if spec.oracle is not None}
