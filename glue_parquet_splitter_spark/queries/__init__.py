"""Declared query registry.

Every operator the engine claims (SURVEY.md §2 + the north-star
extensions) registers here as a ``QuerySpec``: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, the
equivalent DuckDB oracle SQL.  ``__spark_entry__`` exposes this registry
to the verification driver.

Conventions (driver hash-compare is order-insensitive but name/value
exact):
- alias every computed column identically in Spark and SQL;
- round doubles (``F.round`` / ``ROUND``) before returning;
- never return raw timestamps — cast to DATE or format to string.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL over pre-registered views
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple = ()):  # decorator
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all_modules() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from . import relational  # noqa: F401
    from . import functions_q  # noqa: F401
    from . import window_q  # noqa: F401
    from . import events_q  # noqa: F401
    from . import dedup_q  # noqa: F401
    from . import similarity_q  # noqa: F401
    from . import text_q  # noqa: F401
    from . import multimodal_q  # noqa: F401
    from . import pipeline_q  # noqa: F401
    from . import advanced_q  # noqa: F401
    from . import tpch_q  # noqa: F401
    from . import scale_q  # noqa: F401
    from . import misc_q  # noqa: F401
    from . import udf_q  # noqa: F401
    from . import tpch2_q  # noqa: F401
    from . import analytics_q  # noqa: F401
    from . import tpch3_q  # noqa: F401
    from . import timeseries_q  # noqa: F401
    from . import misc2_q  # noqa: F401
    return REGISTRY
