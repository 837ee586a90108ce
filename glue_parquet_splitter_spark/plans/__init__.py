"""Plan-inspection utilities (used by the plan-shape tests and
scripts/gen_plans_md.py): the feedback loop for keeping every operator
on the physical plan you'd want at 100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The (possibly adaptive) executed-plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`.explain('formatted')` as a string."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def final_plan(df: DataFrame) -> str:
    """Execute, then return the AQE-final plan (codegen ids, skew and
    coalesce markers only appear after execution)."""
    df.collect()
    return physical_plan(df)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The scan's PushedFilters clause (to end-of-line — filters like
    ``In(a, [1, 2])`` contain brackets, so no bracket matching)."""
    plan = physical_plan(df)
    i = plan.find("PushedFilters: [")
    if i < 0:
        return ""
    end = plan.find("\n", i)
    return plan[i:end if end > 0 else len(plan)]


__all__ = ["physical_plan", "formatted_plan", "final_plan",
           "uses_broadcast_join", "pushed_filters"]
