"""Per-query execution metrics (engine-grade observability).

The reference logs listing/split timings around its pipeline
(reference ``src/Split/parquet-splitter.py:124-132``); the engine-grade
equivalent is the executed plan's SQLMetrics: input rows, shuffle bytes,
spills, per-operator row counts.  ``run_with_metrics`` executes a
DataFrame and harvests every operator's metrics from the (AQE-final)
physical plan, so a pipeline can assert/ship "how much did this query
read and shuffle" without a metrics server.

All driver-side, metadata-sized — no extra job runs and nothing is
collected from executors beyond what Spark already aggregates.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def _children(node) -> list:
    """Children of a JVM SparkPlan node; AQE wrapper nodes expose their
    executed inner plan instead of plan children."""
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return [node.executedPlan()]
    if name in ("QueryStage", "ShuffleQueryStage", "BroadcastQueryStage",
                "TableCacheQueryStage", "ResultQueryStage"):
        return [node.plan()]
    out = []
    it = node.children().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def plan_metrics(df: DataFrame) -> list[dict[str, Any]]:
    """One dict per physical operator: node name + its SQLMetric values
    (call after an action so AQE stages and metrics are final)."""
    plan = df._jdf.queryExecution().executedPlan()
    out = []
    for node in _walk(plan):
        metrics: dict[str, int] = {}
        it = node.metrics().iterator()
        while it.hasNext():
            entry = it.next()
            metrics[entry._1()] = entry._2().value()
        out.append({"node": node.nodeName(), "metrics": metrics})
    return out


def _sum_metric(nodes: list[dict], *metrics: str, node_contains: str | None = None) -> int:
    """Sum a metric over matching nodes.  When several alias names are
    given (different Spark scan operators expose different names for the
    same quantity), only the FIRST name present on each node counts, so
    an operator exposing both aliases is not double-counted."""
    total = 0
    for n in nodes:
        if node_contains is not None and node_contains not in n["node"]:
            continue
        for m in metrics:
            if m in n["metrics"]:
                total += n["metrics"][m]
                break
    return total


def _spill_bytes(nodes: list[dict]) -> int:
    """Per-node spill: ``spillSize`` where exposed, else the
    memory+disk pair — an operator exposing both forms is not
    double-counted."""
    total = 0
    for n in nodes:
        m = n["metrics"]
        if "spillSize" in m:
            total += m["spillSize"]
        else:
            total += m.get("memoryBytesSpilled", 0) + m.get("diskBytesSpilled", 0)
    return total


def run_with_metrics(df: DataFrame) -> tuple[list, dict[str, int]]:
    """Execute ``df`` and return (rows, summary metrics).

    Summary keys: ``output_rows`` (result size), ``scan_output_rows``
    (rows produced by file scans — input volume after pushdown),
    ``scan_files_read`` / ``scan_bytes_read`` (file-source metrics),
    ``shuffle_records_written`` / ``shuffle_bytes_written`` (exchange
    traffic — the number to watch at 100 TB), ``spill_bytes``
    (memory+disk spills; non-zero means partitions outgrew executors).
    """
    rows = df.collect()
    nodes = plan_metrics(df)
    summary = {
        "output_rows": len(rows),
        "scan_output_rows": _sum_metric(nodes, "numOutputRows", node_contains="Scan"),
        "scan_files_read": _sum_metric(nodes, "filesNum", "numFiles", node_contains="Scan"),
        "scan_bytes_read": _sum_metric(nodes, "filesSize", "bytesRead", node_contains="Scan"),
        "shuffle_records_written": _sum_metric(nodes, "shuffleRecordsWritten"),
        "shuffle_bytes_written": _sum_metric(nodes, "shuffleBytesWritten"),
        # per node: spillSize (sort/agg) is an alias for the same spill
        # the memory/disk pair reports — take whichever form the node
        # exposes, never both (the pair itself sums: memory+disk are
        # complementary halves, not aliases of each other)
        "spill_bytes": _spill_bytes(nodes),
    }
    return rows, summary


def metrics_df(spark, df: DataFrame):
    """Operator-level metrics as a DataFrame (join-able into a metrics
    pipeline / writable to a sink like any other table)."""
    rows, _ = run_with_metrics(df)  # ensure executed
    nodes = plan_metrics(df)
    flat = [
        (i, n["node"], k, int(v))
        for i, n in enumerate(nodes)
        for k, v in n["metrics"].items()
    ]
    return spark.createDataFrame(
        flat, "op_id: int, node: string, metric: string, value: long"
    )
