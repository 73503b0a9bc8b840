"""Executed-plan metrics harvest (observability for A3/K7/K8).

`observe()` counts rows at chosen points; this module reads what the
engine already measured everywhere else: per-operator SQLMetrics from
the FINAL adaptive plan — output rows, shuffle bytes/records, spill,
peak memory — after an action has run on the DataFrame. That is the
run-log payload a 100 TB operator actually wants ("how many bytes did
the nightly join shuffle?") and it costs nothing: the metrics are
accumulator values the executors populated during the run.

Works on the classic (JVM-local) DataFrame API: the plan tree is
walked through AQE wrappers (AdaptiveSparkPlanExec -> executedPlan,
QueryStageExec -> plan) so metrics come from the plan that actually
executed, not the pre-AQE sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["plan_metrics", "shuffle_summary"]


def _unwrap(node):
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        return _unwrap(node.executedPlan())
    if cls.endswith("QueryStageExec"):
        return _unwrap(node.plan())
    return node


def _walk(node, depth, out):
    node = _unwrap(node)
    ms = node.metrics()
    it = ms.iterator()
    vals = {}
    while it.hasNext():
        kv = it.next()
        # keep zeros: numOutputRows == 0 is a real measurement, and
        # dropping it would make the root-row heuristic in
        # shuffle_summary fall through to a deeper operator
        vals[kv._1()] = int(kv._2().value())
    out.append({"op": node.nodeName(), "depth": depth, "metrics": vals})
    for i in range(node.children().length()):
        _walk(node.children().apply(i), depth + 1, out)


def plan_metrics(df: DataFrame) -> list[dict]:
    """Per-operator metrics of ``df``'s executed plan, preorder with
    depth. Run an action on THE SAME DataFrame first (collect/write);
    a fresh logically-equal DataFrame has fresh zero accumulators."""
    out: list[dict] = []
    _walk(df._jdf.queryExecution().executedPlan(), 0, out)
    return out


def shuffle_summary(df: DataFrame) -> dict[str, int]:
    """The run-log rollup: total shuffle bytes/records written, rows
    out of the root operator, peak single-operator memory, spill bytes.
    Integer dict — feeds sinks.ops.append_run_log directly."""
    ops = plan_metrics(df)
    total = {
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "spill_bytes": 0,
        "peak_operator_memory": 0,
        "root_output_rows": 0,
    }
    for o in ops:
        m = o["metrics"]
        total["shuffle_bytes_written"] += m.get("shuffleBytesWritten", 0)
        total["shuffle_records_written"] += m.get("shuffleRecordsWritten", 0)
        total["spill_bytes"] += m.get("spillSize", 0) + m.get("diskBytesSpilled", 0)
        total["peak_operator_memory"] = max(
            total["peak_operator_memory"], m.get("peakMemory", 0)
        )
    for o in ops:  # first operator with an output-rows metric = the root
        if "numOutputRows" in o["metrics"]:
            total["root_output_rows"] = o["metrics"]["numOutputRows"]
            break
    return total
