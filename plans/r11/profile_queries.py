"""Round-10 profiling harness (guide §1): split each catalog entry's
wall time into Python/py4j construction, analysis/optimization
(explain), and execution (noop sink), and snapshot the formatted plan
as the judge-checkable before/after artifact.

Usage: python plans/r10/profile_queries.py <sf_dir> <out_json> <plan_suffix> [only,csv]
Runs each query twice (warm, then timed) so codegen/JIT warmup does not
pollute the split.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1]
    out_json = sys.argv[2]
    suffix = sys.argv[3]
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    from pyspark.sql import DataFrame

    from sstable_migrator_spark.queries import QUERIES, flagship_ingest
    from sstable_migrator_spark.session import get_spark

    spark = get_spark(app_name="profile_r10")
    plan_dir = os.path.dirname(os.path.abspath(__file__))

    def _explain_str(df: DataFrame) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )

    cat = {"q00_flagship_ingest": flagship_ingest, **QUERIES}
    results: dict[str, dict] = {}
    for name, fn in cat.items():
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            # warm pass: codegen + any per-process fixture builds
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            plan = _explain_str(df)
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rec["build_s"] = round(t1 - t0, 4)
            rec["explain_s"] = round(t2 - t1, 4)
            rec["exec_s"] = round(t3 - t2, 4)
            rec["total_s"] = round(t3 - t0, 4)
            rec["n_exchange"] = len(re.findall(r"\bExchange\b", plan))
            rec["n_python"] = len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
            )
            rec["n_sort"] = len(re.findall(r"\bSort\b", plan))
            rec["n_smj"] = len(re.findall(r"SortMergeJoin", plan))
            rec["n_bhj"] = len(re.findall(r"BroadcastHashJoin", plan))
            rec["n_bnlj"] = len(re.findall(r"BroadcastNestedLoopJoin", plan))
            rec["plan_chars"] = len(plan)
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
        except Exception as e:  # noqa: BLE001
            rec["error"] = repr(e)[:300]
        results[name] = rec

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"profiled {len(results)} queries -> {out_json}")


if __name__ == "__main__":
    main()
