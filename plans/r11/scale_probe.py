"""Round-11 scaling probe (VERDICT item 7): time data-bound catalog
entries against a 10x-replicated sf0.1 dataset (keys shifted per
replica so join cardinalities scale linearly) at the ambient
``SPARK_GRAFT_CPUS`` core count. Measurement-only — the dataset lives
in /tmp and feeds no oracle run and no bench number.

Usage: SPARK_GRAFT_CPUS=N python plans/r11/scale_probe.py <data_dir> <out_json>
"""

from __future__ import annotations

import json
import sys
import time


ENTRIES = [
    "q213_repetition_rules",
    "q208_domain_gate_report",
    "q182_ngram_lm_perplexity",
    "q231_ppl_threshold_sweep",
    "q156_boilerplate_removal",
    "q138_span_dedup",
    "q219_decontaminate_spans",
    "q127_pagerank_step",
    "q125_waiting_suppliers",
    "q113_big_orders",
    "q143_potential_promotion",
    "q187_corpus_report",
    "q253_lang_confusion",
    "q78_paragraph_dedup",
]


def main() -> None:
    data_dir, out_json = sys.argv[1], sys.argv[2]
    from sstable_migrator_spark.queries import QUERIES
    from sstable_migrator_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict = {"cpus": spark.sparkContext.defaultParallelism}
    for name in ENTRIES:
        fn = QUERIES[name]
        try:
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            reps = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, data_dir).write.format("noop").mode("overwrite").save()
                reps.append(round(time.perf_counter() - t0, 3))
            out[name] = min(reps)
        except Exception as e:  # noqa: BLE001
            out[name] = f"error: {e!r}"[:120]
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
