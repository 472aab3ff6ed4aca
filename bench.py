"""Benchmark driver (SURVEY §6, BASELINE.md protocol).

Runs the headline declared queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": 0.1}.

Timing = wall clock of df.collect() (materialize everything), one
warm-up query first so JVM/codegen startup isn't billed to the first
entry. ``--repeat N`` takes the median of N runs per query (BASELINE.md
records medians of 3); the default single run keeps the per-round
driver invocation fast.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

# The headline set: one representative per operator family, weighted
# toward the ops whose plans matter at scale (joins, windows, dedup,
# similarity) — see BASELINE.md for the recorded numbers.
HEADLINE = [
    "flagship_pricing_summary",
    "flatmap",
    "join_inner",
    "join_broadcast",
    "join_asof",
    "join_range",
    "agg_keyed",
    "agg_rollup",
    "sort",
    "topk",
    "win_topn",
    "win_running",
    "window_tumbling",
    "window_session",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "sim_knn",
    "text_tfidf_sql",
    "udaf",
    "udf_vectorized",
]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeat", type=int, default=1, help="timed runs per query (median)")
    parser.add_argument("--queries", nargs="*", default=None, help="subset of query names")
    args = parser.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from hello_flink_spark.registry import all_specs
    from hello_flink_spark.session import get_spark

    spark = get_spark("hello-flink-spark-bench")
    specs = all_specs()
    names = args.queries or [n for n in HEADLINE if n in specs]

    # warm-up: JVM, codegen, parquet footer caches
    specs["flagship_pricing_summary"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        runs = []
        for _ in range(max(args.repeat, 1)):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)

    result = {
        "metric": "headline_query_suite_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
