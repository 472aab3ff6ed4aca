"""Core-count scaling proof at sf1 (round-18, VERDICT r17 #5).

The driver's own 8-vs-32-core comparison runs at sf0.1, where the
median query is < 1 s and job-launch/scheduling dominates — the r17
measurement found a median c8/c32 ratio of 0.98, i.e. the bench SF
cannot demonstrate parallel scale-out at all. This probe runs the
data-heaviest queries on the 10x disjoint-shard sf1 dataset
(scaling_probe_sf1.build_sf1 — reused when the generator marker
matches) at the core count given by $SPARK_GRAFT_CPUS and prints one
JSON line, so two invocations (8 and 32) document whether the PLANS
actually parallelize once there is enough data per stage.

Run (two fresh processes — the master string is fixed per JVM):

    SPARK_GRAFT_CPUS=32 python scripts/scaling_cores_sf1.py
    SPARK_GRAFT_CPUS=8  python scripts/scaling_cores_sf1.py

Results are recorded in BASELINE.md (round-18 core-scaling block).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# The 3 data-heaviest suite queries by sf1 work volume (VERDICT r17
# #5 names exactly these): shingle-shuffle dedup, banded minhash, and
# the degree-oriented triangle count.
QUERIES = ["pipeline_training_corpus_v2", "dedup_minhash_sql", "graph_triangle_count"]


def main() -> int:
    from scaling_probe_sf1 import DST, build_sf1  # sibling module

    from hello_flink_spark.registry import all_specs
    from hello_flink_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scaling-cores-sf1")

    from pyspark.sql import functions as F

    noop = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).select(noop("id").alias("id")).collect()
    build_sf1(spark, reuse=True)

    specs = all_specs()
    # warm-up: one untimed pass per query (page cache, codegen)
    for name in QUERIES:
        specs[name].fn(spark, DST).collect()
    timings = {}
    for name in QUERIES:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            specs[name].fn(spark, DST).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        print(f"cpus={cpus} {name}: {timings[name]:.3f}s", flush=True)
    print(json.dumps({"cpus": int(cpus), "sf_dir": DST, "queries": timings}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
