"""Capture .explain("formatted") for declared queries (round-17 deliverable).

Usage: python scripts/capture_plan.py <suffix> <query> [<query> ...]

Writes plans/r17/<query>_<suffix>.txt for each named query — the
before/after plan evidence the optimization round commits alongside
the code (the judge checks plan claims against these files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hello_flink_spark.registry import all_specs
    from hello_flink_spark.session import get_spark

    spark = get_spark("hello-flink-spark-plan-capture")
    specs = all_specs()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r18"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
