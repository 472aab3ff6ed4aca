"""Generate docs/PLANS.md — a physical-plan feature report for the
bench headline queries: which join strategies Catalyst picked, how
many shuffle exchanges the plan carries, how wide whole-stage codegen
fused, and whether scan pushdown engaged. Run after plan-affecting
changes: python scripts/gen_plan_report.py
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

JOIN_KINDS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def main() -> None:
    from bench import HEADLINE
    from hello_flink_spark.registry import all_specs
    from hello_flink_spark.session import get_spark

    spark = get_spark("plan-report")
    specs = all_specs()
    sf_dir = "/root/testdata/sf0.01"

    lines = [
        "# Physical-plan report (generated — scripts/gen_plan_report.py)",
        "",
        "Catalyst's executed-plan features for every bench headline query",
        "at sf0.01. Joins column lists the join strategies in the plan;",
        "`exch` counts shuffle Exchanges (map-side-combined hash",
        "aggregations add two plan nodes but one shuffle each); `wsc` is",
        "the number of WholeStageCodegen spans (fused pipelines);",
        "pushdown marks a non-empty PushedFilters or PartitionFilters on",
        "a scan.",
        "",
        "| query | joins | exch | wsc | pushdown |",
        "|---|---|---|---|---|",
    ]
    # headline queries + the late-round additions worth plan evidence
    extra = ["dim_scd2_build", "cep3_pattern_batch", "text_decontaminate",
             "subquery_correlated", "scan_dynamic_pruned",
             "flagship_regional_revenue", "join_bucketed"]
    for name in HEADLINE + [e for e in extra if e in specs]:
        df = specs[name].fn(spark, sf_dir)
        df.collect()  # materialize so AQE finalizes and codegen stages exist
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AQE's toString renders Final Plan then Initial Plan — keep the
        # first section only so features aren't double-counted.
        plan = plan.split("== Initial Plan ==")[0]
        joins = Counter()
        for kind in JOIN_KINDS:
            hits = len(re.findall(kind, plan))
            if hits:
                joins[kind] = hits
        join_desc = ", ".join(f"{k}x{v}" if v > 1 else k for k, v in joins.items()) or "—"
        n_exch = len(re.findall(r"Exchange (?:hash|range|single)partitioning", plan))
        # codegen spans render as "*(n) Operator" in executedPlan toString
        n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
        pushed = bool(
            re.search(r"PushedFilters: \[[^\]]", plan)
            or re.search(r"PartitionFilters: \[[^\]]", plan)
        )
        lines.append(
            f"| {name} | {join_desc} | {n_exch} | {n_wsc} | {'yes' if pushed else '—'} |"
        )
    lines += [
        "",
        "Guard rails enforced over ALL declared queries (not just the",
        "headline set) by tests/test_plans.py: no BroadcastNestedLoopJoin",
        "between scaling inputs, no unpartitioned windows, filter/column",
        "pushdown and partition pruning asserted on the scan queries.",
        "",
    ]
    out = Path(__file__).resolve().parent.parent / "docs" / "PLANS.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
