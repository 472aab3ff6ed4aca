"""One more decade of scale evidence for the dedup family (VERDICT r06
"Next round" #8): probe sf0.1 -> sf1 (a further 10x) for the operators
whose sf0.01 -> sf0.1 time ratios were >= 2x — dedup_containment,
dedup_ngram_jaccard, text_hashing_features, dim_scd2_build — and
record whether growth stays ~linear.

No sf1 fixture exists, so the probe builds one by DISJOINT-SHARD
replication of the driver's sf0.1 data (perf probe only — correctness
stays pinned to the driver fixtures):

- ``documents``: 10 copies with offset doc_ids; every token prefixed
  with a replica tag, so each replica's shingle/token universe is a
  DISJOINT copy of the original. This is the honest scaling
  construction: per-shard statistics (shingle document frequencies,
  doc lengths, near-dup pair structure) are identical to sf0.1, only
  the corpus is 10x — naive duplication would instead create 45
  exact-dup pairs per document and measure the duplication pattern,
  not scale.
- ``orders``: 10 copies with offset o_orderkey / o_custkey — disjoint
  customer partitions, so the SCD2 window partition count scales 10x
  with per-partition history length unchanged (the at-scale shape).
- ``lineitem`` (round 8, VERDICT r07 #10): 10 copies with offset
  l_orderkey / l_partkey — the part co-purchase graph becomes 10
  DISJOINT copies of the sf0.1 graph, so wedges and triangles scale
  exactly 10x (naive duplication would multiply co-purchase edge
  weights instead and quadratically inflate wedge counts).
- ``embeddings`` (round 8): 10 copies with offset vec_id — the PQ
  trainer's corpus scales 10x while its deterministic seeds
  (vec_id < PQ_K, all in replica 0) and codebook stay constant, the
  at-scale shape for a trained index.
- ``events`` (round 9): 10 copies with offset event_id / user_id —
  disjoint user partitions, so keyed sequential folds
  (events_delta_trigger) scale in KEY count with per-key history
  unchanged, the shape that keeps a recurrence parallel across keys.

Output: docs/SCALING_SF1.md. Data lands in .scratch/sf1 (gitignored,
~200 MB). Run: python scripts/scaling_probe_sf1.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
DST = str(Path(__file__).resolve().parent.parent / ".scratch" / "sf1")
REPLICAS = 10
# Bump whenever build_sf1's replication scheme changes in ANY way (key
# offsets, the replica token tag, column handling): the --only reuse
# path accepts an existing shard only if its marker matches, because a
# count-preserving generator change would otherwise ride into addendum
# numbers silently (review r15 second pass).
SF1_GENERATOR_VERSION = 1
_MARKER = f"{DST}/_generator_version.json"
PROBES = [
    ("dedup_containment", "documents"),
    ("dedup_ngram_jaccard", "documents"),
    ("text_hashing_features", "documents"),
    ("dim_scd2_build", "orders"),
    # round 8 (VERDICT r07 #10): the heaviest round-7/iterative ops not
    # yet probed past sf0.1
    ("agg_pq_quantize", "embeddings"),
    ("graph_triangle_count", "lineitem"),
    ("dedup_cluster", "documents"),
    # round 9 (VERDICT r08 #8): the IVFADC query path — PQ training on
    # the 10x corpus + constant probe set (all PROBE_ID_MAX ids are
    # replica-0) scored against 10x-as-full inverted lists
    ("sim_ann_ivf_pq", "embeddings"),
    # round 9: the per-key sequential Python fold (Arrow applyInPandas)
    # — disjoint user replicas scale the KEY count 10x with per-key
    # history unchanged, the shape that keeps a sequential recurrence
    # parallel across keys
    ("events_delta_trigger", "events"),
    # round 9 late wave: the fused three-codec manifest — zero-shuffle,
    # decode-bound, so the probe pins the embarrassingly-parallel
    # claim through a second decade (payloads derive from doc_id, so
    # every replica decodes same-sized media)
    ("pipeline_multimodal_manifest", "documents"),
    # round 9 batch 17/18: the tokenizer family — the encode pass is
    # one scan + JVM fold + tiny agg (corpus-linear), the trainer is
    # one corpus shuffle to the vocab histogram then vocab-scale
    # iterations (the replica tags make sf1's vocab 10x too)
    ("text_bpe_apply", "documents"),
    ("text_bpe_train_merges", "documents"),
    # round 10 (VERDICT r09 #6): the multimodal dedup trio, probed
    # AFTER the r10 collapse+cap landed — identical signatures collapse
    # before banding and the replicated corpus's signature SET is
    # closed under the (group, variant) doc_id cycles, so the
    # candidate-pair term (reported below) must stay FLAT per decade
    # while only the decode/collapse stages scale with rows.
    ("multimodal_dedup_phash", "documents"),
    ("multimodal_audio_dedup_fingerprint", "documents"),
    ("multimodal_video_dedup_framehash", "documents"),
    # round 10 second wave: the new >= 1.3 s text ops. The replica
    # token tags make each shard's char-gram / word-trigram universe
    # DISJOINT, so cross-shard duplication is structurally zero and
    # per-shard dup/novelty statistics are identical to sf0.1 — only
    # the volume through the (gram, doc) / (shingle, doc) collapses
    # and the gram-/shingle-partitioned windows grows 10x.
    ("text_substring_dedup", "documents"),
    ("text_ngram_novelty", "documents"),
    # round 11 (VERDICT r10 #7): the async-I/O enrichment — map-only
    # (zero shuffles at any scale), so the probe documents the Arrow
    # round-trip constant: expect ~linear in rows.
    ("join_async_enrich", "events"),
    # round 11 (VERDICT r10 #5): the fingerprinted-gram substring-dedup
    # twin — same gram-volume denominator as the raw op, but the first
    # shuffle carries 8-byte longs instead of 32-char gram strings.
    ("text_substring_dedup_fp", "documents"),
    # round 12 (VERDICT r11 #7): the jar-free wire-format decode pair —
    # map-only encode+decode pandas-UDF stages whose cost is
    # byte-proportional; probing the second decade shows the Python
    # slow path stays linear in payload bytes (the jar fast path only
    # lowers the constant).
    ("scan_avro_decode", "documents"),
    ("scan_protobuf_decode", "documents"),
    # round 13 (VERDICT r12 #3): the six heaviest suite queries that had
    # no second-decade row — 5 of the 12 most expensive plus the
    # pagerank trainer.
    ("sim_ann_ivf_pq_residual", "embeddings"),
    ("graph_pagerank", "lineitem"),
    ("pipeline_training_corpus_v2", "documents"),
    ("dedup_cluster_stats", "documents"),
    ("dedup_minhash_sql", "documents"),
    ("dedup_fingerprint_levenshtein", "documents"),
    # round 13 second wave: the FILE/FRAMING round-trip queries — the
    # container/frame write+parse is byte-proportional map work (one
    # file per partition, whole-file parse per task), same class as
    # the r12 decode pair.
    ("scan_avro_container", "documents"),
    ("scan_protobuf_delimited", "documents"),
    ("scan_avro_confluent", "documents"),
]

# Work-unit denominator per op (VERDICT r11 #5): the unit the op's
# dominant term actually scales in, RE-MEASURED at both SFs at probe
# time (never a static whitelist — ADVICE r09: that would auto-excuse
# a future genuine regression). Row counts are the unit only where the
# per-row work is constant by construction (disjoint-shard replication
# keeps per-key/per-payload work identical); byte/gram/shingle units
# capture the replica-tag inflation that makes 10x rows MORE than 10x
# work for token-tagged documents shards.
OP_UNIT: dict[str, str] = {
    "dedup_containment": "word-shingles",
    "dedup_ngram_jaccard": "word-shingles",
    "text_hashing_features": "text-bytes",
    "dim_scd2_build": "orders-rows",
    "agg_pq_quantize": "embedding-rows",
    "graph_triangle_count": "lineitem-rows",
    "dedup_cluster": "word-shingles",
    "sim_ann_ivf_pq": "embedding-rows",
    "events_delta_trigger": "event-rows",
    "pipeline_multimodal_manifest": "document-rows",
    "text_bpe_apply": "text-bytes",
    "text_bpe_train_merges": "text-bytes",
    "multimodal_dedup_phash": "document-rows",
    "multimodal_audio_dedup_fingerprint": "document-rows",
    "multimodal_video_dedup_framehash": "document-rows",
    "text_substring_dedup": "char-grams",
    "text_ngram_novelty": "word-shingles",
    "join_async_enrich": "event-rows",
    "text_substring_dedup_fp": "char-grams",
    "scan_avro_decode": "text-bytes",
    "scan_protobuf_decode": "text-bytes",
    "sim_ann_ivf_pq_residual": "embedding-rows",
    "graph_pagerank": "lineitem-rows",
    "pipeline_training_corpus_v2": "word-shingles",
    "dedup_cluster_stats": "word-shingles",
    "dedup_minhash_sql": "word-shingles",
    "dedup_fingerprint_levenshtein": "word-shingles",
    "scan_avro_container": "text-bytes",
    "scan_protobuf_delimited": "text-bytes",
    "scan_avro_confluent": "text-bytes",
}


def measure_units(spark, needed: set[str] | None = None) -> dict[str, dict[str, int]]:
    """Measure every distinct work-unit denominator at both SFs.

    char-grams = Σ max(len(text)−31, 0) over gram-eligible docs (the
    substring ops' explode volume); word-shingles = Σ tokens (shingle
    count scales identically token-for-token); text-bytes = Σ
    len(text) (the byte-proportional fold/hash ops); *-rows = input
    row counts (ops whose per-row work is constant by construction).

    ``needed`` (targeted --only runs) restricts measurement to the
    units the selected probes actually report — the full no-flags run
    measures all of them.
    """
    from pyspark.sql import functions as F

    from hello_flink_spark.sources.readers import load_table

    def _want(u: str) -> bool:
        return needed is None or u in needed

    text_units = ("text-bytes", "word-shingles", "char-grams")

    def _one(sf: str) -> dict[str, int]:
        out: dict[str, int] = {}
        if any(_want(u) for u in text_units):
            d = load_table(spark, sf, "documents")
            agg = d.agg(
                F.sum(F.length("text")).alias("bytes"),
                F.sum(F.size(F.split("text", " "))).alias("tokens"),
                F.sum(
                    F.when(F.length("text") >= 32, F.length("text") - 31).otherwise(0)
                ).alias("grams"),
            ).collect()[0]
            out["text-bytes"] = int(agg["bytes"] or 0)
            out["word-shingles"] = int(agg["tokens"] or 0)
            out["char-grams"] = int(agg["grams"] or 0)
        for unit, table in (
            ("document-rows", "documents"),
            ("orders-rows", "orders"),
            ("lineitem-rows", "lineitem"),
            ("embedding-rows", "embeddings"),
            ("event-rows", "events"),
        ):
            if _want(unit):
                out[unit] = load_table(spark, sf, table).count()
        return out

    return {sf: _one(sf) for sf in (SRC, DST)}


def build_sf1(spark, reuse: bool = False) -> dict[str, int]:
    from pyspark.sql import functions as F

    from hello_flink_spark.sources.readers import load_table

    if reuse:
        # Targeted --only runs reuse an existing shard only when BOTH
        # checks pass: the generator-version marker matches (a
        # count-preserving replication-scheme change must invalidate
        # the shard — review r15 second pass) and every table holds
        # exactly REPLICAS x its sf0.1 rows. Building only the selected
        # probes' driving tables instead would BREAK any probe whose
        # query reads a second scaled table (weighed and rejected);
        # full no-flags runs always rebuild.
        try:
            import json as _json

            marker = _json.loads(Path(_MARKER).read_text())
            if marker.get("generator_version") != SF1_GENERATOR_VERSION:
                raise ValueError(
                    f"generator version {marker.get('generator_version')} "
                    f"!= {SF1_GENERATOR_VERSION}"
                )
            sizes = {}
            for t in ("documents", "orders", "lineitem", "embeddings", "events"):
                want = load_table(spark, SRC, t).count() * REPLICAS
                got = spark.read.parquet(f"{DST}/{t}.parquet").count()
                if got != want:
                    raise ValueError(f"{t}: {got} != {want}")
                sizes[t] = got
            print(
                "sf1 shard reused (generator-version match + "
                "count-verified 10x of sf0.1)"
            )
            return sizes
        except Exception as exc:  # noqa: BLE001 — missing/stale: rebuild
            print(f"sf1 shard not reusable ({exc}); rebuilding")

    sizes = {}
    ks = spark.range(REPLICAS).select(F.col("id").alias("k"))

    docs = load_table(spark, SRC, "documents")
    scaled_docs = (
        docs.crossJoin(ks)
        .select(
            (F.col("doc_id") + F.col("k") * 10_000_000).alias("doc_id"),
            F.expr(
                "array_join(transform(split(text, ' '), "
                "t -> concat('r', CAST(k AS STRING), '_', t)), ' ')"
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    scaled_docs.write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    sizes["documents"] = spark.read.parquet(f"{DST}/documents.parquet").count()

    orders = load_table(spark, SRC, "orders")
    scaled_orders = orders.crossJoin(ks).select(
        (F.col("o_orderkey") + F.col("k") * 1_000_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("k") * 1_000_000).alias("o_custkey"),
        *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
    )
    scaled_orders.write.mode("overwrite").parquet(f"{DST}/orders.parquet")
    sizes["orders"] = spark.read.parquet(f"{DST}/orders.parquet").count()

    li = load_table(spark, SRC, "lineitem")
    scaled_li = li.crossJoin(ks).select(
        (F.col("l_orderkey") + F.col("k") * 1_000_000_000).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("k") * 100_000_000).alias("l_partkey"),
        *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
    )
    scaled_li.write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
    sizes["lineitem"] = spark.read.parquet(f"{DST}/lineitem.parquet").count()

    emb = load_table(spark, SRC, "embeddings")
    scaled_emb = emb.crossJoin(ks).select(
        (F.col("vec_id") + F.col("k") * 100_000_000).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    )
    scaled_emb.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
    sizes["embeddings"] = spark.read.parquet(f"{DST}/embeddings.parquet").count()

    # events (round 9): offset event_id + user_id per replica — 10x
    # DISJOINT user partitions with per-key history identical to
    # sf0.1, so keyed sequential folds (events_delta_trigger) scale in
    # key count, not per-key work — the at-scale shape for a
    # recurrence. ts passes through load_table already normalized to
    # LTZ µs, and reads back from the shard unchanged.
    ev = load_table(spark, SRC, "events")
    scaled_ev = ev.crossJoin(ks).select(
        (F.col("event_id") + F.col("k") * 1_000_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("k") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    scaled_ev.write.mode("overwrite").parquet(f"{DST}/events.parquet")
    sizes["events"] = spark.read.parquet(f"{DST}/events.parquet").count()

    # stamp the shard with the generator version LAST — a build that
    # dies mid-way leaves no marker, so the reuse path rebuilds
    import json as _json

    Path(_MARKER).parent.mkdir(parents=True, exist_ok=True)
    Path(_MARKER).write_text(
        _json.dumps({"generator_version": SF1_GENERATOR_VERSION})
    )
    return sizes


def main() -> None:
    import argparse

    from pyspark.sql import functions as F

    from hello_flink_spark.registry import all_specs
    from hello_flink_spark.session import get_spark

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--only",
        nargs="+",  # argparse itself rejects a bare --only (review r15
        # second pass: the hand-rolled emptiness guard re-implemented this)
        default=None,
        help="targeted re-probe of the named ops after a code change "
        "(VERDICT r14 #7: re-run the probe only for ops whose code "
        "changed). Measures just these and APPENDS a dated addendum "
        "block to docs/SCALING_SF1.md — the authoritative full table "
        "is only regenerated by a no-flags run.",
    )
    args = parser.parse_args()
    probes = PROBES
    if args.only is not None:
        unknown = [n for n in args.only if n not in dict(PROBES)]
        if unknown:
            raise SystemExit(f"--only names not in the probe set: {unknown}")
        probes = [(n, t) for n, t in PROBES if n in args.only]

    spark = get_spark("scaling-probe-sf1")
    specs = all_specs()
    noop = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).select(noop("id").alias("id")).collect()

    sizes = build_sf1(spark, reuse=args.only is not None)
    print("sf1 sizes:", sizes)

    units = measure_units(
        spark,
        needed=None if args.only is None else {OP_UNIT[n] for n, _ in probes},
    )
    print("work units:", units)

    rows: dict[str, dict[str, float]] = {}
    for sf in (SRC, DST):
        for name, _ in probes:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                specs[name].fn(spark, sf).collect()
                runs.append(time.perf_counter() - t0)
            rows.setdefault(name, {})[sf] = min(runs)
            print(f"{sf} {name}: {min(runs):.3f}s")

    def probe_row(name: str, table: str) -> tuple[str, float, float, float]:
        """ONE formatter for both the authoritative table and the
        targeted addendum (review r15: two hand-kept copies had
        already drifted in column sets). Returns the markdown row plus
        (time ratio, unit ratio, time÷unit)."""
        a, b = rows[name][SRC], rows[name][DST]
        ratio = b / a if a else float("inf")
        u = OP_UNIT[name]
        ua, ub = units[SRC][u], units[DST][u]
        ur = ub / ua if ua else float("inf")
        per = ratio / ur if ur else float("inf")
        line = (
            f"| {name} | {table} | {a:.3f} | {b:.3f} | {ratio:.1f}x "
            f"| {u} ({ua:,} → {ub:,}) | {ur:.1f}x | {per:.2f} |"
        )
        return line, ratio, ur, per

    PROBE_HEADER = [
        "| query | driving input | sf0.1 s | sf1 s | time ratio | work unit | unit ratio | time÷unit |",
        "|---|---|---|---|---|---|---|---|",
    ]

    if args.only is not None:
        # dated addendum, never a full-report rewrite: regenerating the
        # table from a subset run would drop every unprobed op's row
        import datetime as _dt

        lines = [
            "",
            f"## Targeted re-probe ({', '.join(sorted(rows))}) — "
            f"{_dt.date.today().isoformat()}",
            "",
            "Code-change re-probe (VERDICT r14 #7: re-run only for ops",
            "whose code changed); same protocol and columns as the full",
            "table above (min-of-3, disjoint-shard sf1, work-unit",
            "denominators re-measured this run). The full table remains",
            "the authoritative record for all other ops.",
            "",
            *PROBE_HEADER,
        ]
        for name, table in probes:
            lines.append(probe_row(name, table)[0])
        out = Path(__file__).resolve().parent.parent / "docs" / "SCALING_SF1.md"
        out.write_text(out.read_text().rstrip("\n") + "\n" + "\n".join(lines) + "\n")
        print(f"appended targeted addendum to {out}")
        return

    # Candidate-pair accounting for the multimodal dedup trio (VERDICT
    # r09 #6): the band join's directed candidate count per sf, from
    # the shared signature stages — the number the r10 collapse+cap
    # bounds, reported alongside wall time so a future regression in
    # the pair term is visible as data, not inferred from wall clock.
    from hello_flink_spark.operators.banded_dedup import banded_candidates
    from hello_flink_spark.queries.round9 import (
        _afp_sigs,
        _phash_sigs,
        _vdup_sigs,
    )

    def _n_cand(sigs_fn, sf: str) -> int:
        reps = (
            sigs_fn(spark, sf)
            .groupBy("sig")
            .agg(F.min("doc_id").alias("rep_id"))
        )
        return banded_candidates(reps).count()

    cand: dict[str, dict[str, int]] = {}
    for name, sigs_fn in (
        ("multimodal_dedup_phash", _phash_sigs),
        ("multimodal_audio_dedup_fingerprint", _afp_sigs),
        ("multimodal_video_dedup_framehash", _vdup_sigs),
    ):
        cand[name] = {sf: _n_cand(sigs_fn, sf) for sf in (SRC, DST)}
        print(f"candidates {name}: {cand[name]}")

    # The band-edge text op gets the same accounting (VERDICT r13 #6:
    # time÷unit 0.86 leaves no headroom, so a fixture/data change that
    # pushes its O(len²) verify term superlinear must be caught HERE as
    # a candidate-count jump, not inferred from the bench gate). Unlike
    # the trio's flat signature set, these fp-capped equi-join pairs
    # scale ~linearly with docs under disjoint shards — the check is
    # per-decade growth ≈ the document ratio, never pairwise.
    from hello_flink_spark.queries.extras import _lev_fp_candidates

    cand["dedup_fingerprint_levenshtein"] = {
        sf: _lev_fp_candidates(spark, sf).count() for sf in (SRC, DST)
    }
    print(f"candidates dedup_fingerprint_levenshtein: "
          f"{cand['dedup_fingerprint_levenshtein']}")

    lines = [
        "# Scaling probe, second decade (generated — scripts/scaling_probe_sf1.py)",
        "",
        "sf0.1 -> sf1 (a further 10x) for the operators whose",
        "sf0.01 -> sf0.1 ratios were >= 2x, plus (round 8, VERDICT r07",
        "#10) the heaviest iterative ops: agg_pq_quantize,",
        "graph_triangle_count, dedup_cluster. sf1 is a disjoint-shard 10x",
        "replication of the driver's sf0.1 fixture (replica-tagged tokens,",
        "offset graph/vector ids — every shard a DISJOINT copy, so",
        "per-shard statistics are identical and only the volume grows;",
        "see the script docstring for why naive duplication would measure",
        "the wrong thing).",
        f"documents {sizes['documents']:,} rows, orders {sizes['orders']:,} rows,",
        f"lineitem {sizes['lineitem']:,} rows, embeddings {sizes['embeddings']:,} rows,",
        f"events {sizes['events']:,} rows.",
        "Min-of-3 wall seconds, same warm-up protocol as BASELINE.md.",
        "",
        "Each op carries its WORK-UNIT denominator (VERDICT r11 #5) —",
        "the unit its dominant term scales in, re-measured at both SFs",
        "this run: char-grams = Σ max(len(text)−31, 0); word-shingles =",
        "Σ tokens; text-bytes = Σ len(text); *-rows = input row counts",
        "(ops whose per-row work is constant under disjoint-shard",
        "replication). `unit ratio` is the unit's own sf1/sf0.1 growth",
        "(the replica token tag makes byte/gram/shingle units grow PAST",
        "10x); `time÷unit` = time ratio / unit ratio — at or under ~1.0",
        "means the op is linear-or-better in its own work, whatever the",
        "raw time ratio reads.",
        "",
        *PROBE_HEADER,
    ]
    worst = 0.0
    per_unit: dict[str, float] = {}
    unit_ratio: dict[str, float] = {}
    for name, table in PROBES:
        line, ratio, ur, per = probe_row(name, table)
        worst = max(worst, ratio)
        unit_ratio[name] = ur
        per_unit[name] = per
        lines.append(line)
    lines += [
        "",
        "Candidate-pair accounting for the multimodal dedup trio (the",
        "term the r10 exact-signature collapse + band-bucket cap bounds",
        "— operators/banded_dedup.py): directed band-join candidates",
        "between DISTINCT signatures, per sf. The replicated corpus's",
        "signature set is CLOSED under the (group, variant) doc_id",
        "cycles, so the pair term stays flat across the decade — only",
        "decode and the exact collapse scale with rows; on the r9 plan",
        "this number tracked cluster-density² instead.",
        "dedup_fingerprint_levenshtein (VERDICT r13 #6) reports its",
        "fp-capped equi-join candidate count in the same table — its",
        "O(len²) verify is candidate-linear by design (FP_BUCKET_CAP),",
        "so the healthy decade shape is growth ≈ the document ratio",
        "(~10x under disjoint shards), NOT flat; a superlinear jump",
        "here is the regression signal its measured",
        f"{per_unit['dedup_fingerprint_levenshtein']:.2f} time÷unit row",
        "has no headroom to absorb.",
        "",
        "| query | sf0.1 candidates | sf1 candidates |",
        "|---|---|---|",
    ] + [
        f"| {n} | {c[SRC]:,} | {c[DST]:,} |" for n, c in cand.items()
    ]
    # analysis derived from the MEASURED ratios, never hardcoded — a
    # regenerated doc must agree with its own table
    sub = [n for n, tb in PROBES if rows[n][DST] / rows[n][SRC] < 9.5]
    near = [
        n for n, tb in PROBES if 9.5 <= rows[n][DST] / rows[n][SRC] <= 11.0
    ]
    over = [n for n, tb in PROBES if rows[n][DST] / rows[n][SRC] > 11.0]
    lines += [
        "",
        f"Worst time ratio across the {len(PROBES)}: **{worst:.1f}x** for 10x data.",
        "A ratio at or below the data growth means the >= 2x",
        "first-decade growth was fixed-overhead amortization ending, not",
        "a super-linear term.",
        "",
    ]
    # Per-op plan reasons, composed per MEASURED category so the prose
    # can never name an op outside its own bucket (which band an op
    # lands in varies run to run near the 10x boundary — fixed
    # overheads amortizing vs byte-proportional work).
    reasons = {
        "dedup_containment": "df-capped shingle joins have no term above their keyed input",
        "dedup_ngram_jaccard": "df-capped shingle joins have no term above their keyed input",
        "text_hashing_features": "explode + md5 per token + ONE keyed hash-aggregate, byte-proportional (the 'rK_' replica tag inflates sf1 token bytes slightly past 10x)",
        "dim_scd2_build": "the single-shuffle double-window build is row-proportional over 10x as many disjoint customer partitions",
        "agg_pq_quantize": "the PQ trainer's per-iteration cost is map-only argmin + a 128-group keyed agg, so its fixed 4-iteration job overhead amortizes",
        "graph_triangle_count": "degree-oriented wedge enumeration over 10 disjoint graph copies — wedges scale exactly 10x",
        "dedup_cluster": "CC round count is O(log^2 n) and DISJOINT shards keep the same diameter, so rounds do not grow with the replication",
        "sim_ann_ivf_pq": "the trainer's cost plus a constant probe set against 10x-as-full inverted lists — every per-query operand (LUTs, probe buckets) is volume-independent, only the bucket equi-join scales",
        "events_delta_trigger": "the lockstep scan is sequential PER KEY but the shards scale the KEY count (disjoint users), so the vectorized cross-key batches widen and only the one user shuffle scales",
        "pipeline_multimodal_manifest": "ZERO-shuffle decode-bound Arrow stage — embarrassingly parallel per input split, byte-proportional in the three codec payloads",
        "text_bpe_apply": "scan + broadcast merge array + JVM replace fold per word + one tiny per-source agg — BYTE-proportional, and the 'rK_' replica tag inflates sf1 word-chars 16.7x (measured: 1,219,872 -> 20,319,840), so ~10-12x time is sublinear per byte, same class as text_hashing_features",
        "text_bpe_train_merges": "ONE corpus shuffle to the word histogram, then 8 vocab-scale iterations (the replica tags grow sf1's vocab 10x, but vocab stays orders below the corpus) with 1-row driver scalars",
        "multimodal_dedup_phash": "decode + exact-signature collapse scale with rows; the band join runs over the FLAT distinct-signature set (candidate table above), so the pair term contributes nothing to the decade",
        "multimodal_audio_dedup_fingerprint": "same collapse-first shape as phash: row-proportional decode, flat distinct-fingerprint band join",
        "multimodal_video_dedup_framehash": "per-frame decode is the row-proportional term; the frame-aligned signature collapse leaves the same flat candidate set across the decade",
        "text_substring_dedup": "map-side char-gram explode is byte-proportional (the 'rK_' replica tag inflates sf1 text bytes somewhat past 10x); the (gram, doc) collapse and the gram-partitioned count window are keyed aggregates over DISJOINT replica gram universes, so per-gram group sizes stay constant and no term grows above the exploded input",
        "text_ngram_novelty": "word-trigram explode + (shingle, doc) collapse + shingle-partitioned MIN window — keyed aggregates over disjoint replica shingle universes; per-shingle group sizes are constant across the decade",
        "join_async_enrich": "MAP-ONLY (zero shuffles): one Arrow round-trip of (event_id, user_id) per row plus per-batch key coalescing against the deterministic client — the probe pins the round-trip constant as row-proportional",
        "text_substring_dedup_fp": "the raw twin's shape with xxhash64 fingerprints replacing 32-char gram strings BEFORE the first shuffle — gram volume grows past 10x (replica-tag byte inflation, same denominator as the raw twin) while shuffle bytes per gram drop ~4x",
        "scan_avro_decode": "map-only Arrow encode + pure-Python wire decode, byte-proportional with per-job fixed overhead amortizing across the decade; the one shuffle is the final ~|langs|-group aggregate",
        "scan_protobuf_decode": "same map-only encode/decode shape as the Avro twin (varint wire format), byte-proportional with fixed overhead amortizing; final shuffle is the ~|sources|-group aggregate",
        "sim_ann_ivf_pq_residual": "same IVFADC shape as sim_ann_ivf_pq with TRUE residual encoding: the Lloyd trainer's per-iteration cost is map-only argmin + a fixed-group agg over the 10x corpus, the probe set is constant (PROBE_ID_MAX ids, all replica-0) and every per-query operand (ADC LUTs, probe buckets) is volume-independent — only the coarse-bucket equi-join scales",
        "graph_pagerank": "each iteration is ONE join + ONE keyed agg on the src-repartitioned, eagerly-checkpointed edge list (O(edges)); replica-offset custkeys make the distinct (customer, supplier) edge set exactly 10x, iteration count is fixed, and driver state is 1-row scalars",
        "pipeline_training_corpus_v2": "the fused five-stage plan's dominant term is the df-capped shingle self-join; disjoint replica shingle universes keep per-shingle group sizes constant, so the containment term scales with the shingle volume and no stage grows above its keyed input",
        "dedup_cluster_stats": "dedup_cluster's large-star/small-star CC to fixed point plus two tiny hash aggs over the label table; DISJOINT shards keep component diameter constant, so round count does not grow and per-round cost is edge-proportional",
        "dedup_minhash_sql": "df-capped shingle explode → 8 minhash folds (keyed agg) → banded equi-self-join; disjoint replica shingle universes keep per-band bucket sizes constant across the decade, so candidates scale linearly with docs, never pairwise",
        "dedup_fingerprint_levenshtein": "shingle explode + min-hash fingerprint (keyed agg) → fingerprint-capped equi-join (<=32 per bucket) → Levenshtein only on the capped candidates; bucket sizes stay constant across disjoint shards, so the O(len^2) verify term scales with candidate count, which is linear in docs",
        "scan_avro_container": "executor-side container write (one file per partition over the spread scan) + whole-file container parse per task — byte-proportional both directions, deflate cost linear in payload, the only exchange is the ~|langs| aggregate",
        "scan_protobuf_delimited": "same write→read shape with varint frame split instead of sync-framed blocks — byte-proportional, zero shuffles until the ~|sources| aggregate",
        "scan_avro_confluent": "map-only two-generation Confluent encode + per-id decode/resolve (no file layer, no spread — A/B-measured; cheap branches), byte-proportional with fixed job overhead amortizing",
    }

    def _reason_block(names):
        return [f"- {n}: {reasons[n]}." for n in names] + [""]

    if sub:
        lines += [
            f"Sublinear this decade ({', '.join(sub)}): scale BELOW the",
            "data. Per-plan reasons:",
            "",
        ] + _reason_block(sub)
    if near:
        lines += [
            f"At-linear ({', '.join(near)}): proportional by",
            "construction. Per-plan reasons:",
            "",
        ] + _reason_block(near)
    # Over-band ops are only recordable WITH a diagnosis (VERDICT r06
    # #8), and the diagnosis is now GENERIC (VERDICT r11 #5): every op
    # carries a work-unit denominator re-measured this run (the table's
    # `unit ratio` column), so an op whose time grows no faster than
    # its own units (time÷unit <= 1.15 — min-of-3 jitter allowance) is
    # auto-diagnosed from data instead of hand-explained each round.
    # Never a static whitelist (ADVICE r09): a genuine super-linear
    # regression grows time PAST the measured unit growth and fails
    # this check.
    OVER_DIAGNOSED: dict[str, str] = {}
    for n in over:
        if per_unit[n] <= 1.15:
            tr = rows[n][DST] / rows[n][SRC]
            u = OP_UNIT[n]
            OVER_DIAGNOSED[n] = (
                f"work unit is the {u} ({units[SRC][u]:,} → "
                f"{units[DST][u]:,}, {unit_ratio[n]:.1f}x — the 'rK_' "
                f"replica tag inflates token-derived units past 10x); "
                f"{tr:.1f}x time for {unit_ratio[n]:.1f}x units is "
                f"time÷unit {per_unit[n]:.2f} — linear in its own work "
                "to within min-of-3 jitter"
            )
    # The fp twin's ratio is hostage to its sub-3s sf0.1 denominator
    # (min-of-3 on a noisy-neighbor box). The run-independent bound: it
    # is the RAW twin's exact plan shape with strictly FEWER bytes
    # through the same gram-keyed shuffle, so whenever its sf1 ABSOLUTE
    # time lands at or under the twin's measured-in-the-same-run sf1
    # time, its per-gram sf1 cost is dominated by the twin's diagnosed
    # gram growth. Never auto-excuses a genuine regression: a plan
    # change that made fp super-linear would push its sf1 time past the
    # raw twin's and the domination check fails.
    fp, raw = "text_substring_dedup_fp", "text_substring_dedup"
    if (
        fp in over
        and fp not in OVER_DIAGNOSED
        and raw in OVER_DIAGNOSED
        and rows[fp][DST] <= rows[raw][DST] * 1.05
    ):
        OVER_DIAGNOSED[fp] = (
            f"same work unit and plan shape as {raw} with strictly "
            f"fewer shuffle bytes per gram; its sf1 time this run "
            f"({rows[fp][DST]:.1f}s) is AT/UNDER the twin's "
            f"({rows[raw][DST]:.1f}s), so its per-gram sf1 cost is "
            f"dominated by the twin's diagnosed {unit_ratio[raw]:.1f}x "
            f"gram growth — the ratio excess "
            f"({rows[fp][DST] / rows[fp][SRC]:.1f}x) comes entirely "
            f"from the sub-3s sf0.1 denominator (min-of-3 noise on "
            "this box), not from any sf1-side term"
        )
    diagnosed = [n for n in over if n in OVER_DIAGNOSED]
    unknown = [n for n in over if n not in OVER_DIAGNOSED]
    if diagnosed:
        lines += [
            f"Above 11x but DIAGNOSED ({', '.join(diagnosed)}): the",
            "data-growth denominator is not 10x for these inputs.",
            "",
        ] + [f"- {n}: {OVER_DIAGNOSED[n]}." for n in diagnosed] + [""]
    if unknown:
        lines += [
            f"SUPER-LINEAR ({', '.join(unknown)}): ratio exceeds the data",
            "growth even after the byte-inflation allowance — diagnose",
            "with .explain before recording (VERDICT r06 #8).",
            "",
        ]
    out = Path(__file__).resolve().parent.parent / "docs" / "SCALING_SF1.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
