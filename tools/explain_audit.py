"""Plan audit: capture .explain('formatted') for representative
queries and assert the physical properties the engine is designed
around (predicate pushdown, broadcast joins for dims, map-side
partial aggregation, no single-partition exchanges in scale paths).

Writes PLANS.md. Run: python tools/explain_audit.py
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from crypto_crawler_rs_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CHECKS = {
    # query -> (must-contain regexes, must-not-contain regexes, note)
    "a2_pricing_summary": (
        [r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", r"HashAggregate"],
        [],
        "shipdate predicate reaches the parquet scan; partial+final hash agg",
    ),
    "j3_broadcast_rank": (
        [r"BroadcastHashJoin"],
        [],
        "nation dim joins as broadcast hash join (no shuffle of orders)",
    ),
    "j1_anti_no_orders": (
        [r"LeftAnti"],
        [],
        "anti-join planned natively (broadcast or shuffled by AQE stats)",
    ),
    "o2_topk_per_group": (
        [r"WindowGroupLimit|Window"],
        [r"Exchange SinglePartition"],
        "per-key window rank: partitioned exchange only, never single-partition",
    ),
    "dedup_exact": (
        [r"HashAggregate", r"ReadSchema: struct<doc_id:bigint,text:string>"],
        [],
        "column pruning: only (doc_id, text) read from the 5-col table",
    ),
    "ann_cosine_topk": (
        [r"BroadcastNestedLoopJoin"],
        [r"CartesianProduct"],
        "query side broadcast: corpus streams once, no cartesian shuffle",
    ),
    "c5_explode_split": (
        [r"Generate", r"explode", r"HashAggregate"],
        [],
        "explode + partial agg pipeline, whole-stage codegen",
    ),
    # round 2 additions
    "frontier_round0": (
        [r"ReadSchema: struct<doc_id:bigint,source:string>", r"Window"],
        [r"CartesianProduct"],
        "engine-spine query: column pruning to (doc_id, source); windowed pop",
    ),
    "m1_msgtype_command_map": (
        [r"BroadcastHashJoin"],
        [],
        "msg-type mapping dim joins broadcast (events never shuffle)",
    ),
    "dedup_minhash_lsh": (
        [r"Join"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        "band-signature equi-joins only — never all-pairs",
    ),
    "dedup_simhash_pairs": (
        [r"Join"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        "fingerprint band equi-join — never all-pairs",
    ),
    "ann_cosine_lsh": (
        [r"Join"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        "bucket-collision equi-joins; exact re-rank only on candidates",
    ),
    "dedup_embedding_neardup": (
        [r"MapInPandas"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        "oracle-only exact twin: Arrow matmul, corpus streams once",
    ),
    "mm1_media_features": (
        [r"MapInPandas", r"ReadSchema: struct<doc_id:bigint,text:string>"],
        [],
        "multimodal feature stage: Arrow batches, pruned scan",
    ),
    # round 3 additions
    "ann_cosine_ivf": (
        [r"BroadcastNestedLoopJoin", r"HashAggregate"],
        [r"CartesianProduct"],
        "centroid book broadcast-streamed (bounded NLJ over n_cells rows); "
        "cell assignment aggregates map-side; candidate/re-rank equi-joins",
    ),
    "dedup_incremental": (
        [r"MapInPandas", r"ReadSchema: struct<doc_id:bigint,text:string>"],
        [r"Join", r"CartesianProduct"],
        "persistent digest index NEVER enters the plan (no join): tasks "
        "read only their bucket's index files",
    ),
    # round 4 additions
    "pagerank_hostrank": (
        [r"Window", r"Scan ExistingRDD"],
        [r"Join", r"CartesianProduct"],
        "final plan is FLAT over the localCheckpoint'd ranks (Scan "
        "ExistingRDD): per-iteration lineage truly truncated — no join "
        "history re-derived at action time",
    ),
    "dedup_chunk": (
        [r"HashAggregate", r"partial_min", r"Join",
         r"ReadSchema: struct<doc_id:bigint,text:string>"],
        [r"Exchange SinglePartition", r"CartesianProduct", r"Window"],
        "chunking in codegen; first-occurrence via map-side-combined "
        "min_by agg + hash equi-join (NOT a window: a hot boilerplate "
        "chunk key can't split under a window, but AQE splits the "
        "skewed join side); reassembly agg — all shuffles "
        "hash-partitioned",
    ),
    "url_trap_patterns": (
        [r"HashAggregate", r"ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>"],
        [r"Exchange SinglePartition", r"BatchEvalPython"],
        "pure-JVM masking + distinct-count agg; scan pruned to 2 cols; "
        "no Python in the plan",
    ),
    "politeness_ewma": (
        [r"FlatMapGroupsInPandas", r"hashpartitioning\(host"],
        [r"Exchange SinglePartition"],
        "per-host EWMA fold: one hash exchange on host, Arrow-grouped "
        "pandas ewm kernel",
    ),
    # round 5 additions (promoted graded rows)
    "dedup_components": (
        [r"Scan ExistingRDD"],
        [r"CartesianProduct", r"BatchEvalPython",
         r"Exchange (hash|range|single)partitioning", r"SortMergeJoin"],
        "the keeper table is the final localCheckpoint (Scan "
        "ExistingRDD — iteration lineage truly cut) remapped by the "
        "r6 local finisher's bounded BROADCAST fix-up (union-found "
        "residual pairs, <= finish_collect_rows rows) — a broadcast "
        "exchange only, never a shuffle of the N-row label table",
    ),
    "lm_surprisal": (
        [r"HashAggregate", r"Join",
         r"ReadSchema: struct<doc_id:bigint,text:string>"],
        [r"BatchEvalPython", r"CartesianProduct", r"Exchange SinglePartition"],
        "token explode + map-side-combined counts; tokens join the "
        "logp table as a hash equi-join (AQE-splittable on stopword "
        "skew); scan pruned to (doc_id, text); no Python in the plan",
    ),
    "prep_corpus": (
        [r"HashAggregate", r"Join",
         r"ReadSchema: struct<doc_id:bigint,text:string>"],
        [r"BatchEvalPython", r"CartesianProduct", r"Window"],
        "entire gate->dedup->chunk-dedup composition stays JVM-side: "
        "codegen filters, min_by aggs + hash equi-joins (no window on "
        "the hot chunk key), pruned scan",
    ),
    "recrawl_due": (
        [r"HashAggregate"],
        [r"Exchange SinglePartition", r"BatchEvalPython", r"CartesianProduct"],
        "TTL filter + union + min-depth merge: one hash-partitioned "
        "aggregate over (url, host) — the re-enqueue path shuffles "
        "once and never single-partitions",
    ),
    # round 5 additions: the webtext training-pipeline trio
    "repetition_filter": (
        [r"ReadSchema: struct<doc_id:bigint,text:string>"],
        [r"Exchange", r"BatchEvalPython", r"ArrowEvalPython"],
        "Gopher repetition filters: ZERO exchanges — per-row array "
        "aggregates evaluated in the scan stage, column-pruned to "
        "(doc_id, text); the filter costs one parquet read at 100 TB",
    ),
    "decontaminate": (
        [r"BroadcastHashJoin"],
        [r"SortMergeJoin", r"CartesianProduct"],
        "benchmark shingle set broadcast: the corpus-side explode "
        "streams through the join map-side; the only shuffle is the "
        "per-doc overlap count groupBy",
    ),
    "stratified_sample": (
        [r"WindowGroupLimit"],
        [r"Exchange SinglePartition"],
        "rank<=k per stratum planned as WindowGroupLimit: map-side "
        "top-k pruning before the stratum exchange",
    ),
    "winnow_passages": (
        [r"HashAggregate"],
        [r"CartesianProduct", r"BatchEvalPython"],
        "winnowing: fingerprint selection over Arrow batches (the "
        "measured stay-JVM exception, same as shingle_rows; a pure-"
        "JVM hof twin is impl-equivalence-pinned); pair detection is "
        "a df-capped inverted-index equi-join — banded, never "
        "all-pairs",
    ),
    # round 6 additions: the incremental fuzzy-dedup family
    "components_incremental": (
        [r"Scan ExistingRDD"],
        [r"CartesianProduct", r"BatchEvalPython"],
        "prior labels enter as contracted spanning-forest edges; the "
        "final labeling is the components localCheckpoint (plus the "
        "finisher's bounded broadcast fix-up) unioned with the "
        "singleton re-add anti-join — one O(prior nodes) pass, the "
        "same order as the edge repartition the operator always pays",
    ),
    "lsh_incremental": (
        [r"BroadcastHashJoin", r"PartitionFilters"],
        [r"CartesianProduct", r"BatchEvalPython", r"SortMergeJoin"],
        "index probe: STATIC bucket partition filters (the seenjoin "
        "discipline — the batch's distinct buckets are a bounded "
        "collect; DPP's heuristic declines without a selective build-"
        "side predicate) prune the bands scan to the batch's buckets "
        "and the shingles scan to the candidate ids' buckets, then a "
        "broadcast semi-join row-prunes before the exact-Jaccard "
        "confirm; the bands-probe stage itself is checkpointed out of "
        "this final plan and pinned by "
        "test_probe_scans_are_bucket_pruned",
    ),
    # round 6 addition: the composed fuzzy prep pipeline
    "prep_corpus_fuzzy": (
        [r"HashAggregate", r"Join", r"Scan ExistingRDD"],
        [r"CartesianProduct", r"BatchEvalPython", r"Window",
         r"Exchange SinglePartition"],
        "gate->exact-dedup->LSH->components->keeper->chunk-dedup "
        "composition: banded equi-joins only (never all-pairs), the "
        "keeper list enters FLAT from the components localCheckpoint "
        "(Scan ExistingRDD — iteration lineage cut), left-anti keeper "
        "filter, no window on the hot chunk key, no row-Python",
    ),
}


def main():
    spark = get_spark(app="explain_audit", shuffle_partitions=32)
    qs = entrymod.queries()
    sections = []
    failures = []
    for name, (must, must_not, note) in CHECKS.items():
        plan = plan_of(qs[name](spark, SF))
        status = "PASS"
        detail = []
        for pat in must:
            if not re.search(pat, plan):
                status = "FAIL"
                detail.append(f"missing /{pat}/")
        for pat in must_not:
            if re.search(pat, plan):
                status = "FAIL"
                detail.append(f"forbidden /{pat}/ present")
        print(f"{status:4s}  {name}: {note} {detail if detail else ''}")
        if status == "FAIL":
            failures.append(name)
        # keep the physical-plan tree head for the doc
        head = plan.split("\n\n")[0]
        if len(head) > 2200:
            head = head[:2200] + "\n  ..."
        sections.append((name, note, status, head, detail))
    spark.stop()

    with open("PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan audit\n\n"
            "Generated by `python tools/explain_audit.py` at sf0.01.\n"
            "Each query's plan is checked for the physical property the\n"
            "engine is designed around (SURVEY.md §4): predicate pushdown\n"
            "into parquet scans, broadcast joins for dimension lookups,\n"
            "map-side partial aggregation, column pruning, and the absence\n"
            "of single-partition exchanges on scale paths.\n\n"
        )
        for name, note, status, head, detail in sections:
            f.write(f"## {name} — {status}\n\n{note}")
            if detail:
                f.write(f" ({'; '.join(detail)})")
            f.write("\n\n```\n" + head + "\n```\n\n")
    print(f"\n{len(failures)} failures -> PLANS.md")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
