"""Physical-plan audit: dump `.explain("formatted")` for the headline
queries and check each plan for the scale properties it must have
(pushdown reached the scan, dims broadcast, top-k as TakeOrdered, no
nested-loop joins, whole-stage codegen present). Writes PLANS.md.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from labs_stream_processing_examples_scala_spark import get_spark

# (query, [must-contain], [must-not-contain])
AUDITS = [
    ("q1_scan_project", ["ReadSchema"], ["l_returnflag"]),  # column pruning
    ("q2_filter", ["PushedFilters", "GreaterThanOrEqual(l_shipdate"], []),
    ("q4_agg_tpch_q1", ["partial_sum"], ["SortMergeJoin"]),  # map-side combine
    ("q7_join_revenue", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("q10_window_rank", ["Window"], []),
    ("q12_topk", ["TakeOrderedAndProject"], ["Sort ["]),
    ("q19_range_join", [], ["BroadcastNestedLoopJoin"]),
    # signatures are per-row folds over the cached shingle arrays: the
    # only "plan" is an InMemoryTableScan + projection — no keyed
    # shuffle. Formatted explain prints "(N) Exchange" with the
    # partitioning on a separate "Arguments:" line, so forbid the
    # partitioning spelling itself: the cache's one-time spread renders
    # as RoundRobinPartitioning, while a keyed-shuffle regression would
    # introduce "hashpartitioning(".
    ("x_dedup_minhash_sig", ["InMemoryTableScan"], ["hashpartitioning("]),
    ("x_sim_bruteforce_topk", ["TakeOrderedAndProject", "BroadcastExchange"], ["SortMergeJoin"]),
    # multiprobe ANN: the probe set is a broadcast (table,bucket) lookup
    # against the persisted signature index; re-rank is TakeOrdered
    ("x_sim_lsh_topk", ["BroadcastHashJoin", "TakeOrderedAndProject"], ["SortMergeJoin", "CartesianProduct"]),
    # PQ: encoding is one narrow Arrow-vectorized map over the scan
    # (codebooks in the closure; the Catalyst literal fold is kept as
    # the parity reference but evaluates interpreted — quantization.py)
    # — no Exchange of ANY kind; ADC+rerank is two TakeOrdered stages
    # glued by a broadcast shortlist join
    ("x_sim_pq_codes", ["MapInArrow"], ["Exchange", "Join", "Window", "BatchEvalPython", "ArrowEvalPython"]),
    # SQ: one partial-aggregated stats pass feeds literal min/scale
    # vectors; scoring is a row-local dequantize+dot, then TakeOrdered
    ("x_sim_sq_topk", ["TakeOrderedAndProject"], ["Join", "Window", "BatchEvalPython", "ArrowEvalPython"]),
    # round-8 graph tier: per-shard greedy search (MapInPandas over the
    # cached graph) + global top-k merge — no join, no window; the only
    # exchange is the build's one shard repartition
    ("x_sim_nsw_topk", ["TakeOrderedAndProject", "MapInPandas"], ["Join", "Window", "CartesianProduct"]),
    # round-9 steady-state probe over the MATERIALIZED on-disk graph
    # index: pure scan + per-shard search + top-k merge — zero exchanges
    ("x_sim_nsw_probe", ["TakeOrderedAndProject", "MapInPandas"], ["Join", "Window", "CartesianProduct", "Exchange"]),
    # round-9 batched probe: many queries share one scan; the only wide
    # op is the per-query top-k Window over P*ef*|Q| candidate rows
    ("x_sim_nsw_batch", ["MapInPandas", "Window"], ["Join", "CartesianProduct"]),
    ("x_sim_pq_topk", ["BroadcastHashJoin", "TakeOrderedAndProject"], ["SortMergeJoin", "CartesianProduct"]),
    # IVF-PQ probe: pruned cell partitions of the CODE table + ADC +
    # broadcast point-lookup re-rank — never a shuffle join
    ("x_sim_ivfpq_topk", ["PartitionFilters: [cell", "TakeOrderedAndProject", "BroadcastHashJoin"],
     ["SortMergeJoin", "CartesianProduct"]),
    # narrow: zero shuffles; codegen spans exist (the char-sort
    # higher-order fn is interpreted — HOFs never codegen — but the
    # scan+base projection must)
    ("p3_enrich_full", ["[codegen id"], ["Exchange"]),
    # breadth batch 2
    ("q25_array_hof", [], ["BatchEvalPython", "ArrowEvalPython", "Exchange"]),
    ("q26_stats_agg", ["HashAggregate"], ["SortMergeJoin"]),
    ("q28_grouping_sets", ["Expand"], []),  # grouping sets plan = Expand node
    ("q29_range_frame", ["Window"], []),
    ("q30_tpch_q3", ["BroadcastHashJoin", "TakeOrderedAndProject"], ["Sort ["]),
    ("q31_in_subquery", ["LeftSemi"], ["BroadcastNestedLoopJoin"]),
    # TPC-H additions + samplers + simhash banding
    ("q33_tpch_q5", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("q37_promo_share", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("x_sample_hash_split", [], ["Exchange"]),  # pure narrow projection
    ("x_sample_stratified", [], ["Exchange"]),
    ("x_dedup_simhash_pairs", ["HashAggregate"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # round 10: skew-guarded LSH pairs — hot-tag joins and the verify
    # joins all broadcast at audit SF; the salt is a conditional
    # expression so cold rows replicate 1x
    ("x_dedup_lsh_pairs", ["BroadcastHashJoin"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # TPC-H shapes batch 3
    ("q39_tpch_q4", ["LeftSemi"], ["BroadcastNestedLoopJoin"]),
    # every predicate reaches the scan; no join anywhere
    ("q40_tpch_q6", ["PushedFilters", "LessThan(l_quantity"], ["Join"]),
    ("q41_brand_suppliers", ["BroadcastHashJoin", "HashAggregate"], ["SortMergeJoin"]),
    ("q42_tpch_q17", ["BroadcastHashJoin", "partial_avg"], ["SortMergeJoin"]),
    ("q45_tpch_q13", ["HashAggregate"], ["BroadcastNestedLoopJoin"]),
    ("q46_tpch_q15", ["BroadcastHashJoin"], ["SortMergeJoin", "CartesianProduct"]),
    # sliding window = narrow Expand (2 buckets/row) + one agg; no join
    ("q47_sliding_window", ["Expand", "partial_count"], ["Join"]),
    # TPC-H shapes batch 4 (Q7/Q8/Q12/Q19/Q21/Q22 adaptations)
    ("q48_tpch_q7", ["HashAggregate"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("q49_tpch_q8", ["HashAggregate"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("q50_tpch_q12", ["PushedFilters"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # the disjunctive predicate must NOT degrade the equi-join
    ("q51_tpch_q19", [], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("q52_tpch_q21", ["LeftSemi", "LeftAnti"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("q53_tpch_q22", ["LeftAnti"], ["CartesianProduct"]),
    # correlated-min as per-part window; profit agg; global-scalar HAVING
    ("q54_tpch_q2", ["Window"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("q55_tpch_q9", ["HashAggregate"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # the (>) join against the one-row total is a 1-row BNLJ build — allowed
    ("q56_tpch_q11", ["HashAggregate"], ["CartesianProduct"]),
    ("q57_tpch_q20", ["LeftSemi"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # corpus ops: packing is one keyed window (no join); contamination
    # probes the broadcast benchmark set (corpus side never shuffles);
    # normalization is a pure narrow projection
    ("x_pack_sequences", ["Window"], ["Join", "CartesianProduct"]),
    ("x_corpus_contamination", ["BroadcastHashJoin"], ["SortMergeJoin", "CartesianProduct"]),
    ("x_embed_normalize", [], ["Exchange", "BatchEvalPython", "ArrowEvalPython"]),
    # round-2 batch: sessionization/rolling windows are one keyed
    # window each; text ops are narrow projections; vocab is
    # explode -> partial/final agg -> TakeOrdered; chunks are a narrow
    # Generate; span dedup is the inverted-index agg+join shape
    ("q58_sessionize", ["Window", "HashAggregate"], ["Join", "SortMergeJoin"]),
    ("q59_rolling_1h", ["Window"], ["Join"]),
    ("x_text_pii_redact", [], ["Exchange", "BatchEvalPython", "ArrowEvalPython"]),
    ("x_text_quality_filter", ["Window"], ["Join"]),
    ("x_vocab_topk", ["TakeOrderedAndProject", "Generate"], ["SortMergeJoin"]),
    ("x_chunk_documents", ["Generate"], ["Exchange", "BatchEvalPython"]),
    ("x_dedup_spans", ["HashAggregate", "Generate"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # round-8 removal transform: first-occurrence ranking is ONE window
    # over the gram hash; the doc-side rebuild joins the (small,
    # ∝ duplicated docs) removed-starts agg back broadcast — never a
    # pair product
    ("x_dedup_span_removal", ["Window", "BroadcastHashJoin"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # round-8 multiprobe near-dup pairs: candidates stay a (table,
    # bucket) equi-join (probe-expanded side × base side) + exact
    # verify — the all-pairs product must never appear
    ("x_sim_lsh_neardup", ["BroadcastHashJoin"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # round-8 span decontamination: the benchmark gram set probes the
    # corpus gram stream BROADCAST (eval suites are fixed-size) — no
    # ranking window needed, no pair product possible
    ("x_corpus_clean_spans", ["BroadcastHashJoin"], ["Window", "CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("x_sample_importance", [], ["Exchange"]),
    # LATERAL must decorrelate to a window + join, never re-execute the
    # subquery per outer row; the recursive spine runs as UnionLoop
    ("q60_lateral_topn", ["Window", "BroadcastHashJoin"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("q61_date_spine", ["UnionLoop"], ["CartesianProduct"]),
    # end-to-end corpus assembly: bench probe broadcast, quality
    # percentile window, narrow stages fused — never a cartesian
    ("x_corpus_pipeline", ["BroadcastHashJoin", "Window"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # Lloyd step: centroids are a constant plan literal, assignment is a
    # row-local argmax (NO window, NO join on the SF-scaled side); the
    # only wide edges are the bounded (cell,pos) means with map-side
    # combine and the n_cells-row diag broadcast join
    ("x_sim_kmeans_step", ["partial_avg", "BroadcastHashJoin"],
     ["SortMergeJoin", "Window", "BroadcastNestedLoopJoin", "row_number"]),
    # IVF probe: reads ONLY the nprobe nearest cells' partitions of the
    # materialized inverted file — partition pruning at the scan, and
    # not a single shuffle anywhere in the probe plan
    ("x_sim_ivf_topk", ["PartitionFilters: [cell", "TakeOrderedAndProject"], ["Exchange"]),
    # round 12: steady-state probe over the materialized inverted file —
    # identical plan shape to x_sim_ivf_topk (build amortized away)
    ("x_sim_ivf_probe", ["PartitionFilters: [cell", "TakeOrderedAndProject"], ["Exchange"]),
    # streaming-maintained IVF index: the probe over the ingest-built,
    # compacted inverted file keeps the batch probe's exact plan shape
    ("x_sim_ivf_incremental", ["PartitionFilters: [cell", "TakeOrderedAndProject"], ["Exchange"]),
    # sub-day range join: bucket fan-out is a narrow Generate; the join
    # itself must stay an equi hash join on (bucket, user), never a
    # time-range nested loop
    ("q64_range_hourly", ["Generate", "HashAggregate"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    # funnel/cohort: every wide edge keys on user_id / the grid key
    ("q62_funnel", ["HashAggregate"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("q63_cohort", ["HashAggregate"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # tf-idf: inverted-index build + per-doc top-k window
    ("x_text_tfidf", ["Window", "Generate"], ["CartesianProduct"]),
    # salted agg: two keyed shuffles (partial on (key,salt), final on
    # key), both with map-side combine; no join anywhere. Formatted
    # explain splits the node name and its partitioning across lines, so
    # check the two fragments it actually emits.
    ("x_skew_salted_agg", ["HashAggregate", "Exchange", "hashpartitioning("], ["Join"]),
    # salted join: dim replicated via Generate, fact⋈dim as the forced
    # shuffle join the pattern exists for (broadcast would hide skew)
    ("x_skew_salted_join", ["Generate", "SortMergeJoin"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # round-5 batch 2: MERGE = one target scan + broadcast update join +
    # row-local 1→≤2 Generate; the target side never shuffles
    ("q65_merge_scd2", ["BroadcastHashJoin", "Generate"], ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"]),
    # fuzzy join: blocked equi join (never a cartesian); the length
    # window must sit UNDER the join as a cheap filter
    ("x_dedup_fuzzy_names", ["BroadcastHashJoin"],
     ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # MERGE with delete: the churn/update sets join hint-free and
    # broadcast (AQE by size at fixture scale); never a shuffle of the
    # target, never a nested loop
    ("q66_merge_delete", ["BroadcastHashJoin"],
     ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"]),
    # CDC MERGE over the SCD2 history: update + delete-key joins both
    # hint-free, version explode row-local (Generate)
    ("q67_merge_cdc", ["BroadcastHashJoin", "Generate"],
     ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"]),
    # schema-evolution lifecycle: the FINAL read of the maintained COW
    # table must be a bare pruned parquet scan — all the merge/optimize
    # work happened at write time, none leaks into the read plan
    ("q68_merge_evolve", ["Scan parquet"],
     ["Exchange", "CartesianProduct", "BroadcastNestedLoopJoin"]),
    # change data feed: exceptAll compiles to count-bearing hash
    # aggregates (no join at all) over ONLY the changed partitions
    ("q69_merge_changes", ["HashAggregate", "Scan parquet"],
     ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"]),
    # merge-on-read: ONE data scan + the deletion-vector anti-join,
    # AQE-broadcast at fixture scale (hint-free; a grown vector set
    # may legitimately fall back to shuffle at 100 TB, but at the
    # audited SF a SortMergeJoin would mean AQE missed the sizing)
    ("q70_merge_mor", ["BroadcastHashJoin LeftAnti", "Scan parquet"],
     ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"]),
    # CDF-driven incremental MV: the full-outer delta merge must reuse
    # the aggregation partitioning (both sides keyed on the group col
    # → zero join-side exchanges; Spark cannot broadcast a full outer)
    ("q71_cdf_mv", ["SortMergeJoin FullOuter", "HashAggregate"],
     ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # reservoir: rank-filter window must plan as WindowGroupLimit so
    # each partition keeps only local top-k BEFORE the lang shuffle
    ("x_sample_reservoir", ["WindowGroupLimit"], ["Join"]),
    # heavy hitters: MG candidate pass is MapInArrow (partition-local,
    # no shuffle in, no Arrow↔pandas conversion); exact pass joins the
    # broadcast candidate set — the only BNLJ is the one-row totals
    # build (allowed, as q56)
    ("x_freq_heavy_hitters", ["MapInArrow", "BroadcastHashJoin"], ["CartesianProduct", "SortMergeJoin", "MapInPandas"]),
    # constraint report: every check folds into ONE aggregation pass
    # (count_if conditional aggs + distinct); unpivot is a narrow
    # Expand of the single result row — a per-check pass would be the
    # regression this row guards against
    ("x_validate_orders", ["HashAggregate", "Expand"],
     ["Join", "Window", "BatchEvalPython", "ArrowEvalPython"]),
    # PSI drift: one scan, one bucket agg with two conditional counts;
    # the only BNLJ is the one-row totals build (allowed, as q56)
    ("x_drift_events", ["HashAggregate"],
     ["SortMergeJoin", "CartesianProduct", "Window"]),
    # bigram-LM scoring: vocabulary-bounded count aggs hash-joined back
    # (AQE broadcasts them at this size); the only BNLJ is the one-row
    # V broadcast (allowed, as q56); doc agg is map-side combined
    ("x_text_lm_score", ["HashAggregate", "BroadcastHashJoin", "Generate"],
     ["CartesianProduct"]),
    # BPE application, dictionary form: the merge folds run once per
    # DISTINCT word; documents explode (Generate) and hash-join the
    # broadcast dictionary; one bounded-payload doc_id re-aggregation
    ("x_bpe_segment", ["BroadcastHashJoin", "Generate"],
     ["SortMergeJoin", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"]),
]


# Forced-broadcast audit: per query, the ONLY names allowed inside an
# F.broadcast(...) hint in the function source, each carrying the
# cardinality category that JUSTIFIES the hint. Everything SF-scaled
# (orders, lineitem, customer, supplier, part, per-key aggregates) must
# be hint-free so AQE decides by runtime size — a re-added hint on a
# fact side is a scale regression this check catches mechanically, and
# an allowlist entry without a provably-SF-independent category is
# itself a FAIL (the round-5 q65/q66 loosening class).
#
# Categories (the closed set — see CARDINALITY_CATEGORIES):
#   fixed-dim          nation/region: 25/5 rows at EVERY scale factor
#   one-row            a global-scalar aggregate (exactly 1 row)
#   eval-suite         a fixed benchmark/eval set shipped with the job
#   vocab-bounded      bounded by an explicit vocabulary/merge cap
#   cells-bounded      exactly n_cells / n_tables×n_probes index rows
#   query-literal      derived from the single query point (O(k) rows)
#   bounded-candidates provably ≤ K×partitions rows by construction
BROADCAST_ALLOWED: dict[str, dict[str, str]] = {
    "q7_join_revenue": {"n": "fixed-dim", "r": "fixed-dim"},
    "q30_tpch_q3": {},
    "q33_tpch_q5": {"n": "fixed-dim", "r": "fixed-dim"},
    "q34_tpch_q10": {"n": "fixed-dim"},
    "q35_tpch_q18": {},
    "q37_promo_share": {},
    "q38_supplier_balance": {"n": "fixed-dim"},
    "q41_brand_suppliers": {},
    "q42_tpch_q17": {},
    "q46_tpch_q15": {"max_rev": "one-row"},
    "q48_tpch_q7": {"n1": "fixed-dim", "n2": "fixed-dim"},
    "q49_tpch_q8": {"n1": "fixed-dim", "n2": "fixed-dim", "r": "fixed-dim"},
    "q50_tpch_q12": {},
    "q51_tpch_q19": {},
    "q52_tpch_q21": {},
    "q53_tpch_q22": {"avg_bal": "one-row"},
    "q54_tpch_q2": {"n": "fixed-dim", "r": "fixed-dim"},
    "q55_tpch_q9": {"n": "fixed-dim"},
    "q56_tpch_q11": {"total": "one-row"},
    "q57_tpch_q20": {"n": "fixed-dim"},
    # the benchmark shingle set is a fixed eval suite, not SF-scaled
    "x_corpus_contamination": {"bench": "eval-suite"},
    "x_corpus_clean": {"bench": "eval-suite"},
    "x_pack_sequences": {},
    "x_embed_normalize": {},
    "q58_sessionize": {},
    "q59_rolling_1h": {},
    "x_text_pii_redact": {},
    "x_text_quality_filter": {},
    "x_vocab_topk": {},
    "x_chunk_documents": {},
    "x_dedup_spans": {},
    "x_dedup_span_removal": {},
    # the benchmark gram set is a fixed eval suite, not SF-scaled
    "x_corpus_clean_spans": {"bench": "eval-suite"},
    "x_sim_lsh_neardup": {},
    "x_sample_importance": {},
    "q60_lateral_topn": {},
    "q61_date_spine": {},
    "x_corpus_pipeline": {"bench": "eval-suite"},
    "x_sim_kmeans_step": {"diag": "cells-bounded"},  # exactly n_cells rows
    "x_sim_ivf_topk": {},  # probe is hint-free: pruning, not broadcasting
    "x_sim_ivf_probe": {},  # same hint-free pruned probe
    "x_sim_lsh_topk": {"q": "query-literal", "probes": "cells-bounded"},
    # the rerank broadcast lives in the shared quantization._exact_rerank
    # helper, which EXTRA_BROADCAST_SOURCES folds into these scans;
    # the shortlist is exactly the rerank×k candidate ids
    "x_sim_ivfpq_topk": {"shortlist.select('vec_id')": "query-literal"},
    "x_sim_pq_topk": {"shortlist.select('vec_id')": "query-literal"},
    "x_sim_sq_topk": {},  # hint-free: no joins at all
    "x_sim_nsw_topk": {},  # hint-free: no joins at all
    "x_sim_nsw_probe": {},  # hint-free: no joins at all
    "x_sim_nsw_batch": {},  # hint-free: no joins at all
    "q62_funnel": {},
    "q63_cohort": {},
    "q64_range_hourly": {},  # hint-free: AQE picks broadcast vs SMJ by size
    "x_text_tfidf": {},
    "x_skew_salted_agg": {},
    "x_skew_salted_join": {},
    # MERGE family: HINT-FREE since round 6 — the update/churn sets are
    # ∝ customers at scale (round-5 verdict #1); AQE decides by size
    "q65_merge_scd2": {},
    "q66_merge_delete": {},
    "q67_merge_cdc": {},
    "q68_merge_evolve": {},
    "q69_merge_changes": {},
    "q70_merge_mor": {},  # hint-free: AQE sizes the vector anti-join
    "q71_cdf_mv": {},
    "x_dedup_fuzzy_names": {},  # hint-free: AQE picks by block size
    "x_dedup_lsh_pairs": {},  # hint-free: AQE sizes the hot-tag joins
    "x_sample_reservoir": {},
    "x_freq_heavy_hitters": {
        "candidates": "bounded-candidates",  # ≤ K_COUNTERS×partitions rows
        "totals": "one-row",
    },
    "x_bpe_segment": {"dict_df": "vocab-bounded"},
    "x_text_lm_score": {"vocab": "one-row"},
    "x_validate_orders": {},
    "x_drift_events": {"tot": "one-row"},
}

# The closed set of hint justifications. Every BROADCAST_ALLOWED entry
# MUST carry one of these; anything else (including an empty string, or
# a justification like "small by contract" that merely asserts the
# caller behaves) fails the audit. This is the policy the round-5 q65
# loosening violated: a hint on an SF-scaled frame can never be given
# a category from this set, so it can only land by failing the audit.
CARDINALITY_CATEGORIES = {
    "fixed-dim",
    "one-row",
    "eval-suite",
    "vocab-bounded",
    "cells-bounded",
    "query-literal",
    "bounded-candidates",
}


def audit_broadcast_policy(allowed: dict[str, dict[str, str]]) -> list[str]:
    """Return policy violations in an allowlist: entries whose
    justification is missing or outside CARDINALITY_CATEGORIES.
    Unit-tested in tests/test_extensions.py with a deliberately-hinted
    fact join."""
    bad = []
    for q, hints in allowed.items():
        for name, cat in hints.items():
            if cat not in CARDINALITY_CATEGORIES:
                bad.append(f"{q}: hint `{name}` has no valid cardinality category ({cat!r})")
    return bad


# Per-query shuffle-exchange budget: the number of wide edges each
# headline plan is ALLOWED to have, pinned to the measured count of the
# plan we defend. A query exceeding its budget means someone introduced
# a shuffle (a window where a fold should be, a lost broadcast, a lost
# partial-agg) — the regression class the round-4 IVF defect belonged
# to, now caught mechanically. Budgets are exact today (n == budget for
# every row); they are ceilings, so a plan that gets narrower keeps
# passing.
EXCHANGE_BUDGET: dict[str, int] = {
    "q1_scan_project": 0,
    "q2_filter": 0,
    "q4_agg_tpch_q1": 1,      # one keyed agg shuffle (partial/final)
    "q7_join_revenue": 1,     # dims broadcast; one agg shuffle
    "q10_window_rank": 1,     # the window's partitioning
    "q12_topk": 0,            # TakeOrdered needs no exchange
    "q19_range_join": 1,
    "x_dedup_minhash_sig": 1,  # the cache's one-time RoundRobin spread
    "x_sim_bruteforce_topk": 0,
    "x_sim_lsh_topk": 1,   # the dropDuplicates(vec_id) dedup of multi-bucket hits
    "x_sim_pq_codes": 0,      # pure narrow projection
    "x_sim_pq_topk": 0,       # ADC TakeOrdered + broadcast shortlist re-rank
    "x_sim_ivfpq_topk": 0,    # pruned probe + ADC + broadcast re-rank: no shuffle
    "x_sim_sq_topk": 0,       # stats are a driver literal; scan → dequantize → TakeOrdered
    "p3_enrich_full": 0,
    "q25_array_hof": 0,
    "q26_stats_agg": 1,
    "q28_grouping_sets": 1,   # Expand feeds ONE grouping-id shuffle
    "q29_range_frame": 1,
    "q30_tpch_q3": 1,         # join broadcast; agg reuses its shuffle
    "q31_in_subquery": 0,
    "q33_tpch_q5": 1,
    "q37_promo_share": 1,
    "x_sample_hash_split": 0,
    "x_sample_stratified": 0,
    # the pair-dedup distinct + the deliberate _spread of the
    # single-file fixture scan (a no-op exchange on parallel input)
    "x_dedup_simhash_pairs": 2,
    # adaptive LSH pairs at audit SF (direct mode, no hot buckets):
    # banding cache build + pair-dedup distinct. The mode/hot-bucket
    # stats run as separate bounded jobs, not in this plan.
    "x_dedup_lsh_pairs": 2,
    "q39_tpch_q4": 1,
    "q40_tpch_q6": 1,         # the single global-agg exchange
    "q41_brand_suppliers": 2,
    "q42_tpch_q17": 2,        # per-part avg + final agg
    "q45_tpch_q13": 2,
    "q46_tpch_q15": 3,        # revenue agg, its max, the re-join
    "q47_sliding_window": 1,
    "q48_tpch_q7": 1,
    "q49_tpch_q8": 1,
    "q50_tpch_q12": 1,
    "q51_tpch_q19": 1,
    "q52_tpch_q21": 4,        # semi+anti+exists pipeline, each keyed
    "q53_tpch_q22": 2,
    "q54_tpch_q2": 1,
    "q55_tpch_q9": 1,
    "q56_tpch_q11": 3,
    "q57_tpch_q20": 6,        # nested semi-join chain (Q20's shape)
    "x_pack_sequences": 1,
    "x_corpus_contamination": 3,
    "x_embed_normalize": 0,
    "q58_sessionize": 1,
    "q59_rolling_1h": 1,
    "x_text_pii_redact": 0,
    "x_text_quality_filter": 1,
    "x_vocab_topk": 2,
    "x_chunk_documents": 0,
    "x_dedup_spans": 4,       # inverted-index build + pair agg
    # dup-gram agg + pruned window + removed-starts agg + 2 cache
    # spreads; the extra agg exchange BUYS the window its duplicate-only
    # input (the 6× sf1 win) — measured 5 at sf0.01
    "x_dedup_span_removal": 5,
    "x_sim_lsh_neardup": 2,   # pair dedup; probe/base join broadcasts at fixture SF (measured 1)
    "x_corpus_clean_spans": 4,  # bench distinct + removed-starts agg + cache spreads (measured 4)
    "x_sim_nsw_topk": 1,      # the build's shard repartition; probe itself is exchange-free
    "x_sim_nsw_probe": 0,     # on-disk index scan: no exchange at all
    "x_sim_nsw_batch": 1,     # the per-query top-k Window over candidates
    "x_sample_importance": 0,
    "q60_lateral_topn": 1,
    "q61_date_spine": 1,
    "x_corpus_pipeline": 5,   # the audited two wide stages + quality window chain
    "x_sim_kmeans_step": 3,   # (cell,pos) means, counts, diag — all n_cells-bounded
    "x_sim_ivf_topk": 0,      # pruned probe: NO exchange at all
    "x_sim_ivf_probe": 0,     # steady-state probe: same exchange-free plan
    "x_sim_ivf_incremental": 0,  # same probe over the streaming index
    "q62_funnel": 5,
    "q63_cohort": 4,
    "q64_range_hourly": 1,    # click side broadcast; one agg shuffle

    "x_text_tfidf": 4,
    "x_skew_salted_agg": 3,   # partial-on-(key,salt) + final + presentation sort
    "x_skew_salted_join": 4,
    "q65_merge_scd2": 2,      # update-batch agg, once per MERGE branch
    "q66_merge_delete": 2,    # update agg + churn-set distinct
    # update agg + insert-arm anti-join, plus the delete-key distinct
    # subtree ×2 (round 7: raw CDC feeds repeat deletes, so the set is
    # deduped before the tombstone join AND the insert-arm anti-join —
    # both shuffles move ONLY the delete keys, ∝ deletes never target)
    "q67_merge_cdc": 4,
    "q68_merge_evolve": 0,  # reading the maintained table is scan-only
    "q69_merge_changes": 2,  # one all-column shuffle per diff direction
    "q70_merge_mor": 0,  # scan + broadcast anti-join, no shuffle
    # mv0 agg + one agg per diff direction + delta agg; the FullOuter
    # merge join rides the agg partitioning with no exchange of its own
    "q71_cdf_mv": 4,
    "x_dedup_fuzzy_names": 1,  # the deliberate pre-join probe spread
    "x_sample_reservoir": 1,  # the lang window shuffle (post-WindowGroupLimit)
    "x_freq_heavy_hitters": 3,  # candidate distinct, totals agg, exact agg
    "x_bpe_segment": 3,       # word-freq agg, dictionary agg, doc_id agg
    "x_validate_orders": 2,   # the single global agg (partial/final)
    "x_drift_events": 3,      # bucket agg + the one-row totals agg
    # NOTE: the formatted plan prints the cached bigram-model
    # InMemoryRelation's OWN build subtree (train-pass exchanges that
    # execute once per session, then hit the cache); the executable
    # score path is 4 wide edges (spread, contexts, V, doc agg)
    "x_text_lm_score": 9,
}


def shuffle_exchange_count(plan: str) -> int:
    """Count DISTINCT shuffle Exchange nodes in a formatted plan,
    excluding ``== Initial Plan ==`` subtrees: once a shared cached
    frame has been materialized (earlier audit entry, same session),
    its InMemoryRelation prints an executed AdaptiveSparkPlan carrying
    BOTH the final and the initial plan — one logical shuffle, two
    printed Exchange nodes — and a repeated cached subtree prints its
    nodes once per reference. Unique node ids outside initial-plan
    blocks count each real shuffle exactly once. BroadcastExchange and
    ReusedExchange spell differently and never match."""
    import re

    seen: set[tuple[int, str]] = set()
    skip_indent: int | None = None
    # Numbering scope (round-10 ADVICE adjudication): within ONE
    # explainString("formatted") output, node ids are GLOBAL — a second
    # cached frame's subtree continues the outer numbering (verified
    # empirically on Spark 4.1: frame A cached+referenced twice prints
    # `Exchange (6)` twice under the same `AdaptiveSparkPlan (12)`,
    # while distinct frame B numbers (21)+ with `Exchange (25)`). So a
    # repeated id inside one plan is always a re-printed reference to
    # the SAME cached subtree (dedup is correct), and ids only restart
    # when a caller concatenates several plans — scope the key by the
    # `== Physical Plan ==` header count to keep that case honest.
    scope = 0
    for line in plan.splitlines():
        body = line.lstrip(" :+-*")
        pos = len(line) - len(body)
        if body.startswith("== Physical Plan =="):
            scope += 1
            continue
        if skip_indent is not None:
            # initial-plan children print at the marker's BODY position
            # (the marker line carries a "+- " prefix), so the block is
            # every following line at equal-or-deeper body position
            if body and pos >= skip_indent:
                continue
            skip_indent = None
        if body.startswith("== Initial Plan =="):
            skip_indent = pos
            continue
        m = re.search(r"(?:^|[^A-Za-z])Exchange \((\d+)\)", line)
        if m and "BroadcastExchange" not in line and "ReusedExchange" not in line:
            seen.add((scope, m.group(1)))
    return len(seen)


# helper functions whose source must ALSO be scanned for F.broadcast
# hints when auditing a query — a hint moved into a shared helper must
# not fall outside the audit (round-5 review finding)
def _extra_broadcast_sources() -> dict[str, list]:
    from labs_stream_processing_examples_scala_spark.operators import quantization as QZ
    from labs_stream_processing_examples_scala_spark.operators import similarity as SIM

    from labs_stream_processing_examples_scala_spark.operators import cow_table as CT
    from labs_stream_processing_examples_scala_spark.operators import merge as MG
    from labs_stream_processing_examples_scala_spark.operators import mor_table as MT

    return {
        "x_sim_lsh_topk": [SIM.lsh_topk],
        "x_sim_pq_topk": [QZ.pq_topk, QZ._exact_rerank],
        "x_sim_ivfpq_topk": [QZ._exact_rerank],
        "q65_merge_scd2": [MG.scd2_merge],
        "q67_merge_cdc": [MG.scd2_apply_cdc, MG.scd2_init],
        "q68_merge_evolve": [MG.scd2_merge_cow, CT.optimize_cow],
        "q69_merge_changes": [CT.table_changes],
        "q70_merge_mor": [MT.mor_upsert, MT.read_mor],
        "q71_cdf_mv": [CT.apply_changes_to_agg, CT.aggregate_view, CT.table_changes],
    }


def broadcast_hint_args(fn) -> set[str]:
    """Names passed to F.broadcast(...) in fn's source (AST, not regex)."""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    found: set[str] = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "broadcast"
        ):
            arg = node.args[0] if node.args else None
            if isinstance(arg, ast.Name):
                found.add(arg.id)
            else:
                found.add(ast.unparse(arg) if arg is not None else "?")
    return found


def plan_of(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit")
    qs = entrymod.queries()
    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by tools/plan_audit.py over {sf_dir}. Each plan is",
        "checked for the scale property it must exhibit (pushdown, broadcast,",
        "TakeOrdered, no nested loop, codegen). FAIL lines mean the plan",
        "regressed — treat as a bug.",
        "",
    ]
    failures = 0
    out += ["## Forced-broadcast audit (source-level)", ""]
    policy_bad = audit_broadcast_policy(BROADCAST_ALLOWED)
    for line in policy_bad:
        failures += 1
        print(f"FAIL: policy — {line}")
        out.append(f"- FAIL: policy — {line}")
    extra_sources = _extra_broadcast_sources()
    for name, allowed in sorted(BROADCAST_ALLOWED.items()):
        actual = broadcast_hint_args(qs[name].__wrapped__ if hasattr(qs[name], "__wrapped__") else qs[name])
        for helper in extra_sources.get(name, []):
            actual |= broadcast_hint_args(helper)
        extra = actual - allowed.keys()
        ok = not extra
        failures += 0 if ok else 1
        shown = sorted(f"{n} ({c})" for n, c in allowed.items())
        line = (
            f"{'OK' if ok else 'FAIL'}: {name} broadcast hints {sorted(actual) or '[]'}"
            f" (allowed {shown or '[]'}" + ("" if ok else f"; ILLEGAL {sorted(extra)}") + ")"
        )
        print(line)
        out.append(f"- {line}")
    out.append("")
    for name, must, must_not in AUDITS:
        plan = plan_of(qs[name](spark, sf_dir))
        checks = []
        for frag in must:
            ok = frag in plan
            failures += 0 if ok else 1
            checks.append(f"{'OK' if ok else 'FAIL'}: contains `{frag}`")
        for frag in must_not:
            ok = frag not in plan
            failures += 0 if ok else 1
            checks.append(f"{'OK' if ok else 'FAIL'}: free of `{frag}`")
        n_ex = shuffle_exchange_count(plan)
        budget = EXCHANGE_BUDGET.get(name)
        if budget is None:
            failures += 1
            checks.append(f"FAIL: no exchange budget declared (measured {n_ex})")
        else:
            ok = n_ex <= budget
            failures += 0 if ok else 1
            checks.append(f"{'OK' if ok else 'FAIL'}: exchanges {n_ex}/<={budget}")
        print(f"{name}: " + "; ".join(checks))
        out += [f"## {name}", "", *[f"- {c}" for c in checks], "", "```", plan.strip(), "```", ""]
    # PLANS.md is regenerated wholesale; durable hand-written evidence
    # sections live in PLANS_AQE.md and are re-appended on every run
    aqe = Path("PLANS_AQE.md")
    if aqe.exists():
        out.append("\n" + aqe.read_text())
    Path("PLANS.md").write_text("\n".join(out))
    print(f"\nPLANS.md written; {failures} plan-property failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
