"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship enrichment pipeline on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — matching ANSI SQL for the DuckDB oracle.

Column names are aliased identically on both sides (the driver sorts
columns by name before value-hashing). Timestamp outputs are formatted
to 'yyyy-MM-dd' strings on both sides to avoid cross-engine timestamp
canonicalization differences.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark import oracles as O
from labs_stream_processing_examples_scala_spark.functions import errors as E
from labs_stream_processing_examples_scala_spark.functions import text as TX
from labs_stream_processing_examples_scala_spark.multimodal import columns as MM
from labs_stream_processing_examples_scala_spark.operators import bpe as BP
from labs_stream_processing_examples_scala_spark.operators import corpus as CP
from labs_stream_processing_examples_scala_spark.operators import dedup as DD
from labs_stream_processing_examples_scala_spark.operators import frequency as FQ
from labs_stream_processing_examples_scala_spark.operators import graph as GR
from labs_stream_processing_examples_scala_spark.operators import graph_ann as GA
from labs_stream_processing_examples_scala_spark.operators import lm as LM
from labs_stream_processing_examples_scala_spark.operators import merge as MG
from labs_stream_processing_examples_scala_spark.streaming import cdc_ingest as CDC
from labs_stream_processing_examples_scala_spark.streaming import incremental_dedup as ID
from labs_stream_processing_examples_scala_spark.streaming import ivf_ingest as IVI
from labs_stream_processing_examples_scala_spark.streaming import nsw_ingest as NSI
from labs_stream_processing_examples_scala_spark.streaming import materialized_view as MV
from labs_stream_processing_examples_scala_spark.operators import quantization as QZ
from labs_stream_processing_examples_scala_spark.operators import relational as R
from labs_stream_processing_examples_scala_spark.operators import sampling as SMP
from labs_stream_processing_examples_scala_spark.operators import skew as SKW
from labs_stream_processing_examples_scala_spark.operators import sketches as SK
from labs_stream_processing_examples_scala_spark.operators import similarity as SIM
from labs_stream_processing_examples_scala_spark.operators import temporal as TP
from labs_stream_processing_examples_scala_spark.operators import validation as V
from labs_stream_processing_examples_scala_spark.plans import enrichment as P
from labs_stream_processing_examples_scala_spark.sources.batch import load_table

SF0001 = "/root/testdata/sf0.001"


def _messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → the reference's message stream Data(id, value): payload
    synthesized exactly as MessageProcessor.scala:22 (FIXTURES.md §1)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("id"),
        F.concat(F.lit("Input Data: "), F.col("event_id").cast("string")).alias("value"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full enrichment pipeline (P1-P5, J1 select-form, J4)."""
    return P.enrichment_pipeline(_messages(spark, SF0001))


def _s1_tick_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's timer tick (MessageProcessor.scala:21-22) via the
    custom Python DataSource (sources/tick_source.py) — 1000 bounded
    ticks; sf_dir unused (the source fabricates its rows)."""
    from labs_stream_processing_examples_scala_spark.sources import tick_source

    tick_source.register(spark)
    return spark.read.format("tick").option("n", 1000).load()


_QUEUE_DIRS: dict[tuple, str] = {}
_QUEUE_TMP: list[str] = []

import atexit as _atexit  # noqa: E402
import shutil as _shutil  # noqa: E402


@_atexit.register
def _cleanup_queue_tmp() -> None:
    for p in _QUEUE_TMP:
        _shutil.rmtree(p, ignore_errors=True)


def _s4_queue_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9: the broker-shaped queue source, ORACLE-checked (not just
    scenario-tested): the 1000 lowest event_ids published as messages
    into a file-backed fqueue (sources/queue_source.py — the RabbitMQ
    contract, reference README.md:7), read back via format('fqueue').
    The publish is a fixed-size driver-side producer call (1000 rows),
    the read is the parallel per-segment batch scan."""
    import tempfile

    from labs_stream_processing_examples_scala_spark.sources import queue_source as Q

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _QUEUE_DIRS:
        work = tempfile.mkdtemp(prefix="fqueue_reg_")
        _QUEUE_TMP.append(work)
        rows = (
            load_table(spark, sf_dir, "events")
            .select("event_id")
            .orderBy("event_id")
            .limit(1000)
            .collect()
        )
        Q.publish(
            work,
            [(str(r.event_id), f"Input Data: {r.event_id}") for r in rows],
        )
        _QUEUE_DIRS[key] = work
    Q.register(spark)
    return (
        spark.read.format("fqueue")
        .option("path", _QUEUE_DIRS[key])
        .load()
        .select("key", "value")
    )


# --- P-queries: scalar transforms + errors-as-data (FIXTURES.md §4) ---


def _p1_reverse_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _messages(spark, sf_dir)
    return m.select(
        "id",
        "value",
        F.reverse("value").alias("rev"),
        F.upper("value").alias("up"),
    )


def _p2_charsort(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _messages(spark, sf_dir)
    return m.select(
        "id",
        F.concat_ws("", F.array_sort(F.split("value", ""))).alias("charsorted"),
    )


def _p3_enrich_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.enrichment_pipeline(_messages(spark, sf_dir))


def _p3_gather_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.gather_groupby_form(_messages(spark, sf_dir))


def _p4_errors_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = P.enrichment_with_errors(_messages(spark, sf_dir), chaos=True)
    ok, _ = E.split_ok_err(df)
    return ok


def _p4_errors_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = P.enrichment_with_errors(_messages(spark, sf_dir), chaos=True)
    _, bad = E.split_ok_err(df)
    return bad.select(
        "id",
        "value",
        F.col("err.cls").alias("err_cls"),
        F.col("err.msg").alias("err_msg"),
        E.is_temporary(F.col("err")).alias("is_temporary"),
    )


def _p5_malformed_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — schema enforcement at source: rows with (deterministically)
    corrupted JSON parse to null + a populated corrupt-record flag."""
    ev = load_table(spark, sf_dir, "events")
    props2 = F.when(F.col("event_id") % 7 == 0, F.substring("props", 1, 3)).otherwise(
        F.col("props")
    )
    parsed = E.parse_json_strict(props2, "k int")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        parsed.getField("_corrupt_record").isNotNull().alias("is_malformed"),
    )


# The driver's correctness gate hashes the FIRST 50 registry entries
# against their DuckDB oracles, so the window must SAMPLE EVERY TIER
# (round-9 verdict task #2) AND ROTATE (round-10 verdict task #6: only
# 50 of the 130+ exact-oracle entries can earn a driver-side green row
# per round, so the non-core slots rotate deterministically with the
# round number until every exact entry has been driver-checked). Only
# exact-DuckDB-oracle entries qualify (a rows-only entry would surface
# as `err` to the driver); the approximate/stream-only tiers keep their
# proof in the local gate (tools/check_oracle.py) and pytest.

# §2 core operators: always driver-checked (the reference's own surface)
DRIVER_CORE = [
    "p1_reverse_upper", "s1_tick_source", "s4_queue_roundtrip",
    "p2_charsort", "p3_enrich_full", "p3_gather_form",
    "p4_errors_main", "p4_errors_dlq", "p5_malformed_json",
]

# tier → name prefixes (shared with the contract test): each tier keeps
# one rotating representative in every round's window
DRIVER_TIERS = [
    ("relational", ("q1_", "q4_", "q10_")),
    ("tpch", ("q30_", "q35_", "q55_")),
    ("temporal", ("q18_", "q19_", "q58_")),
    ("lakehouse", ("q65_", "q66_", "q67_", "q70_", "q71_")),
    ("streaming-mv", ("x_mv_",)),
    ("cdc", ("x_cdc_",)),
    ("dedup", ("x_dedup_",)),
    ("similarity", ("x_sim_",)),
    ("graph", ("x_graph_",)),
    ("text", ("x_text_",)),
    ("sampling", ("x_sample_",)),
    ("frequency", ("x_freq_",)),
    ("validation", ("x_validate_",)),
    ("multimodal", ("x_multimodal_",)),
    ("skew", ("x_skew_",)),
    ("corpus", ("x_pack_",)),
]


def current_round() -> int:
    """The build round, derived from the driver's own per-round
    artifacts (CORRECTNESS_r{N}.json is written AFTER round N's gate
    runs, so while round N executes the max on disk is N-1). Keeps the
    window rotation deterministic within a round with no side channel."""
    import re as _re
    from pathlib import Path as _Path

    rounds = [
        int(m.group(1))
        for p in _Path(__file__).parent.glob("CORRECTNESS_r*.json")
        if (m := _re.fullmatch(r"CORRECTNESS_r0*(\d+)\.json", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def _driver_green_rounds() -> dict[str, int]:
    """For every entry that has EVER earned a driver-side exact green
    row, the LATEST round it did so — read from the CORRECTNESS_r*.json
    artifacts the driver leaves in the repo dir. Deterministic within a
    round (the driver writes the next artifact only after the round)."""
    import json as _json
    import re as _re
    from pathlib import Path as _Path

    out: dict[str, int] = {}
    for p in _Path(__file__).parent.glob("CORRECTNESS_r*.json"):
        m = _re.fullmatch(r"CORRECTNESS_r0*(\d+)\.json", p.name)
        if not m:
            continue
        r = int(m.group(1))
        try:
            d = _json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for k, v in d.items():
            if isinstance(v, dict) and v.get("hash_match"):
                out[k] = max(out.get(k, -1), r)
    return out


def _driver_checked() -> set[str]:
    """Entries with at least one driver-side exact green row ever."""
    return set(_driver_green_rounds())


def _build_driver_window(
    reg_keys, oracle_keys, rnd: int, green_rounds: dict[str, int] | None = None
) -> list[str]:
    """50 entries: the pinned §2 core, one rotating exact-oracle
    representative per tier, then fillers scheduled LRU — the entries
    whose last driver-side green row is OLDEST go first, never-checked
    entries (last green = -1) ahead of everything (round-12 verdict
    task #5: the blind stride rotation of rounds 10-11 left 26 exact
    entries without a driver-side green row and its r12 slice covered
    none of them). LRU makes the full pass finish in ⌈backlog/~25⌉
    rounds, guarantees consecutive windows share no filler slots, and
    re-checks every exact entry within ~5 rounds forever after."""
    pool = [k for k in reg_keys if k in oracle_keys and k not in DRIVER_CORE]
    window = list(DRIVER_CORE)
    for _tier, prefixes in DRIVER_TIERS:
        members = [
            k
            for k in pool
            if k not in window and any(k.startswith(p) for p in prefixes)
        ]
        if members:
            window.append(members[rnd % len(members)])
    if green_rounds is None:
        green_rounds = _driver_green_rounds()
    rest = [k for k in pool if k not in window]
    order = {k: i for i, k in enumerate(rest)}
    # stalest-first; registry order breaks ties deterministically
    rest.sort(key=lambda k: (green_rounds.get(k, -1), order[k]))
    window.extend(rest[: 50 - len(window)])
    return window


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The full query registry in CANONICAL (family-grouped) order —
    the stable order the window rotation indexes into. queries() serves
    a reordered view with this round's driver window first."""
    reg = {
        # scalar transforms / enrichment pipeline (SURVEY §2.2-2.3, §2.8)
        "p1_reverse_upper": _p1_reverse_upper,
        # S1/S2 tick source as a Spark 4 Python DataSource (batch form;
        # the stream form is scenario-tested in tests/test_streaming.py)
        "s1_tick_source": _s1_tick_source,
        "s4_queue_roundtrip": _s4_queue_roundtrip,
        "p2_charsort": _p2_charsort,
        "p3_enrich_full": _p3_enrich_full,
        "p3_gather_form": _p3_gather_form,
        "p4_errors_main": _p4_errors_main,
        "p4_errors_dlq": _p4_errors_dlq,
        "p5_malformed_json": _p5_malformed_json,
        # relational surface (SURVEY §2.5)
        "q1_scan_project": R.q1_scan_project,
        "q2_filter": R.q2_filter,
        "q3_scalar_json": R.q3_scalar_json,
        "q4_agg_tpch_q1": R.q4_agg_tpch_q1,
        "q5_count_distinct": R.q5_count_distinct,
        "q6_rollup": R.q6_rollup,
        "q7_join_revenue": R.q7_join_revenue,
        "q8_outer_join": R.q8_outer_join,
        "q9_semi_join": R.q9_semi_join,
        "q9_anti_join": R.q9_anti_join,
        "q10_window_rank": R.q10_window_rank,
        "q11_window_running": R.q11_window_running,
        "q12_topk": R.q12_topk,
        "q13_union": R.q13_union,
        "q13_intersect": R.q13_intersect,
        "q13_except": R.q13_except,
        "q14_pivot": R.q14_pivot,
        "q15_unpivot": R.q15_unpivot,
        "q16_percentile": R.q16_percentile,
        "q17_hourly": R.q17_hourly,
        # temporal joins (as-of / range — SURVEY §2.3 absent-join gap)
        "q18_asof_join": TP.clicks_last_view,
        "q19_range_join": TP.big_order_shipments,
        "q20_scalar_subquery": R.q20_scalar_subquery,
        "q21_having": R.q21_having,
        "q22_scalar_funcs": R.q22_scalar_funcs,
        "q23_cube": R.q23_cube,
        "q24_window_navigation": R.q24_window_navigation,
        "q25_array_hof": R.q25_array_hof,
        "q26_stats_agg": R.q26_stats_agg,
        "q27_datetime": R.q27_datetime,
        "q28_grouping_sets": R.q28_grouping_sets,
        "q29_range_frame": R.q29_range_frame,
        "q30_tpch_q3": R.q30_tpch_q3,
        "q31_in_subquery": R.q31_in_subquery,
        "q32_string_funcs": R.q32_string_funcs,
        "q33_tpch_q5": R.q33_tpch_q5,
        "q37_promo_share": R.q37_promo_share,
        "q38_supplier_balance": R.q38_supplier_balance,
        "q34_tpch_q10": R.q34_tpch_q10,
        "q35_tpch_q18": R.q35_tpch_q18,
        "q39_tpch_q4": R.q39_tpch_q4,
        "q43_full_outer": R.q43_full_outer,
        "q44_explode_tokens": R.q44_explode_tokens,
        "q40_tpch_q6": R.q40_tpch_q6,
        "q41_brand_suppliers": R.q41_brand_suppliers,
        "q42_tpch_q17": R.q42_tpch_q17,
        "q45_tpch_q13": R.q45_tpch_q13,
        "q46_tpch_q15": R.q46_tpch_q15,
        "q47_sliding_window": R.q47_sliding_window,
        "q48_tpch_q7": R.q48_tpch_q7,
        "q49_tpch_q8": R.q49_tpch_q8,
        "q50_tpch_q12": R.q50_tpch_q12,
        "q51_tpch_q19": R.q51_tpch_q19,
        "q52_tpch_q21": R.q52_tpch_q21,
        "q53_tpch_q22": R.q53_tpch_q22,
        "q54_tpch_q2": R.q54_tpch_q2,
        "q55_tpch_q9": R.q55_tpch_q9,
        "q56_tpch_q11": R.q56_tpch_q11,
        "q57_tpch_q20": R.q57_tpch_q20,
        "q58_sessionize": TP.user_sessions,
        "q59_rolling_1h": TP.rolling_user_activity,
        "q60_lateral_topn": R.q60_lateral_topn,
        "q61_date_spine": R.q61_date_spine,
        "q62_funnel": TP.conversion_funnel,
        "q63_cohort": TP.cohort_retention,
        "q64_range_hourly": TP.purchase_nearby_clicks,
        # MERGE INTO / SCD2 upsert (lakehouse write path, operators/merge.py)
        "q65_merge_scd2": MG.merge_scd2,
        "q66_merge_delete": MG.merge_with_delete,
        # CDC MERGE over the initialized SCD2 history: named deletes
        # tombstone (close, never reopen), updates close + reopen
        "q67_merge_cdc": MG.merge_cdc,
        # schema evolution + OPTIMIZE lifecycle over the COW target
        # (alter_add_column → pruned MERGE → small-file compaction)
        "q68_merge_evolve": MG.merge_evolve,
        # change data feed between two retained COW versions
        # (hardlink-identity partition pruning + multiset diff)
        "q69_merge_changes": MG.merge_changes,
        # the same MERGE in merge-on-read form: positional deletion
        # vectors + appended files, read through a hint-free anti-join
        "q70_merge_mor": MG.merge_mor,
        # incremental view maintenance from the q69 change feed: the MV
        # advances by deltas only, never re-aggregating the table
        "q71_cdf_mv": MG.merge_cdf_mv,
        # mergeable sketches (no cross-engine oracle → rows-only;
        # tolerance-tested vs exact in tests/test_sketches.py)
        "q36_hll_distinct": SK.hll_distinct_per_group,
        "q36_hll_rollup": SK.hll_mergeable_rollup,
        "q36_approx_percentile": SK.approx_percentiles,
        # LLM-data-pipeline extensions (SURVEY §7 step 7)
        "x_dedup_exact": DD.exact_dedup,
        "x_dedup_minhash_sig": DD.minhash_signatures,
        "x_dedup_lsh_pairs": DD.lsh_candidate_pairs,
        # same pair set discovered incrementally (3 ingest micro-batches
        # against an on-disk LSH index) — equivalence IS the oracle claim
        "x_dedup_incremental": ID.incremental_lsh_pairs,
        # streaming CDC → COW SCD2 table (round 7): 3 disjoint-key
        # micro-batches merged through the manifest-committed sink;
        # EXACT oracle (the q67 UNION with per-batch dates inlined)
        "x_cdc_stream_ingest": CDC.cdc_stream_scd2,
        # the identical stream through the merge-on-read tier — shared
        # exact oracle (tier choice must be invisible to readers)
        "x_cdc_stream_ingest_mor": CDC.cdc_stream_scd2_mor,
        # incremental materialized view: 3-micro-batch ingest + one
        # row-collapsing compaction must serve the batch GROUP BY exactly
        "x_mv_event_stats": MV.incremental_event_stats,
        # sketch-partial MV: distinct users per type via mergeable HLL —
        # approximate → rows-only; tolerance test vs exact distinct
        "x_mv_distinct_users": MV.incremental_distinct_users,
        # streaming heavy hitters: merged MG summaries, bounded error —
        # rows-only; est ≤ true ≤ est+bound pinned by pytest
        "x_mv_heavy_tokens": MV.incremental_heavy_tokens,
        "x_dedup_ngram_pairs": DD.ngram_jaccard_pairs,
        "x_dedup_simhash": DD.simhash,
        "x_dedup_simhash_pairs": DD.simhash_neardup_pairs,
        "x_dedup_lsh_groups": DD.lsh_dedup_groups,
        "x_dedup_lsh_groups2": DD.lsh_dedup_groups_twostar,  # O(log n)-round form
        "x_dedup_keep_first": DD.lsh_dedup_keep_first,
        # centrality over the near-dup graph (5 unrolled power iterations)
        "x_graph_pagerank": GR.pagerank,
        "x_sim_bruteforce_topk": SIM.brute_force_topk,
        "x_sim_neardup_pairs": SIM.cosine_neardup_pairs,
        # DEFAULT near-dup pairs are MULTIPROBE (round-8 verdict task
        # #1: recall 0.356 → 0.90 at sf0.01 thr 0.3, precision still
        # 1.0 — exact verify); single-probe stays as the _sp baseline
        "x_sim_lsh_neardup": SIM.lsh_neardup_pairs,  # multiprobe, floor 0.70
        "x_sim_lsh_neardup_sp": lambda spark, sf: SIM.lsh_neardup_pairs(
            spark, sf, n_probes=1
        ),  # single-probe baseline, floor 0.20
        # DEFAULT LSH top-k is the multiprobe form (round-7 swap: the
        # obvious name must not be the 0.10-recall teaching baseline —
        # round-6 verdict "What's wrong #2"); single-probe stays
        # registered as the documented baseline under the _sp suffix
        "x_sim_lsh_topk": SIM.lsh_topk_multiprobe,  # recall 0.80 ≥ floor 0.50
        "x_sim_lsh_topk_sp": SIM.lsh_topk,  # single-probe baseline, floor 0.10
        "x_sim_ivf_topk": SIM.ivf_topk,  # approximate → rows-only
        # round 12: the steady-state probe over the MATERIALIZED
        # inverted file (the nsw_probe counterpart) — what a probe
        # costs once the index exists; ≡ ivf_topk by construction, so
        # the local gate pins recall 1.0 vs the batch form
        "x_sim_ivf_probe": SIM.ivf_probe_topk,
        "x_sim_ivf_trained": SIM.ivf_topk_trained,  # Lloyd-trained cells → rows-only
        # streaming-maintained index probe ≡ x_sim_ivf_topk exactly
        # (frozen centroids, same scoring) — recall floor 1.0 in the
        # local gate, frame equality in tests/test_streaming.py
        "x_sim_ivf_incremental": IVI.ivf_incremental_topk,
        # streaming-maintained NSW segments (round 8): graphs differ
        # from the batch build's → rows-only with a recall floor
        "x_sim_nsw_incremental": NSI.nsw_incremental_topk,
        # graph-based ANN (round 8): sharded NSW — per-shard greedy
        # graph search + global TakeOrdered merge; rows-only with a
        # machine-checked recall floor like the other ANN tiers
        "x_sim_nsw_topk": GA.nsw_topk,
        # round 9: the steady-state and batched probes over the
        # MATERIALIZED on-disk graph index (build-once-probe-many)
        "x_sim_nsw_probe": GA.nsw_probe_topk,
        "x_sim_nsw_batch": GA.nsw_batch_topk,
        "x_sim_pq_codes": QZ.pq_encode,  # trained codebooks → rows-only (numpy oracle)
        "x_sim_pq_topk": QZ.pq_topk_rerank,  # ADC + exact re-rank → rows-only
        "x_sim_ivfpq_topk": QZ.ivfpq_topk,  # pruned cells × code table → rows-only
        "x_sim_sq_topk": QZ.sq_topk,  # int8 scalar quantization → rows-only
        "x_sim_kmeans_step": SIM.kmeans_step,
        "x_text_stats": TX.token_stats,
        "x_text_quality": TX.quality_score,
        "x_text_langid": TX.lang_id,
        "x_text_langid_ngram": TX.lang_id_ngram,
        "x_text_fingerprint": TX.fingerprint,
        "x_text_repetition": TX.repetition_stats,
        "x_text_quality_filter": TX.quality_filter,
        "x_text_pii_redact": TX.pii_redact,
        "x_vocab_topk": TX.vocab_topk,
        "x_text_tfidf": TX.tfidf_top_terms,
        # bigram-LM perplexity scoring (train + score in one plan)
        "x_text_lm_score": LM.lm_score,
        # data-quality gates: one-pass constraint report + PSI drift
        "x_validate_orders": V.validate_orders,
        "x_drift_events": V.value_drift,
        "x_multimodal_meta": MM.multimodal_meta,
        "x_sample_hash_split": SMP.hash_split,
        "x_sample_stratified": SMP.stratified_sample,
        "x_sample_importance": SMP.importance_resample,
        "x_sample_mixture": SMP.mixture_sample,
        "x_sample_reservoir": SMP.reservoir_sample,
        # two-pass Misra-Gries heavy hitters — approximate technique,
        # exact final answer (superset + exact verify), so exact oracle
        "x_freq_heavy_hitters": FQ.heavy_hitters,
        # BPE tokenizer training/segmentation — iterative, not
        # SQL-expressible → rows-only; exact pure-Python third-engine
        # oracle in tests/test_bpe_merge_freq.py
        "x_bpe_train": BP.bpe_train,
        "x_bpe_segment": BP.bpe_segment,
        "x_dedup_spans": DD.dup_span_stats,
        # span-level dedup TRANSFORM (round 8): duplicated k-gram spans
        # excised keep-first corpus-wide — the Lee et al. rewrite next
        # to the detection stats
        "x_dedup_span_removal": DD.remove_dup_spans,
        # fuzzy (edit-distance) join: blocking key + length window + verify
        "x_dedup_fuzzy_names": DD.fuzzy_name_pairs,
        "x_chunk_documents": CP.chunk_documents,
        # skew mitigation: result must equal the unsalted plain form
        "x_skew_salted_agg": SKW.events_by_type_salted,
        "x_skew_salted_join": SKW.events_by_segment_salted,
        # corpus assembly (packing, decontamination, embedding prep)
        "x_pack_sequences": CP.pack_sequences,
        "x_pack_stats": CP.pack_stats,
        "x_corpus_contamination": CP.contamination_report,
        "x_corpus_clean": CP.decontaminate,
        # span-level decontamination (round 8): benchmark k-grams
        # excised from otherwise-kept docs — the surgical sibling
        "x_corpus_clean_spans": CP.decontaminate_spans,
        "x_corpus_pipeline": CP.corpus_pipeline,
        "x_embed_normalize": CP.embed_normalize,
        # binary→feature/resize/frame over a mixed-modality corpus: real
        # BMP/WAV containers decoded by stdlib codecs (multimodal/codecs.py);
        # rows-only here, exact third-engine oracles in tests/test_extensions.py
        "x_multimodal_features": lambda spark, sf: MM.extract_features(
            MM.synthesize_mixed(MM.binary_documents(spark, sf))
        ),
        "x_multimodal_resize": lambda spark, sf: MM.resize_images(
            MM.synthesize_mixed(MM.binary_documents(spark, sf))
        ),
        "x_multimodal_frames": lambda spark, sf: MM.sample_frames(
            MM.synthesize_mixed(MM.binary_documents(spark, sf))
        ),
        "x_multimodal_augment": lambda spark, sf: MM.augment(
            MM.synthesize_mixed(MM.binary_documents(spark, sf))
        ),
    }
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = _registry()
    window = _build_driver_window(list(reg), set(oracle_sql()), current_round())
    ordered = {k: reg[k] for k in window}
    ordered.update((k, v) for k, v in reg.items() if k not in ordered)
    return ordered


def driver_window() -> list[str]:
    """This round's 50-entry driver correctness window (the queries()
    prefix) — exposed for the contract test and for humans diffing
    rounds."""
    return list(queries())[:50]


# DuckDB-side helpers (inlined per query): v = 'Input Data: ' || event_id;
# charsort = array_to_string(list_sort(string_split(v, '')), '').
_V = "('Input Data: ' || CAST(event_id AS VARCHAR))"
_CSORT = f"array_to_string(list_sort(string_split({_V}, '')), '')"


def oracle_sql() -> dict[str, str]:
    return {
        "s1_tick_source": """
            SELECT CAST(i AS BIGINT) AS id, 'Input Data: ' || i AS value
            FROM generate_series(0, 999) t(i)
        """,
        "s4_queue_roundtrip": """
            SELECT CAST(event_id AS VARCHAR) AS key,
                   'Input Data: ' || CAST(event_id AS VARCHAR) AS value
            FROM (SELECT event_id FROM events ORDER BY event_id LIMIT 1000)
        """,
        "p1_reverse_upper": f"""
            SELECT event_id AS id, {_V} AS value,
                   reverse({_V}) AS rev, upper({_V}) AS up
            FROM events
        """,
        "p2_charsort": f"""
            SELECT event_id AS id, {_CSORT} AS charsorted FROM events
        """,
        "p3_enrich_full": f"""
            SELECT event_id AS id, {_V} AS value,
                   reverse({_V}) AS extra1, upper({_V}) AS extra2,
                   {_CSORT} AS extra3_name,
                   'transformed ' || CAST(event_id AS VARCHAR) AS additional
            FROM events
        """,
        "p3_gather_form": f"""
            SELECT event_id AS id, {_V} AS value,
                   reverse({_V}) AS extra1, upper({_V}) AS extra2,
                   {_CSORT} AS extra3_name,
                   'transformed ' || CAST(event_id AS VARCHAR) AS additional
            FROM events
        """,
        "p4_errors_main": f"""
            SELECT event_id AS id, {_V} AS value,
                   reverse({_V}) AS extra1, upper({_V}) AS extra2,
                   {_CSORT} AS extra3_name,
                   'transformed ' || CAST(event_id AS VARCHAR) AS additional
            FROM events WHERE event_id % 5 <> 0
        """,
        "p4_errors_dlq": f"""
            SELECT event_id AS id, {_V} AS value,
                   CASE WHEN event_id % 10 = 0 THEN 'IOException' ELSE 'Exception' END AS err_cls,
                   'chaos failure for id ' || CAST(event_id AS VARCHAR) AS err_msg,
                   (event_id % 10 = 0) AS is_temporary
            FROM events WHERE event_id % 5 = 0
        """,
        "p5_malformed_json": """
            WITH p AS (
                SELECT event_id,
                       CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 3) ELSE props END AS p2
                FROM events
            )
            SELECT event_id,
                   CASE WHEN json_valid(p2) THEN CAST(json_extract_string(p2, '$.k') AS INT) END AS k_val,
                   NOT json_valid(p2) AS is_malformed
            FROM p
        """,
        "q1_scan_project": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) AS disc_price
            FROM lineitem
        """,
        "q2_filter": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
                   l_extendedprice, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q3_scalar_json": """
            SELECT event_id, upper(event_type) AS type_upper,
                   length(props) AS props_len,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k_val
            FROM events
        """,
        "q4_agg_tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 6) AS sum_qty,
                   round(sum(l_extendedprice), 6) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q5_count_distinct": """
            SELECT count(DISTINCT o_custkey) AS n_custs FROM orders
        """,
        "q6_rollup": """
            SELECT o_orderpriority, o_orderstatus,
                   round(sum(o_totalprice), 6) AS total, count(*) AS n
            FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        """,
        "q7_join_revenue": """
            SELECT r_name, round(sum(o_totalprice), 6) AS revenue, count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "q8_outer_join": """
            SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey, c_name
        """,
        "q9_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "q9_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "q10_window_rank": """
            SELECT o_orderkey, o_custkey,
                   row_number() OVER w AS rn, rank() OVER w AS rnk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "q11_window_running": """
            SELECT o_orderkey, o_custkey,
                   sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total,
                   strftime(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                            '%Y-%m-%d') AS prev_order_date
            FROM orders
        """,
        "q12_topk": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "q13_union": """
            SELECT c_nationkey AS nk FROM customer
            UNION
            SELECT s_nationkey AS nk FROM supplier
        """,
        "q13_intersect": """
            SELECT c_nationkey AS nk FROM customer
            INTERSECT
            SELECT s_nationkey AS nk FROM supplier
        """,
        "q13_except": """
            SELECT c_nationkey AS nk FROM customer
            EXCEPT
            SELECT s_nationkey AS nk FROM supplier
        """,
        "q14_pivot": """
            SELECT l_returnflag,
                   sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_open,
                   sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_filled
            FROM lineitem GROUP BY l_returnflag
        """,
        "q15_unpivot": """
            SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS val FROM lineitem
        """,
        "q16_percentile": """
            SELECT o_orderstatus,
                   quantile_cont(o_totalprice, 0.5) AS p50,
                   quantile_cont(o_totalprice, 0.9) AS p90
            FROM orders GROUP BY o_orderstatus
        """,
        "q17_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, count(*) AS n, sum(value) AS total
            FROM events GROUP BY 1, 2
        """,
        "q18_asof_join": """
            WITH u AS (
                SELECT event_id, user_id, ts, 1 AS side, NULL::BIGINT AS view_id
                FROM events WHERE event_type = 'click'
                UNION ALL
                SELECT NULL, user_id, ts, 0, event_id FROM events WHERE event_type = 'view'
            ),
            c AS (
                SELECT *, last_value(view_id IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts, side, view_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_id
                FROM u
            )
            SELECT event_id, user_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts, last_view_id
            FROM c WHERE side = 1
        """,
        "q19_range_join": """
            SELECT o_orderkey, count(*) AS n_nearby,
                   min(l_orderkey) AS min_lok, max(l_orderkey) AS max_lok
            FROM orders JOIN lineitem
              ON l_shipdate >= o_orderdate - INTERVAL 1 DAY
             AND l_shipdate <= o_orderdate + INTERVAL 1 DAY
            WHERE o_totalprice > 450000
            GROUP BY o_orderkey
        """,
        "q20_scalar_subquery": """
            WITH w AS (
                SELECT o_orderkey, o_custkey, o_totalprice,
                       avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
                FROM orders
            )
            SELECT o_orderkey, o_custkey, o_totalprice, round(cust_avg, 6) AS cust_avg
            FROM w WHERE o_totalprice > cust_avg
        """,
        "q21_having": """
            SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 6) AS total
            FROM orders GROUP BY o_custkey HAVING count(*) >= 15
        """,
        "q22_scalar_funcs": """
            SELECT o_orderkey,
                   substr(o_orderpriority, 1, 1) AS prio_code,
                   lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS padded_key,
                   o_orderstatus || '|' || o_orderpriority AS status_prio,
                   year(o_orderdate) AS yr,
                   month(o_orderdate) AS mo,
                   dayofmonth(o_orderdate) AS dom,
                   round(sqrt(o_totalprice), 6) AS sqrt_price,
                   round(ln(o_totalprice + 1), 6) AS log_price,
                   fmod(o_totalprice, 1000) AS mod_price,
                   CASE o_orderstatus WHEN 'F' THEN 'filled' WHEN 'O' THEN 'open'
                        ELSE 'partial' END AS status_word,
                   coalesce(nullif(o_orderstatus, 'P'), '?') AS status_nz,
                   greatest(o_totalprice, 100000.0) AS floored,
                   abs(o_totalprice - 250000) AS dist_from_250k
            FROM orders
        """,
        "q23_cube": """
            SELECT o_orderstatus, o_orderpriority,
                   round(sum(o_totalprice), 6) AS total, count(*) AS n
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        """,
        "q24_window_navigation": """
            SELECT o_orderkey, o_custkey,
                   first_value(o_orderkey) OVER wall AS first_key,
                   last_value(o_orderkey) OVER wall AS last_key,
                   ntile(4) OVER w AS quartile,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cum_dist,
                   lead(o_orderkey, 1) OVER w AS next_key
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                   wall AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY o_orderkey
        """,
        "q25_array_hof": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), w -> w <> '') AS toks
                FROM documents
            )
            SELECT doc_id,
                   len(toks) AS n_toks,
                   len(list_filter(toks, w -> length(w) > 6)) AS n_long,
                   CAST(coalesce(list_aggregate(list_transform(toks, w -> length(w)), 'sum'), 0) AS BIGINT) AS sum_chars,
                   array_to_string(list_transform(toks[1:3], w -> upper(w)), ' ') AS head3_upper
            FROM t
        """,
        "q26_stats_agg": """
            SELECT l_returnflag,
                   round(stddev_samp(l_extendedprice), 6) AS sd_price,
                   round(var_samp(l_quantity), 6) AS var_qty,
                   round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
                   round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_cov,
                   round(covar_pop(l_quantity, l_extendedprice), 6) AS qty_price_covp,
                   CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
                   bool_or(l_quantity > 49) AS any_bulk,
                   arg_max(l_orderkey, l_extendedprice) AS priciest_order
            FROM lineitem GROUP BY l_returnflag
        """,
        "q27_datetime": """
            SELECT o_orderkey,
                   strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
                   datediff('day', o_orderdate, DATE '1998-06-17') AS age_days,
                   strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
                   dayofweek(o_orderdate) AS dow_sun0,
                   weekofyear(o_orderdate) AS iso_week,
                   quarter(o_orderdate) AS qtr,
                   strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start
            FROM orders
        """,
        "q28_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority,
                   grouping(o_orderstatus) AS g_status,
                   grouping(o_orderpriority) AS g_prio,
                   sum(o_totalprice) AS total, count(*) AS n
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "q29_range_frame": """
            SELECT o_orderkey, o_custkey,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                       RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 6) AS rolling_30d
            FROM orders
        """,
        "q30_tpch_q3": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "q31_in_subquery": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
              AND o_totalprice > 300000
        """,
        "q37_promo_share": """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'ECONOMY'
                                          THEN l_extendedprice * (1 - l_discount)
                                          ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS economy_share_pct,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
        """,
        "q38_supplier_balance": """
            SELECT n_name,
                   count(*) AS n_suppliers,
                   round(avg(s_acctbal), 6) AS avg_bal,
                   round(min(s_acctbal), 6) AS min_bal,
                   round(max(s_acctbal), 6) AS max_bal,
                   CAST(count_if(s_acctbal < 0) AS BIGINT) AS n_negative
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q33_tpch_q5": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "q34_tpch_q10": """
            SELECT c_custkey, c_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "q35_tpch_q18": """
            WITH big AS (
                SELECT l_orderkey, sum(l_quantity) AS sum_qty
                FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
            )
            SELECT c_name, c_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                   o_totalprice, sum_qty
            FROM orders
            JOIN big ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "q39_tpch_q4": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority
        """,
        "q40_tpch_q6": """
            SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue,
                   count(*) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q41_brand_suppliers": """
            SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_size <= 20 AND p_brand <> 'Brand#11'
            GROUP BY p_brand, p_size
        """,
        "q42_tpch_q17": """
            SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly,
                   count(*) AS n_small_lines
            FROM lineitem l
            JOIN (SELECT l_partkey AS ap_partkey, avg(l_quantity) AS avg_qty
                  FROM lineitem GROUP BY l_partkey) a
              ON l.l_partkey = a.ap_partkey
            WHERE l.l_quantity < 0.2 * a.avg_qty
        """,
        "q43_full_outer": """
            SELECT coalesce(nk_c, nk_s) AS nationkey,
                   coalesce(n_customers, 0) AS n_customers,
                   coalesce(n_suppliers, 0) AS n_suppliers
            FROM (SELECT c_nationkey AS nk_c, count(*) AS n_customers
                  FROM customer GROUP BY c_nationkey) c
            FULL OUTER JOIN
                 (SELECT s_nationkey AS nk_s, count(*) AS n_suppliers
                  FROM supplier GROUP BY s_nationkey) s
              ON nk_c = nk_s
        """,
        "q44_explode_tokens": """
            SELECT token, count(*) AS n_occurrences
            FROM (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS token
                  FROM documents)
            WHERE length(token) > 5
            GROUP BY token
        """,
        "q47_sliding_window": """
            WITH assigned AS (
                SELECT date_trunc('hour', ts) AS win_start, event_type, value
                FROM events
                UNION ALL
                SELECT date_trunc('hour', ts - INTERVAL 30 MINUTE) + INTERVAL 30 MINUTE
                           AS win_start, event_type, value
                FROM events
            )
            SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
                   event_type, count(*) AS n, round(sum(value), 6) AS total
            FROM assigned GROUP BY 1, 2
        """,
        "q48_tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        "q49_tpch_q8": """
            SELECT year(o_orderdate) AS o_year,
                   round(sum(CASE WHEN n1.n_name = 'NATION_2'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_volume
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            WHERE p_type = 'PROMO' AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY 1
        """,
        "q50_tpch_q12": """
            SELECT l_linestatus,
                   count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
                       AS high_line_count,
                   count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                       AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY
            GROUP BY 1
        """,
        "q51_tpch_q19": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
                   count(*) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q52_tpch_q21": """
            WITH lines AS (
                SELECT l_orderkey, l_suppkey,
                       l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            )
            SELECT s_name, count(*) AS numwait
            FROM lines l1 JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE l1.late
              AND EXISTS (SELECT 1 FROM lines l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lines l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 10
        """,
        "q53_tpch_q22": """
            WITH eligible AS (
                SELECT * FROM customer
                WHERE c_nationkey IN (1, 3, 5, 7, 11, 13, 17)
            )
            SELECT c_nationkey, count(*) AS numcust,
                   round(sum(c_acctbal), 6) AS totacctbal
            FROM eligible c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM eligible
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c.c_custkey
                                AND o_orderdate >= TIMESTAMP '1999-01-01')
            GROUP BY 1
        """,
        "q54_tpch_q2": """
            WITH offers AS (
                SELECT p_partkey, p_brand, s_suppkey, s_name, n_name,
                       l_extendedprice / l_quantity AS unit_price
                FROM lineitem
                JOIN part     ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
                JOIN region   ON n_regionkey = r_regionkey
                WHERE p_size <= 10 AND r_name = 'ASIA'
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY p_partkey
                                             ORDER BY unit_price, s_suppkey) AS rn
                FROM offers
            )
            SELECT p_partkey, p_brand, s_suppkey, s_name, n_name,
                   round(unit_price, 6) AS min_unit_price
            FROM ranked WHERE rn = 1
        """,
        "q55_tpch_q9": """
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity), 6) AS sum_profit
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%g%'
            GROUP BY 1, 2
        """,
        "q56_tpch_q11": """
            WITH per_part AS (
                SELECT l_partkey,
                       sum(l_extendedprice * (1 - l_discount)) AS part_value
                FROM lineitem GROUP BY l_partkey
            )
            SELECT l_partkey, round(part_value, 6) AS part_value
            FROM per_part
            WHERE part_value > 0.0005 * (SELECT sum(part_value) FROM per_part)
        """,
        "q57_tpch_q20": """
            WITH shipped AS (
                SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE '%g%'
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1997-01-01'
                GROUP BY l_suppkey, l_partkey
            ),
            thr AS (
                SELECT l_partkey AS t_partkey, avg(qty) * 1.5 AS thr
                FROM shipped GROUP BY l_partkey
            )
            SELECT s_suppkey, s_name, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
                SELECT l_suppkey FROM shipped JOIN thr ON l_partkey = t_partkey
                WHERE qty > thr
            )
        """,
        "q58_sessionize": """
            WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN epoch_us(ts)
                                 - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                                 >= 1800000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
            ),
            numbered AS (
                SELECT user_id, ts, value,
                       CAST(sum(new_sess) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS BIGINT) AS session_id
                FROM flagged
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                   round(sum(value), 6) AS sum_value
            FROM numbered
            GROUP BY user_id, session_id
        """,
        "q59_rolling_1h": """
            SELECT event_id, user_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                   count(*) OVER w AS n_trailing,
                   round(sum(value) OVER w, 6) AS sum_trailing
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """,
        "q60_lateral_topn": """
            SELECT n.n_name, l.s_suppkey, l.s_acctbal
            FROM nation n,
            LATERAL (
                SELECT s_suppkey, s_acctbal
                FROM supplier s
                WHERE s.s_nationkey = n.n_nationkey
                ORDER BY s_acctbal DESC, s_suppkey
                LIMIT 2
            ) l
        """,
        "q61_date_spine": R.__dict__["_DATE_SPINE_SQL"],
        "q62_funnel": O.funnel(),
        "q63_cohort": O.cohort(),
        "q64_range_hourly": """
            SELECT p.event_id AS purchase_id, count(*) AS n_clicks,
                   min(c.event_id) AS min_click, max(c.event_id) AS max_click
            FROM events p JOIN events c
              ON c.user_id = p.user_id
             AND c.ts >= p.ts - INTERVAL 1 HOUR
             AND c.ts <= p.ts + INTERVAL 1 HOUR
            WHERE p.event_type = 'purchase' AND c.event_type = 'click'
            GROUP BY p.event_id
        """,
        "q65_merge_scd2": """
            WITH upd AS (
                SELECT o_custkey AS u_key, max(o_totalprice) AS new_bal
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-06-01'
                GROUP BY 1
            )
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal,
                   '1992-01-01' AS valid_from,
                   CASE WHEN u_key IS NOT NULL THEN '1997-06-01' END AS valid_to,
                   u_key IS NULL AS is_current
            FROM customer LEFT JOIN upd ON c_custkey = u_key
            UNION ALL
            SELECT u_key, c_name, round(new_bal, 6), '1997-06-01', NULL, true
            FROM upd JOIN customer ON c_custkey = u_key
            UNION ALL
            SELECT u_key, NULL, round(new_bal, 6), '1997-06-01', NULL, true
            FROM upd u
            WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = u.u_key)
        """,
        "q66_merge_delete": """
            WITH upd AS (
                SELECT o_custkey AS u_key, max(o_totalprice) AS new_bal
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '2001-01-01'
                GROUP BY 1
            ),
            active AS (SELECT DISTINCT o_custkey AS a_key FROM orders
                       WHERE o_orderdate >= TIMESTAMP '2000-06-01')
            SELECT c_custkey, c_name,
                   round(CASE WHEN a_key IS NOT NULL AND u_key IS NOT NULL
                              THEN new_bal ELSE c_acctbal END, 6) AS acctbal,
                   CASE WHEN a_key IS NULL THEN 'delete'
                        WHEN u_key IS NOT NULL THEN 'update'
                        ELSE 'keep' END AS op
            FROM customer
            LEFT JOIN upd ON c_custkey = u_key
            LEFT JOIN active ON c_custkey = a_key
        """,
        "q67_merge_cdc": """
            WITH upd AS (
                SELECT o_custkey AS u_key, max(o_totalprice) AS new_bal
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-06-01'
                GROUP BY 1
            ),
            dels AS (
                SELECT c_custkey AS d_key FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
            )
            -- deleted current rows: closed, never reopened (tombstone)
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal,
                   '1992-01-01' AS valid_from, '1997-06-01' AS valid_to,
                   false AS is_current
            FROM customer JOIN dels ON c_custkey = d_key
            UNION ALL
            -- updated current rows: closed old version...
            SELECT c_custkey, c_name, round(c_acctbal, 6),
                   '1992-01-01', '1997-06-01', false
            FROM customer JOIN upd ON c_custkey = u_key
            WHERE c_custkey NOT IN (SELECT d_key FROM dels)
            UNION ALL
            -- ...plus the reopened new version
            SELECT c_custkey, c_name, round(new_bal, 6),
                   '1997-06-01', NULL, true
            FROM customer JOIN upd ON c_custkey = u_key
            WHERE c_custkey NOT IN (SELECT d_key FROM dels)
            UNION ALL
            -- untouched current rows carry
            SELECT c_custkey, c_name, round(c_acctbal, 6),
                   '1992-01-01', NULL, true
            FROM customer
            WHERE c_custkey NOT IN (SELECT d_key FROM dels)
              AND c_custkey NOT IN (SELECT u_key FROM upd)
        """,
        "q68_merge_evolve": """
            WITH upd AS (
                SELECT o_custkey AS u_key, max(o_totalprice) AS new_bal
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-06-01'
                GROUP BY 1
            )
            -- current/closed rows of every customer: tier is f(ORIGINAL
            -- balance) — projected by the reader over pre-alter files,
            -- materialized by the merge in rewritten partitions
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal,
                   CASE WHEN c_acctbal >= 5000 THEN 'high' ELSE 'std' END
                       AS acct_tier,
                   '1992-01-01' AS valid_from,
                   CASE WHEN u_key IS NOT NULL THEN '1997-06-01' END AS valid_to,
                   u_key IS NULL AS is_current
            FROM customer LEFT JOIN upd ON c_custkey = u_key
            UNION ALL
            -- reopened versions CARRY the tier of the closed row
            -- (f(old balance), not f(new)) — the SCD2 carry contract
            SELECT u_key, c_name, round(new_bal, 6),
                   CASE WHEN c_acctbal >= 5000 THEN 'high' ELSE 'std' END,
                   '1997-06-01', NULL, true
            FROM upd JOIN customer ON c_custkey = u_key
        """,
        "q69_merge_changes": """
            WITH upd AS (
                SELECT o_custkey AS u_key, max(o_totalprice) AS new_bal
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-06-01'
                GROUP BY 1
            )
            -- the pre-merge open row of each updated key was replaced
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal,
                   '1992-01-01' AS valid_from, NULL AS valid_to,
                   true AS is_current, 'delete' AS change_type
            FROM customer JOIN upd ON c_custkey = u_key
            UNION ALL
            -- ...by its closed version...
            SELECT c_custkey, c_name, round(c_acctbal, 6),
                   '1992-01-01', '1997-06-01', false, 'insert'
            FROM customer JOIN upd ON c_custkey = u_key
            UNION ALL
            -- ...and the reopened new version
            SELECT c_custkey, c_name, round(new_bal, 6),
                   '1997-06-01', NULL, true, 'insert'
            FROM customer JOIN upd ON c_custkey = u_key
        """,
        "q70_merge_mor": """
            WITH upd AS (
                SELECT o_custkey AS u_key, max(o_totalprice) AS new_bal
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-06-01'
                GROUP BY 1
            )
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal,
                   '1992-01-01' AS valid_from,
                   CASE WHEN u_key IS NOT NULL THEN '1997-06-01' END AS valid_to,
                   u_key IS NULL AS is_current
            FROM customer LEFT JOIN upd ON c_custkey = u_key
            UNION ALL
            SELECT u_key, c_name, round(new_bal, 6), '1997-06-01', NULL, true
            FROM upd JOIN customer ON c_custkey = u_key
            UNION ALL
            SELECT u_key, NULL, round(new_bal, 6), '1997-06-01', NULL, true
            FROM upd u
            WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = u.u_key)
        """,
        "q71_cdf_mv": """
            WITH upd AS (
                SELECT o_custkey AS u_key, max(o_totalprice) AS new_bal
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-06-01'
                GROUP BY 1
            ),
            merged AS (
                -- closed-or-kept version of every customer...
                SELECT c_mktsegment,
                       c_acctbal AS bal,
                       u_key IS NULL AS is_current
                FROM customer LEFT JOIN upd ON c_custkey = u_key
                UNION ALL
                -- ...plus the reopened version of each updated key
                SELECT c_mktsegment, new_bal, true
                FROM upd JOIN customer ON c_custkey = u_key
            )
            SELECT c_mktsegment,
                   count(*)::BIGINT AS n_versions,
                   sum(CASE WHEN is_current THEN 1 ELSE 0 END)::BIGINT AS n_open,
                   round(sum(CASE WHEN is_current THEN bal ELSE 0 END), 4) AS open_bal
            FROM merged GROUP BY c_mktsegment
        """,
        "x_cdc_stream_ingest": """
            WITH upd AS (
                SELECT o_custkey AS u_key, max(o_totalprice) AS new_bal
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-06-01'
                GROUP BY 1
            ),
            dels AS (
                SELECT c_custkey AS d_key FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
            ),
            dates AS (
                SELECT * FROM (VALUES (0, '1997-06-01'), (1, '1998-06-01'),
                                      (2, '1999-06-01')) AS t(i, d)
            )
            -- deleted at their batch's effective date: tombstone
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal,
                   '1992-01-01' AS valid_from,
                   (SELECT d FROM dates WHERE i = c_custkey % 3) AS valid_to,
                   false AS is_current
            FROM customer JOIN dels ON c_custkey = d_key
            UNION ALL
            -- updated at their batch's date: closed old version...
            SELECT c_custkey, c_name, round(c_acctbal, 6),
                   '1992-01-01',
                   (SELECT d FROM dates WHERE i = c_custkey % 3), false
            FROM customer JOIN upd ON c_custkey = u_key
            UNION ALL
            -- ...plus the reopened new version
            SELECT c_custkey, c_name, round(new_bal, 6),
                   (SELECT d FROM dates WHERE i = c_custkey % 3), NULL, true
            FROM customer JOIN upd ON c_custkey = u_key
            UNION ALL
            -- untouched current rows carry
            SELECT c_custkey, c_name, round(c_acctbal, 6),
                   '1992-01-01', NULL, true
            FROM customer
            WHERE c_custkey NOT IN (SELECT d_key FROM dels)
              AND c_custkey NOT IN (SELECT u_key FROM upd)
        """,
        "x_cdc_stream_ingest_mor": """
            WITH upd AS (
                SELECT o_custkey AS u_key, max(o_totalprice) AS new_bal
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-06-01'
                GROUP BY 1
            ),
            dels AS (
                SELECT c_custkey AS d_key FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
            ),
            dates AS (
                SELECT * FROM (VALUES (0, '1997-06-01'), (1, '1998-06-01'),
                                      (2, '1999-06-01')) AS t(i, d)
            )
            -- deleted at their batch's effective date: tombstone
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal,
                   '1992-01-01' AS valid_from,
                   (SELECT d FROM dates WHERE i = c_custkey % 3) AS valid_to,
                   false AS is_current
            FROM customer JOIN dels ON c_custkey = d_key
            UNION ALL
            -- updated at their batch's date: closed old version...
            SELECT c_custkey, c_name, round(c_acctbal, 6),
                   '1992-01-01',
                   (SELECT d FROM dates WHERE i = c_custkey % 3), false
            FROM customer JOIN upd ON c_custkey = u_key
            UNION ALL
            -- ...plus the reopened new version
            SELECT c_custkey, c_name, round(new_bal, 6),
                   (SELECT d FROM dates WHERE i = c_custkey % 3), NULL, true
            FROM customer JOIN upd ON c_custkey = u_key
            UNION ALL
            -- untouched current rows carry
            SELECT c_custkey, c_name, round(c_acctbal, 6),
                   '1992-01-01', NULL, true
            FROM customer
            WHERE c_custkey NOT IN (SELECT d_key FROM dels)
              AND c_custkey NOT IN (SELECT u_key FROM upd)
        """,
        "q45_tpch_q13": """
            SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                  GROUP BY c_custkey)
            GROUP BY c_count
        """,
        "q46_tpch_q15": """
            WITH rev AS (
                SELECT l_suppkey AS supplier_no,
                       round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON supplier_no = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "q32_string_funcs": """
            SELECT p_partkey,
                   levenshtein(p_brand, 'Brand#33') AS brand_dist,
                   split_part(p_name, ' ', 1) AS first_word,
                   strpos(p_name, 'e') AS e_pos,
                   repeat(p_brand, 2) AS brand2,
                   CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
                   regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                   md5(p_name) AS name_md5,
                   sha256(p_type) AS type_sha,
                   ascii(p_name) AS first_ascii
            FROM part
        """,
        # extensions (SQL rendered from the same constants as the Spark
        # expressions — labs_stream_processing_examples_scala_spark/oracles.py). x_sim_lsh_topk /
        # x_sim_ivf_topk are approximate and x_multimodal_features is a
        # pandas-UDF pipeline: intentionally no oracle (rows-only check);
        # recall/determinism are covered by tests/test_extensions.py.
        "x_dedup_exact": O.dedup_exact(),
        "x_dedup_minhash_sig": O.dedup_minhash_signatures(),
        "x_dedup_lsh_pairs": O.dedup_lsh_pairs(),
        "x_dedup_incremental": O.dedup_lsh_pairs(),
        "x_mv_event_stats": MV.event_stats_oracle_sql(),
        "x_dedup_ngram_pairs": O.dedup_ngram_pairs(),
        "x_dedup_simhash": O.dedup_simhash(),
        "x_dedup_simhash_pairs": O.dedup_simhash_neardup_pairs(),
        "x_dedup_lsh_groups": O.dedup_lsh_components(),
        "x_dedup_lsh_groups2": O.dedup_lsh_components(),
        "x_dedup_keep_first": f"""
            WITH comp AS ({O.dedup_lsh_components()})
            SELECT * FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> rep_id)
        """,
        "x_graph_pagerank": GR.pagerank_oracle_sql(),
        "x_sim_bruteforce_topk": O.sim_bruteforce_topk(),
        "x_sim_neardup_pairs": O.sim_neardup_pairs(),
        "x_sim_kmeans_step": O.sim_kmeans_step(),
        "x_text_stats": O.text_stats(),
        "x_text_quality": O.text_quality(),
        "x_text_langid": O.text_langid(),
        "x_text_langid_ngram": O.text_langid_ngram(),
        "x_text_fingerprint": O.text_fingerprint(),
        "x_text_repetition": O.text_repetition(),
        "x_text_quality_filter": O.text_quality_filter(),
        "x_text_pii_redact": O.text_pii_redact(),
        "x_vocab_topk": O.text_vocab_topk(),
        "x_text_tfidf": O.text_tfidf(),
        "x_text_lm_score": LM.lm_score_oracle_sql(),
        "x_validate_orders": V.validate_orders_oracle_sql(),
        "x_drift_events": V.value_drift_oracle_sql(),
        "x_sample_importance": O.sampling_importance_resample(),
        "x_sample_mixture": O.sampling_mixture(),
        "x_sample_reservoir": O.sampling_reservoir(),
        "x_freq_heavy_hitters": FQ.heavy_hitters_oracle_sql(),
        "x_dedup_spans": O.dedup_span_stats(),
        "x_dedup_span_removal": O.dedup_span_removal(),
        # the length window is NOT restated here: with window == dist it
        # is implied by the levenshtein bound, so the oracle checks the
        # advertised contract (every pair with edit_distance <= d),
        # which a lossy pre-filter on the Spark side would now fail
        "x_dedup_fuzzy_names": f"""
            SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
                   levenshtein(a.p_name, b.p_name) AS edit_distance
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= {DD.FUZZY_MAX_DIST}
        """,
        "x_chunk_documents": O.corpus_chunks(),
        "x_skew_salted_agg": SKW.events_by_type_salted_oracle(),
        "x_skew_salted_join": SKW.events_by_segment_salted_oracle(),
        "x_multimodal_meta": O.multimodal_meta(),
        "x_sample_hash_split": O.sampling_hash_split(),
        "x_sample_stratified": O.sampling_stratified(),
        "x_pack_sequences": O.pack_sequences(),
        "x_pack_stats": O.pack_stats(),
        "x_corpus_contamination": O.contamination_report(),
        "x_corpus_clean": O.decontaminate(),
        "x_corpus_clean_spans": O.decontaminate_spans(),
        "x_corpus_pipeline": O.corpus_pipeline(),
        "x_embed_normalize": O.embed_normalize(),
    }
