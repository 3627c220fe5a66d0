"""Full-registry oracle gate (VERDICT r2 next-round #1).

The driver's CORRECTNESS gate checks a fixed 50-query list; everything
else in ``__spark_entry__.queries()`` (TPC-H shapes past q39, q58+,
sketches, every x_* LLM-pipeline operator) only has the repo's own
harness as evidence. These tests make that evidence durable:

- every registry entry is re-checked against its DuckDB oracle at
  sf0.001 on every pytest run (so a regression in any of the ~117
  queries fails CI, not just the 50 the driver sees), and
- the committed sf0.01 artifact ``CORRECTNESS_LOCAL.json`` (the
  CURRENT local gate, refreshed per round; per-round history lives in
  the ``CORRECTNESS_LOCAL_r{N}.json`` copies — round-12 self-review:
  refreshing the r9-named file in place misrecorded history) is
  asserted to cover the registry completely, be all-green, and (round
  7) carry a MACHINE-CHECKED bound on every rows-only row — a measured
  recall ≥ floor, a measured tolerance ≤ bound, or a named pytest
  proof that must still exist (so the artifact can't silently rot as
  queries are added, and no rows-only entry is defended by prose).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tools.check_oracle import check_one

REGISTRY = entrymod.queries()
ORACLES = entrymod.oracle_sql()
ARTIFACT = Path(__file__).resolve().parent.parent / "CORRECTNESS_LOCAL.json"


def _green(rec: dict) -> bool:
    return bool(rec["rows_match"] and rec["schema_match"] and rec["hash_match"])


def test_artifact_covers_whole_registry():
    art = json.loads(ARTIFACT.read_text())
    missing = sorted(set(REGISTRY) - set(art))
    assert not missing, f"registry queries absent from {ARTIFACT.name}: {missing}"
    bad = {k: v["err"] for k, v in art.items() if not _green(v)}
    assert not bad, f"non-green artifact rows: {bad}"


def test_artifact_records_ann_recall():
    """The ANN rows-only exemptions must carry a measured recall field
    at or above the pinned floor — the artifact quantifies what
    'rows-only' hides (VERDICT r4 #8)."""
    from tools.check_oracle import RECALL_SPECS

    art = json.loads(ARTIFACT.read_text())
    for name, (_, bound) in RECALL_SPECS.items():
        rec = art[name]
        assert "recall" in rec, f"{name}: artifact row has no recall field"
        assert rec["recall"] >= bound, (
            f"{name}: recall {rec['recall']} below floor {bound}"
        )
        assert rec.get("recall_bound") == bound, f"{name}: stale recall bound"


def test_artifact_rows_only_entries_carry_machine_checked_bounds():
    """Round-7 verdict task #5: every rows-only artifact row must name
    its bound — recall, tolerance, or a pytest proof — and referenced
    proofs must still exist. No prose-only exemptions."""
    from tools.check_oracle import (
        NON_GATING_RECALL,
        PYTEST_REFS,
        RECALL_SPECS,
        TOLERANCE_SPECS,
        _pytest_ref_exists,
    )

    art = json.loads(ARTIFACT.read_text())
    for name, rec in art.items():
        if not (rec.get("err") or "").startswith("rows-only"):
            continue
        if name in NON_GATING_RECALL:
            # non-gating contrast record: its bound is the pinning
            # pytest (dominance invariant), its recall is evidence only
            assert rec.get("pytest_ref") == NON_GATING_RECALL[name][1], name
            assert rec.get("recall") is not None, name
        elif name in RECALL_SPECS:
            assert rec.get("recall") is not None and rec["recall"] >= RECALL_SPECS[name][1], name
        elif name in TOLERANCE_SPECS:
            assert rec.get("tol_err") is not None and rec["tol_err"] <= TOLERANCE_SPECS[name][1], name
        elif name in PYTEST_REFS:
            assert rec.get("pytest_ref") == PYTEST_REFS[name], name
        else:
            raise AssertionError(f"{name}: rows-only without a machine-checked bound")
    for name, ref in PYTEST_REFS.items():
        assert _pytest_ref_exists(ref), f"{name}: missing pytest proof {ref}"


def test_every_query_has_oracle_or_documented_exemption():
    """Rows-only (no oracle SQL) is reserved for genuinely
    non-SQL-expressible ops; keep the list explicit so additions are a
    conscious choice."""
    exempt = {
        # randomized/approximate: HLL sketches and LSH/IVF ANN have
        # tolerance-based pytest oracles instead of exact SQL
        "q36_hll_distinct",
        "q36_hll_rollup",
        "q36_approx_percentile",
        "x_sim_lsh_neardup",
        "x_sim_lsh_neardup_sp",
        "x_sim_nsw_topk",
        # round 9: steady-state + batched probes over the materialized
        # on-disk graph index — same ANN recall-floor exemption
        "x_sim_nsw_probe",
        "x_sim_nsw_batch",
        "x_sim_nsw_incremental",
        "x_sim_lsh_topk",
        "x_sim_lsh_topk_sp",
        "x_sim_ivf_topk",
        # round 12: steady-state probe over the materialized inverted
        # file — proven IDENTICAL to the batch ivf_topk (recall-1.0
        # floor in the artifact + frame equality in test_round12_fixes)
        "x_sim_ivf_probe",
        "x_sim_ivf_trained",
        # streaming-maintained IVF index: probe proven IDENTICAL to the
        # batch ivf_topk (recall-1.0 floor in the artifact + frame
        # equality in tests/test_streaming.py) — same ANN exemption
        "x_sim_ivf_incremental",
        "x_sim_pq_codes",
        "x_sim_pq_topk",
        "x_sim_ivfpq_topk",
        "x_sim_sq_topk",
        # binary decode paths: checked against pure-Python decoders in
        # tests/test_extensions.py, not expressible in DuckDB SQL
        "x_multimodal_features",
        "x_multimodal_resize",
        "x_multimodal_frames",
        "x_multimodal_augment",
        # sketch-partial MV: DataSketches HLL internals are not
        # cross-engine reproducible (the q36 rationale); tolerance
        # test in tests/test_materialized_view.py
        "x_mv_distinct_users",
        # streaming heavy hitters: bounded-error estimates (no exact
        # verify pass by design); bounds pinned in
        # tests/test_materialized_view.py
        "x_mv_heavy_tokens",
        # iterative BPE training loop — not SQL-expressible; exact
        # pure-Python third-engine oracle in tests/test_bpe_merge_freq.py
        "x_bpe_train",
        "x_bpe_segment",
    }
    missing_sql = {k for k in REGISTRY if ORACLES.get(k) is None}
    assert missing_sql == exempt, (
        f"unexpected rows-only queries {sorted(missing_sql - exempt)}; "
        f"stale exemptions {sorted(exempt - missing_sql)}"
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_query_matches_oracle(name, spark, duck):
    rec = check_one(spark, duck, REGISTRY[name], ORACLES.get(name), SF_SMOKE)
    assert _green(rec), rec["err"]


def test_driver_window_samples_every_tier():
    """Round-9 verdict task #2 + round-10 task #6: the driver hashes
    the FIRST 50 registry entries, so that window must (a) be exactly
    the queries() prefix, (b) contain only exact-DuckDB-oracle entries
    (a rows-only entry would surface as `err` to the driver), (c)
    sample every operator tier, and (d) ROTATE its non-core slots with
    the round number so every exact entry earns a driver-side green row
    within a few rounds."""
    import __spark_entry__ as m

    window = m.driver_window()
    assert len(window) == 50 and len(set(window)) == 50
    assert list(m.queries())[:50] == window
    no_oracle = [k for k in window if m.oracle_sql().get(k) is None]
    assert not no_oracle, f"rows-only entries in the driver window: {no_oracle}"
    tiers = dict(m.DRIVER_TIERS)
    tiers["core"] = ("p1_", "s1_", "s4_", "p2_", "p3_", "p4_", "p5_")

    def unsampled(win):
        return [
            tier
            for tier, prefixes in tiers.items()
            if not any(any(w.startswith(p) for p in prefixes) for w in win)
        ]

    assert not unsampled(window), f"driver window misses tiers: {unsampled(window)}"
    # rotation WITH the round-12 feedback loop: each round's window
    # earns green rows, which the LRU filler scheduling then sends to
    # the back of the queue. Simulate that: after each round, its
    # window entries record that round as their latest green.
    reg_keys = list(m._registry())
    oracle_keys = set(m.oracle_sql())
    rnd = m.current_round()
    green = dict(m._driver_green_rounds())
    wins = []
    for r in range(rnd, rnd + 6):
        w = m._build_driver_window(reg_keys, oracle_keys, r, green_rounds=green)
        wins.append(w)
        for k in w:
            green[k] = r
    assert wins[0] == window
    pool = [k for k in reg_keys if k in oracle_keys]
    for a, b in zip(wins, wins[1:]):
        assert a[: len(m.DRIVER_CORE)] == m.DRIVER_CORE
        assert len(a) == 50 == len(set(a))
        assert not unsampled(a)
        diff = len(set(a) ^ set(b)) // 2
        assert diff >= 20, f"rotation too slow: consecutive windows share all but {diff}"
    # convergence: the six simulated rounds leave NOTHING unchecked —
    # the full pass completes and stays complete
    missed = set(pool) - set(green)
    assert not missed, f"rotation starves exact entries: {sorted(missed)}"
    # LRU freshness: after convergence every exact entry's last green
    # row is at most ~5 rounds old (the re-check period)
    stale = [k for k in pool if green[k] < rnd]
    assert not stale, f"entries never re-checked in 6 rounds: {stale}"
    # and the never-checked backlog drains into the very first window
    # (up to the filler capacity)
    backlog = [k for k in pool if k not in m._driver_checked()]
    assert len(set(backlog) & set(window)) >= min(len(backlog), 20)
