"""Regression tests for the round-14 fixes: the four round-13 ADVICE
findings (round-tie adjudication unit clamp, schema-gated adjudication,
hardcoded tool paths in a test, stale _offsets sidecar accumulation)."""

from __future__ import annotations

import os


# --- ADVICE 1: _round_tie_ok let ROUND(x, 0) adjudicate ±1.0 bands -----


def test_round_tie_requires_exact_unit_delta():
    """A genuine round-tie divergence produces float cells exactly one
    unit of a ROUND precision apart (the two engines rounded a tie the
    two ways); anything else — notably a sub-unit drift under a coarse
    ROUND(x, 0) from a scalar num_expr — must stay a real mismatch
    (round-13 ADVICE: the old ≤unit band masked diffs up to ±1.0)."""
    from tools.query_fuzz import _round_tie_ok

    sql0 = "SELECT ROUND(CAST(x AS DOUBLE), 0) AS c0 FROM t"
    # sub-unit drift under a 0-digit ROUND: NOT a tie, must not adjudicate
    assert not _round_tie_ok(sql0, [("3.400000",)], [("3.000000",)])
    # exactly one unit at precision 0: the tie shape, adjudicates
    assert _round_tie_ok(sql0, [("3.000000",)], [("4.000000",)])
    sql3 = "SELECT ROUND(SUM(CAST(x AS DOUBLE)), 3) AS c0 FROM t"
    assert _round_tie_ok(sql3, [("1810.449000",)], [("1810.450000",)])
    # two units apart is not a tie either
    assert not _round_tie_ok(sql3, [("1810.448000",)], [("1810.450000",)])
    # equal rows trivially pair (delta 0)
    assert _round_tie_ok(sql3, [("7.125000",)], [("7.125000",)])


def test_round_tie_mixed_precisions_use_exact_units():
    """With several ROUND precisions in one query, a delta must equal
    one of THEIR units exactly — not merely sit under the coarsest."""
    from tools.query_fuzz import _round_tie_ok

    sql = (
        "SELECT ROUND(CAST(x AS DOUBLE), 1) AS c0, "
        "ROUND(SUM(CAST(y AS DOUBLE)), 3) AS c1 FROM t GROUP BY x"
    )
    # 0.001 (the 3-dp unit) and 0.1 (the 1-dp unit) both adjudicate
    assert _round_tie_ok(sql, [("2.100000", "5.001000")], [("2.200000", "5.000000")])
    # 0.05 is neither unit: real mismatch
    assert not _round_tie_ok(sql, [("2.150000", "5.000000")], [("2.200000", "5.000000")])


def test_round_precision_extraction_paren_balanced():
    """ROUND precisions must come from the call's REAL last argument:
    the old regex grabbed NULLIF's `, 0)` inside
    ``ROUND(x / NULLIF(y, 0), 1)`` (seed 27 #196, the original
    round-tie find, stopped adjudicating under the exact-unit rule
    until this parser replaced the regex)."""
    from tools.query_fuzz import _round_precisions, _round_tie_ok

    sql = (
        "SELECT l_orderkey AS k0, ROUND((CAST(l_extendedprice AS DOUBLE) "
        "/ NULLIF(CAST(l_suppkey AS DOUBLE), 0)), 1) AS c0 FROM lineitem"
    )
    assert _round_precisions(sql) == {1}
    # the seed-27 tie itself: 1810.4 vs 1810.5 at precision 1 adjudicates
    assert _round_tie_ok(sql, [("1810.400000", "4784")], [("1810.500000", "4784")])
    # nested ROUND calls both surface
    assert _round_precisions("ROUND(ROUND(x, 3) + y, 1)") == {1, 3}
    # non-integer precision argument (expression) contributes nothing
    assert _round_precisions("ROUND(x, 1 + 1)") == set()


# --- ADVICE 2: adjudication applied to column-schema mismatches --------


def test_adjudicate_round_tie_gated_on_schema_match():
    """A schema divergence whose row values happen to pair within one
    ROUND unit must stay a finding — the round-tie arm only applies to
    same-schema results (round-13 ADVICE)."""
    from tools.query_fuzz import _adjudicate

    sql = "SELECT ROUND(CAST(x AS DOUBLE), 3) AS c0 FROM t"
    srows, drows = [("1.449000",)], [("1.450000",)]
    assert _adjudicate(sql, 1, 1, srows, drows, cols_match=True) == "round-tie-convention"
    assert _adjudicate(sql, 1, 1, srows, drows, cols_match=False) is None
    # the grouping-sets arm is shape-based (0 vs 1 rows) and unaffected
    gs = "SELECT r_name, COUNT(*) AS c0 FROM region WHERE 1=0 GROUP BY ROLLUP(r_name)"
    assert _adjudicate(gs, 0, 1, cols_match=False) == "spark-empty-grouping-sets"


# --- ADVICE 4: retention left _offsets sidecars behind forever ---------


def test_purge_removes_offsets_sidecar(tmp_path):
    """_purge_segment truncates the data and must also unlink the
    segment's seek-index sidecar (round-13 ADVICE: stale _offsets files
    otherwise accumulate unboundedly on long-lived queues)."""
    from labs_stream_processing_examples_scala_spark.sources import queue_source as QS

    qdir = str(tmp_path / "q")
    seg = QS.publish(qdir, [("k", f"v{i}") for i in range(10)])
    # simulate a reader having built the seek index for this segment
    size = os.path.getsize(QS._seg_path(qdir, seg))
    QS._atomic_write(QS._offsets_path(qdir, seg), f"{size}:{QS._OFFSET_EVERY}:0")
    assert os.path.exists(QS._offsets_path(qdir, seg))
    assert QS._purge_segment(qdir, seg)
    assert not os.path.exists(QS._offsets_path(qdir, seg))
    # idempotent second purge (already empty) must not raise either
    assert not QS._purge_segment(qdir, seg)
