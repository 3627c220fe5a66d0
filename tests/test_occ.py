"""Optimistic concurrency for generational commits (round 7).

The writer lock serializes the COMMIT CRITICAL SECTION only; a COW
merge's planning (read + join) runs outside it, so two writers can
plan against the same base version and commit one after the other.
``commit_generation(base_version=...)`` resolves that race the Delta/
Iceberg way: every commit records its written-partition footprint in a
retention-independent ``_log/``; a commit whose base is stale checks
the interleaved footprints and either REBASES for free (disjoint —
untouched partitions hardlink from the new live, identical to a serial
execution) or raises CommitConflictError for a re-plan (the merge
wrappers retry automatically). Unknown footprints conflict: fail-safe.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import labs_stream_processing_examples_scala_spark.operators.cow_table as CT
import labs_stream_processing_examples_scala_spark.operators.merge as MG
import labs_stream_processing_examples_scala_spark.operators.mor_table as MT


def _init(spark, path, n=24, parts=("A", "B", "C")):
    rows = [(k, parts[k % len(parts)], float(k)) for k in range(n)]
    df = spark.createDataFrame(rows, "k long, p string, val double")
    CT.cow_init(MG.scd2_init(df), path, "p")
    return df


def _upd(spark, pairs):
    return spark.createDataFrame(pairs, "u_key long, new_val double")


def _rows(spark, path):
    return frozenset(
        tuple(r)
        for r in CT.read_cow(spark, path)
        .select("k", "p", "val", "valid_from", "valid_to", "is_current")
        .collect()
    )


def _plan(spark, path, pairs, date):
    """A writer's UNCOMMITTED plan: the pruned SCD2 rewrite and the
    base version it resolved — exactly what scd2_merge_cow computes
    before its commit call."""
    upd = _upd(spark, pairs)
    keys = upd.select(F.col("u_key").alias("__uk"))
    _, pruned, touched, _null, base = MG._cow_touched(
        spark, path, keys, keys, "k", "p"
    )
    out = MG.scd2_apply(pruned, upd, "k", "u_key", "val", "new_val",
                        change_date=date)
    return out, base, touched


def test_disjoint_writers_both_commit_via_rebase(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _init(spark, path)
    # writer A plans against v0, touching only partition A (key 3)
    out_a, base_a, touched_a = _plan(spark, path, [(3, 33.0)], "1998-01-01")
    assert (base_a, touched_a) == (0, ["A"])
    # writer B commits first, touching only partition B (key 1)
    MG.scd2_merge_cow(spark, path, _upd(spark, [(1, 11.0)]),
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")
    assert CT.read_manifest(path)["version"] == 1
    # A's stale-base commit succeeds by REBASING onto v1
    stats = CT.commit_generation(path, out_a, "p", operation="merge",
                                 base_version=base_a)
    assert stats["version"] == 2 and stats["written"] == ["p=A"]
    assert set(stats["linked"]) == {"p=B", "p=C"}, "rebase must link the NEW live"
    # the final table equals the serial execution of both merges
    want = MG.scd2_apply(
        MG.scd2_apply(MG.scd2_init(df), _upd(spark, [(1, 11.0)]),
                      "k", "u_key", "val", "new_val", change_date="1998-01-01"),
        _upd(spark, [(3, 33.0)]), "k", "u_key", "val", "new_val",
        change_date="1998-01-01",
    )
    assert _rows(spark, path) == frozenset(
        tuple(r)
        for r in want.select("k", "p", "val", "valid_from", "valid_to",
                             "is_current").collect()
    )


def test_overlapping_writers_conflict_then_replan(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _init(spark, path)
    # both writers touch partition B: A plans key 1, B commits key 4
    out_a, base_a, _ = _plan(spark, path, [(1, 11.0)], "1998-01-01")
    MG.scd2_merge_cow(spark, path, _upd(spark, [(4, 44.0)]),
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")
    with pytest.raises(CT.CommitConflictError, match="p=B"):
        CT.commit_generation(path, out_a, "p", operation="merge",
                             base_version=base_a)
    assert CT.read_manifest(path)["version"] == 1, "failed commit must not flip"
    # the conflicted staged dir is gone (no stale gen to confuse recover)
    assert not os.path.isdir(CT._gen_dir(path, 2))
    # re-plan (what the wrapper's retry does) and commit cleanly
    MG.scd2_merge_cow(spark, path, _upd(spark, [(1, 11.0)]),
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")
    want = MG.scd2_apply(
        MG.scd2_apply(MG.scd2_init(df), _upd(spark, [(4, 44.0)]),
                      "k", "u_key", "val", "new_val", change_date="1998-01-01"),
        _upd(spark, [(1, 11.0)]), "k", "u_key", "val", "new_val",
        change_date="1998-01-01",
    )
    assert _rows(spark, path) == frozenset(
        tuple(r)
        for r in want.select("k", "p", "val", "valid_from", "valid_to",
                             "is_current").collect()
    )


def test_unknown_footprint_fails_safe(spark, tmp_path):
    """A version with no recorded footprint (pre-OCC table, or a
    crash-healed record) must CONFLICT even when actually disjoint —
    correctness over availability."""
    path = str(tmp_path / "t")
    _init(spark, path)
    out_a, base_a, _ = _plan(spark, path, [(3, 33.0)], "1998-01-01")  # A only
    MG.scd2_merge_cow(spark, path, _upd(spark, [(1, 11.0)]),  # B only
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")
    os.remove(os.path.join(path, CT.ROOT_LOG, "v1.json"))
    # healing backfills v1 from its retained gen log (which does record
    # written) — so ALSO strip the gen log to simulate a legacy commit
    os.remove(os.path.join(CT._gen_dir(path, 1), CT.COMMIT_LOG))
    with pytest.raises(CT.CommitConflictError, match="no recorded write footprint"):
        CT.commit_generation(path, out_a, "p", operation="merge",
                             base_version=base_a)


def test_vector_only_mor_commit_is_visible_to_occ(spark, tmp_path):
    """A mor_delete touches NO data file, but its logical footprint
    (the partitions its vector rows point into) must still conflict
    with a COW writer racing on the same partition — the root log
    records logical change, not file change."""
    path = str(tmp_path / "t")
    _init(spark, path)
    out_a, base_a, touched_a = _plan(spark, path, [(1, 11.0)], "1998-01-01")
    assert touched_a == ["B"]
    MT.mor_delete(spark, path, "k = 4", "p")  # vector-only, partition B
    with pytest.raises(CT.CommitConflictError, match="p=B"):
        CT.commit_generation(path, out_a, "p", operation="merge",
                             base_version=base_a)
    # disjoint COW writer (partition A) sails through the same window
    out_c, base_c, _ = _plan(spark, path, [(3, 33.0)], "1998-01-01")
    assert base_c == 1
    out_a2, base_a2, _ = _plan(spark, path, [(1, 11.0)], "1998-01-01")
    MT.mor_delete(spark, path, "k = 7", "p")  # another vector-only on B
    stats = CT.commit_generation(path, out_c, "p", operation="merge",
                                 base_version=base_c)
    assert stats["version"] == 3 and stats["written"] == ["p=A"]


def test_wrapper_retries_through_injected_conflict(spark, tmp_path, monkeypatch):
    """scd2_merge_cow's retry loop: inject one interleaved commit
    between its planning and its commit (monkeypatched commit hook),
    and the wrapper must re-plan and land the merge — the serial
    result, no error surfaced."""
    path = str(tmp_path / "t")
    df = _init(spark, path)
    real_commit = CT.commit_generation
    fired = {"done": False}

    def racing_commit(p, out, pcol, **kw):
        if not fired["done"]:
            fired["done"] = True
            # interleave writer B (same partition B → forces conflict)
            MG.scd2_merge_cow(spark, p, _upd(spark, [(4, 44.0)]),
                              "k", "u_key", "val", "new_val", "p",
                              change_date="1998-01-01")
        return real_commit(p, out, pcol, **kw)

    monkeypatch.setattr(CT, "commit_generation", racing_commit)
    s = MG.scd2_merge_cow(spark, path, _upd(spark, [(1, 11.0)]),
                          "k", "u_key", "val", "new_val", "p",
                          change_date="1999-01-01")
    assert s["version"] == 2  # B's commit (v1) + the retried merge (v2)
    want = MG.scd2_apply(
        MG.scd2_apply(MG.scd2_init(df), _upd(spark, [(4, 44.0)]),
                      "k", "u_key", "val", "new_val", change_date="1998-01-01"),
        _upd(spark, [(1, 11.0)]), "k", "u_key", "val", "new_val",
        change_date="1999-01-01",
    )
    assert _rows(spark, path) == frozenset(
        tuple(r)
        for r in want.select("k", "p", "val", "valid_from", "valid_to",
                             "is_current").collect()
    )
