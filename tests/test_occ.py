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


def test_mor_commit_footprints_are_visible_to_occ(spark, tmp_path):
    """MOR commits' logical footprints must gate racing COW writers:
    an INSERT-ONLY mor_upsert (appended files, zero vector rows) into
    partition B conflicts a stale-base COW commit on B, while a
    disjoint COW commit on A rebases through the same window."""
    path = str(tmp_path / "t")
    _init(spark, path)
    out_a, base_a, touched_a = _plan(spark, path, [(1, 11.0)], "1998-01-01")
    assert touched_a == ["B"]
    s = MT.mor_upsert(  # appends into B; no matched key → no vectors
        spark, path, _upd(spark, [(300, 5.0)]),
        "k", "u_key", "val", "new_val", "p",
        insert_partition=F.lit("B"),
    )
    assert s["position_deletes"] == 0 and s["appended_files"] > 0
    with pytest.raises(CT.CommitConflictError, match="p=B"):
        CT.commit_generation(path, out_a, "p", operation="merge",
                             base_version=base_a)
    # disjoint COW writer (partition A) rebases through a second window
    out_c, base_c, _ = _plan(spark, path, [(3, 33.0)], "1998-01-01")
    assert base_c == 1
    MT.mor_upsert(
        spark, path, _upd(spark, [(301, 6.0)]),
        "k", "u_key", "val", "new_val", "p",
        insert_partition=F.lit("B"),
    )
    stats = CT.commit_generation(path, out_c, "p", operation="merge",
                                 base_version=base_c)
    assert stats["version"] == 3 and stats["written"] == ["p=A"]


def test_cow_rewrite_respects_deletion_vectors(spark, tmp_path):
    """Tier interplay: a COW rewrite touching a partition the deletion
    vectors point into REFUSES (it would resurrect the deleted rows);
    a disjoint rewrite proceeds and CARRIES the vectors, so the
    deleted row stays deleted through the COW commit."""
    path = str(tmp_path / "t")
    _init(spark, path)
    MT.mor_delete(spark, path, "k = 4", "p")  # vector into partition B
    with pytest.raises(ValueError, match="deletion vectors"):
        MG.scd2_merge_cow(spark, path, _upd(spark, [(1, 11.0)]),  # B
                          "k", "u_key", "val", "new_val", "p",
                          change_date="1998-01-01")
    MG.scd2_merge_cow(spark, path, _upd(spark, [(3, 33.0)]),  # A: disjoint
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")
    out = MT.read_mor(spark, path)
    assert out.filter("k = 4").count() == 0, "COW commit resurrected a deleted row"
    assert out.filter("k = 3 AND is_current").select("val").first()[0] == 33.0
    # the bridge: compaction folds, then the refused merge is legal
    MT.mor_compact(spark, path, "p")
    MG.scd2_merge_cow(spark, path, _upd(spark, [(1, 11.0)]),
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1999-01-01")
    out = MT.read_mor(spark, path)
    assert out.filter("k = 4").count() == 0
    assert out.filter("k = 1 AND is_current").select("val").first()[0] == 11.0


def test_truly_parallel_disjoint_writers_serialize_correctly(spark, tmp_path):
    """TWO THREADS plan and commit concurrently (the lock serializes
    only the commit critical section): disjoint-partition merges must
    BOTH land — whichever commits second rebases — and the final table
    equals the serial execution in either order (disjointness makes
    the orders identical). No error, no lost update, across 3 rounds
    to give the race real chances to interleave."""
    import threading

    path = str(tmp_path / "t")
    df = _init(spark, path)
    # key 3 → partition A, key 1 → partition B: permanently disjoint
    plans = [((3, 33.0), "1998-01-01"), ((1, 11.0), "1998-01-01"),
             ((3, 66.0), "1999-01-01"), ((1, 99.0), "1999-01-01")]
    errors = []

    def writer(pair, date):
        try:
            MG.scd2_merge_cow(spark, path, _upd(spark, [pair]),
                              "k", "u_key", "val", "new_val", "p",
                              change_date=date)
        except Exception as e:  # noqa: BLE001 — surfaced via assert
            errors.append(e)

    for round_pairs in (plans[:2], plans[2:]):
        ts = [threading.Thread(target=writer, args=p) for p in round_pairs]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    assert not errors, errors
    assert CT.read_manifest(path)["version"] == 4  # every commit landed
    ref = MG.scd2_init(df)
    for pair, date in plans:
        ref = MG.scd2_apply(ref, _upd(spark, [pair]), "k", "u_key",
                            "val", "new_val", change_date=date)
    assert _rows(spark, path) == frozenset(
        tuple(r)
        for r in ref.select("k", "p", "val", "valid_from", "valid_to",
                            "is_current").collect()
    )


def test_parallel_mor_writers_rebase_or_replan(spark, tmp_path):
    """The MOR tier's OCC (round 7, planning outside the lock): two
    threads upserting DIFFERENT KEYS concurrently — disjoint
    partitions rebase, same-partition conflicts re-plan internally —
    must both land with the serial result (key-disjoint updates
    commute, so either serialization is the same relation). Mixed
    tiers too: a COW merge and a MOR delete race on disjoint
    partitions and both commit."""
    import threading

    path = str(tmp_path / "t")
    df = _init(spark, path)
    errors = []

    def mor_writer(pair, date):
        try:
            MT.mor_upsert(spark, path, _upd(spark, [pair]),
                          "k", "u_key", "val", "new_val", "p",
                          change_date=date)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    # round 1: disjoint partitions (A vs B); round 2: SAME partition B,
    # different keys (1 and 4) — forces the internal re-plan path
    for pairs in ([((3, 33.0), "1998-01-01"), ((1, 11.0), "1998-01-01")],
                  [((1, 99.0), "1999-01-01"), ((4, 44.0), "1999-01-01")]):
        ts = [threading.Thread(target=mor_writer, args=p) for p in pairs]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    assert not errors, errors
    assert CT.read_manifest(path)["version"] == 4
    ref = MG.scd2_init(df)
    for pair, date in [((3, 33.0), "1998-01-01"), ((1, 11.0), "1998-01-01"),
                       ((1, 99.0), "1999-01-01"), ((4, 44.0), "1999-01-01")]:
        ref = MG.scd2_apply(ref, _upd(spark, [pair]), "k", "u_key",
                            "val", "new_val", change_date=date)
    got = frozenset(
        tuple(r)
        for r in __import__(
            "labs_stream_processing_examples_scala_spark.operators.mor_table",
            fromlist=["read_mor"],
        ).read_mor(spark, path)
        .select("k", "p", "val", "valid_from", "valid_to", "is_current")
        .collect()
    )
    assert got == frozenset(
        tuple(r)
        for r in ref.select("k", "p", "val", "valid_from", "valid_to",
                            "is_current").collect()
    )

    # mixed tiers on disjoint partitions: COW merge (partition A)
    # races a MOR delete (partition C). The table still carries
    # vectors in A and B from the upserts above, so bridge via
    # compaction first (the COW merge would otherwise refuse on A)
    MT.mor_compact(spark, path, "p")
    assert got == frozenset(
        tuple(r)
        for r in MT.read_mor(spark, path)
        .select("k", "p", "val", "valid_from", "valid_to", "is_current")
        .collect()
    ), "compaction changed the relation"
    errs2 = []

    def cow_writer():
        try:
            MG.scd2_merge_cow(spark, path, _upd(spark, [(3, 77.0)]),
                              "k", "u_key", "val", "new_val", "p",
                              change_date="2000-01-01")
        except Exception as e:  # noqa: BLE001
            errs2.append(e)

    def mor_deleter():
        try:
            MT.mor_delete(spark, path, "k = 2", "p")  # partition C
        except Exception as e:  # noqa: BLE001
            errs2.append(e)

    ts = [threading.Thread(target=cow_writer), threading.Thread(target=mor_deleter)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # either serialization works: the COW merge's rewrite (A) is
    # disjoint from the delete's vector (C), so whichever commits
    # second rebases — the merge carrying the vector forward if the
    # delete won the race
    assert not errs2, errs2
    final = MT.read_mor(spark, path)
    assert final.filter("k = 2").count() == 0
    assert final.filter("k = 3 AND is_current").select("val").first()[0] == 77.0


def test_checkpointed_log_gates_stale_bases(spark, tmp_path):
    """checkpoint_root_log bounds the metadata: records before the
    horizon are gone, and a writer whose base predates it CONFLICTS
    fail-safe (re-plan) even for genuinely disjoint partitions, while
    writers inside the horizon still verify normally."""
    path = str(tmp_path / "t")
    _init(spark, path)
    lazy, stale_base, _ = _plan(spark, path, [(3, 33.0)], "1998-01-01")
    # materialize the stale plan NOW: by commit time its base
    # generation is retention-GC'd, and a lazy scan would die with
    # FileNotFound before reaching the OCC gate (the documented
    # slower-than-retention reader trade-off); the gate under test is
    # the log horizon, so feed it a concrete staged output
    stale_plan = spark.createDataFrame(lazy.collect(), lazy.schema)
    for i, (k, v) in enumerate([(1, 11.0), (1, 12.0), (1, 13.0)]):
        MG.scd2_merge_cow(spark, path, _upd(spark, [(k, v)]),
                          "k", "u_key", "val", "new_val", "p",
                          change_date=f"199{i + 5}-01-01")
    s = CT.checkpoint_root_log(path, keep=2)
    assert s["log_start"] == 2 and s["removed"] == [0, 1]
    assert not os.path.exists(os.path.join(path, CT.ROOT_LOG, "v0.json"))
    with pytest.raises(CT.CommitConflictError, match="checkpointed"):
        CT.commit_generation(path, stale_plan, "p", operation="merge",
                             base_version=stale_base)
    # a fresh plan (base inside the horizon) commits normally
    fresh, base, _ = _plan(spark, path, [(3, 33.0)], "1999-06-01")
    assert base == 3
    MG.scd2_merge_cow(spark, path, _upd(spark, [(4, 44.0)]),
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1999-06-01")  # interleave inside horizon
    with pytest.raises(CT.CommitConflictError):  # overlap on B still caught
        CT.commit_generation(path, _plan(spark, path, [(1, 1.0)], "x")[0],
                             "p", operation="merge", base_version=base)
    stats = CT.commit_generation(path, fresh, "p", operation="merge",
                                 base_version=base)
    assert stats["version"] == 5 and stats["written"] == ["p=A"]


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
