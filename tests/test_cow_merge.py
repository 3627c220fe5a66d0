"""Copy-on-write MERGE commit protocol (operators/cow_table.py).

Round-7 coverage for the two round-6 verdict items on the COW path:

- the ADVICE-high data-loss bug: inserts land in the null partition,
  which the old ``isin(touched)`` pruning could never touch — a later
  merge re-inserted updated keys as duplicate open versions and the
  swap dropped every prior insert. Batch-after-batch scenarios here
  pin the fix.
- the torn-read / crash window of the old rmtree+rename swap: the
  generational manifest commit is walked through its crash matrix
  (constructed on-disk states, same style as tests/test_compaction.py)
  and a live concurrent reader is driven across real commits.
"""

from __future__ import annotations

import json
import os
import shutil
import threading

from pyspark.sql import functions as F

import labs_stream_processing_examples_scala_spark.operators.cow_table as CT
import labs_stream_processing_examples_scala_spark.operators.merge as MG


def _init_target(spark, path, n=24, parts=("A", "B", "C")):
    """A small SCD2 target partitioned by ``p``: keys 0..n-1 spread
    round-robin over the partitions, versioned column ``val``."""
    rows = [(k, parts[k % len(parts)], float(k)) for k in range(n)]
    df = spark.createDataFrame(rows, "k long, p string, val double")
    MG.scd2_init(df).write.partitionBy("p").parquet(path)
    return df


def _upd(spark, pairs):
    return spark.createDataFrame(pairs, "u_key long, new_val double")


def _rows(spark, path):
    return frozenset(tuple(r) for r in CT.read_cow(spark, path).collect())


def _apply_chain(df, batches):
    """Reference result: scd2_apply run serially on in-memory frames."""
    out = MG.scd2_init(df)
    for upd, date in batches:
        out = MG.scd2_apply(out, upd, "k", "u_key", "val", "new_val", change_date=date)
    return frozenset(
        tuple(r) for r in out.select("k", "p", "val", "valid_from", "valid_to", "is_current").collect()
    )


def _cow_rows(spark, path):
    return frozenset(
        tuple(r)
        for r in CT.read_cow(spark, path)
        .select("k", "p", "val", "valid_from", "valid_to", "is_current")
        .collect()
    )


def test_insert_then_update_batches_keep_history(spark, tmp_path):
    """The ADVICE-high regression: merge 1 INSERTS key 100 (null
    partition); merge 2 UPDATES it and INSERTS key 101. After merge 2
    the first insert's history is closed+reopened (never duplicated,
    never lost) and equals the serial scd2_apply chain exactly."""
    path = str(tmp_path / "t")
    df = _init_target(spark, path)

    u1 = _upd(spark, [(100, 1.0), (3, 33.0)])
    s1 = MG.scd2_merge_cow(
        spark, path, u1, "k", "u_key", "val", "new_val", "p", change_date="1998-01-01"
    )
    assert s1["null_rewritten"], "insert batch must rewrite the null partition"
    assert s1["touched"] == ["A"]  # key 3 lives in partition A

    u2 = _upd(spark, [(100, 2.0), (101, 5.0)])
    s2 = MG.scd2_merge_cow(
        spark, path, u2, "k", "u_key", "val", "new_val", "p", change_date="1999-01-01"
    )
    # key 100 lives in the null partition → no named partition touched,
    # but the null partition must be in the pruned scan and rewrite
    assert s2["null_rewritten"]

    got = _cow_rows(spark, path)
    want = _apply_chain(df, [(u1, "1998-01-01"), (u2, "1999-01-01")])
    assert got == want

    k100 = sorted(
        (r for r in got if r[0] == 100), key=lambda r: (r[3], r[4] or "9999")
    )
    # exactly two versions: closed 1998→1999 and open since 1999
    assert len(k100) == 2
    assert (k100[0][2], k100[0][3], k100[0][4], k100[0][5]) == (1.0, "1998-01-01", "1999-01-01", False)
    assert (k100[1][2], k100[1][3], k100[1][4], k100[1][5]) == (2.0, "1999-01-01", None, True)
    # the second insert survived too
    assert any(r[0] == 101 and r[5] for r in got)


def test_cdc_insert_then_delete_batches(spark, tmp_path):
    """Same null-partition carry for the CDC form: batch 1 inserts a
    key, batch 2 deletes it — the tombstone closes the inserted
    version instead of the old swap dropping the whole null dir.
    Duplicate delete keys in the feed change nothing (round-7
    distinct)."""
    path = str(tmp_path / "t")
    _init_target(spark, path)
    empty_dels = spark.createDataFrame([], "d_key long")

    u1 = _upd(spark, [(200, 9.0)])
    MG.merge_cow_cdc(
        spark, path, u1, empty_dels, "k", "u_key", "d_key", "val", "new_val", "p",
        change_date="1998-01-01",
    )
    # duplicate deletes on purpose; also delete a base-table key
    dels = spark.createDataFrame([(200,), (200,), (5,)], "d_key long")
    s2 = MG.merge_cow_cdc(
        spark, path, _upd(spark, []), dels, "k", "u_key", "d_key", "val", "new_val", "p",
        change_date="1999-01-01",
    )
    assert s2["null_rewritten"]  # 200's current row lives there
    got = _cow_rows(spark, path)
    k200 = [r for r in got if r[0] == 200]
    assert len(k200) == 1 and k200[0][5] is False and k200[0][4] == "1999-01-01"
    k5 = [r for r in got if r[0] == 5]
    assert len(k5) == 1 and k5[0][5] is False


def test_duplicate_delete_keys_equal_distinct(spark, tmp_path):
    """scd2_apply_cdc: a feed with repeated delete keys produces
    exactly the same table as the deduplicated feed (no join fanout)."""
    df = _init_target(spark, str(tmp_path / "unused"))
    tgt = MG.scd2_init(df)
    upd = _upd(spark, [(1, 10.0)])
    d1 = spark.createDataFrame([(2,), (2,), (2,), (4,)], "d_key long")
    d2 = spark.createDataFrame([(2,), (4,)], "d_key long")
    a = frozenset(
        tuple(r)
        for r in MG.scd2_apply_cdc(tgt, upd, d1, "k", "u_key", "d_key", "val", "new_val").collect()
    )
    b = frozenset(
        tuple(r)
        for r in MG.scd2_apply_cdc(tgt, upd, d2, "k", "u_key", "d_key", "val", "new_val").collect()
    )
    assert a == b
    assert len(a) == len({(r[0], r[3]) for r in a}), "duplicate (key, valid_from) rows"


def test_noop_merge_commits_nothing(spark, tmp_path):
    """An update batch matching nothing and inserting nothing leaves
    the table bit-for-bit alone — no new generation, no manifest
    bump."""
    path = str(tmp_path / "t")
    _init_target(spark, path)
    before = _rows(spark, path)
    # key 3 exists → this DOES merge; use keys that exist? No: a no-op
    # needs keys that neither match nor insert — impossible (a
    # non-matching key IS an insert). The true no-op is an EMPTY batch.
    s = MG.scd2_merge_cow(
        spark, path, _upd(spark, []), "k", "u_key", "val", "new_val", "p"
    )
    assert s == {"touched": [], "swapped": [], "version": None, "null_rewritten": False}
    assert CT.read_manifest(path) is None or CT.read_manifest(path)["version"] == 0
    assert _rows(spark, path) == before


def test_kill_matrix_reader_never_torn(spark, tmp_path):
    """Walk the commit protocol's crash windows by constructing each
    on-disk state (test_compaction style): at every point the
    manifest-aware reader returns exactly the old table or exactly the
    new one, and the next merge call recovers."""
    path = str(tmp_path / "t")
    df = _init_target(spark, path)
    u1 = _upd(spark, [(0, 100.0)])
    old = _cow_rows(spark, path)
    want = _apply_chain(df, [(u1, "1998-01-01")])

    # --- crash mid-migration: marker written, only SOME root dirs
    # LINKED into gen_v0 yet. The hardlink protocol never mutates the
    # root layout, so the reader scans a complete snapshot at every
    # crash point (the old rename-based migration could tear here).
    with open(os.path.join(path, CT.MIGRATE), "w") as f:
        json.dump({"to": "gen_v0"}, f)
    os.makedirs(os.path.join(path, "gen_v0"), exist_ok=True)
    CT._link_tree(os.path.join(path, "p=A"), os.path.join(path, "gen_v0", "p=A"))
    assert _cow_rows(spark, path) == old, "mid-migration read is torn"
    # next merge resumes the migration (idempotent re-links) and
    # commits on top
    s = MG.scd2_merge_cow(
        spark, path, u1, "k", "u_key", "val", "new_val", "p", change_date="1998-01-01"
    )
    assert s["version"] == 1
    assert _cow_rows(spark, path) == want
    assert not os.path.exists(os.path.join(path, CT.MIGRATE))
    # legacy root dirs share gen_v0's retention lifetime: still here
    # (a pre-migration reader's grace snapshot) while v0 is retained
    assert os.path.isdir(os.path.join(path, "p=A")), "legacy grace GC'd too early"

    # --- crash while staging the NEXT generation: gen_v2 exists but the
    # manifest still names v1 → invisible to readers, GC'd on recovery
    stale = os.path.join(path, "gen_v2")
    shutil.copytree(os.path.join(path, "gen_v1"), stale)
    assert _cow_rows(spark, path) == want
    CT.recover(path)
    assert not os.path.exists(stale)
    assert CT.read_manifest(path)["version"] == 1

    # --- crash after commit, before GC: manifest at v2, v0/v1 linger.
    # Reader sees the new table; the NEXT commit prunes to the
    # retention window (keep previous generation only).
    u2 = _upd(spark, [(1, 200.0)])
    MG.scd2_merge_cow(
        spark, path, u2, "k", "u_key", "val", "new_val", "p", change_date="1999-01-01"
    )
    assert CT.read_manifest(path)["version"] == 2
    want2 = _apply_chain(df, [(u1, "1998-01-01"), (u2, "1999-01-01")])
    assert _cow_rows(spark, path) == want2
    assert os.path.isdir(os.path.join(path, "gen_v1")), "grace generation GC'd too early"
    assert not os.path.isdir(os.path.join(path, "gen_v0")), "stale generation survived GC"
    # ...and the commit that dropped gen_v0 also retired its hardlink
    # twin, the legacy root layout
    assert not os.path.isdir(os.path.join(path, "p=A")), "legacy root dirs survived GC"


def test_concurrent_reader_sees_old_or_new_only(spark, tmp_path):
    """VERDICT round-6 task #6: serve reads WHILE a merge commits.
    A reader thread snapshots the table in a loop across a real
    commit; every snapshot must equal exactly the pre-merge or the
    post-merge row set — the isolation the one-file manifest flip plus
    one-generation retention guarantees (the old rmtree+rename swap
    failed this by construction)."""
    path = str(tmp_path / "t")
    df = _init_target(spark, path, n=60)
    u1 = _upd(spark, [(k, k * 10.0) for k in range(0, 60, 4)] + [(500, 1.0)])
    old = _cow_rows(spark, path)
    want = _apply_chain(df, [(u1, "1998-01-01")])

    seen, errors = [], []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                seen.append(_cow_rows(spark, path))
            except Exception as e:  # noqa: BLE001 — fail the test below
                errors.append(e)
                return

    t = threading.Thread(target=reader)
    t.start()
    try:
        MG.scd2_merge_cow(
            spark, path, u1, "k", "u_key", "val", "new_val", "p", change_date="1998-01-01"
        )
        # a few post-commit reads too
        for _ in range(2):
            seen.append(_cow_rows(spark, path))
    finally:
        stop.set()
        t.join()
    assert not errors, f"reader failed mid-commit: {errors[0]}"
    assert seen, "reader never ran"
    bad = [s for s in seen if s not in (old, want)]
    assert not bad, f"torn snapshot observed ({len(bad)} of {len(seen)})"
    assert seen[-1] == want


def _write_cdc_file(spark, src, i, rows):
    from labs_stream_processing_examples_scala_spark.streaming.cdc_ingest import write_cdc_batch_file

    df = spark.createDataFrame(rows, "k long, new_value double, op string")
    write_cdc_batch_file(df, src, i)
    return df


def test_cdc_stream_ingest_merges_exactly_once(spark, tmp_path):
    """Streaming CDC → COW SCD2 table (streaming/cdc_ingest.py): three
    micro-batches of upserts/deletes/inserts MERGE into the target and
    the final table equals the serial scd2_apply_cdc chain exactly;
    the last-applied batch id rides in the same atomic manifest commit
    as the data, so a foreachBatch redelivery is SKIPPED (merges are
    not naturally idempotent — this is the txn-version guard), a
    restart from the checkpoint applies nothing twice, and a new file
    after restart applies incrementally."""
    from labs_stream_processing_examples_scala_spark.streaming.cdc_ingest import (
        CdcMergeSink,
        run_cdc_ingest,
    )

    path = str(tmp_path / "t")
    df = _init_target(spark, path)
    src = str(tmp_path / "cdc")
    os.makedirs(src)

    b0 = [(1, 100.0, "u"), (100, 1.0, "u"), (2, None, "d")]
    b1 = [(100, None, "d"), (3, 33.0, "u")]
    b2 = [(1, 200.0, "u"), (4, None, "d"), (101, 5.0, "u")]
    for i, rows in enumerate((b0, b1, b2)):
        _write_cdc_file(spark, src, i, rows)

    sink = run_cdc_ingest(spark, src, path, "k", "val", "p")
    assert sink.last_batch_id() == 2

    # reference: the serial in-memory CDC chain with the same dates
    ref = MG.scd2_init(df)
    for i, rows in enumerate((b0, b1, b2)):
        upd = spark.createDataFrame(
            [(k, v) for k, v, op in rows if op == "u"], "u_key long, new_val double"
        )
        dels = spark.createDataFrame(
            [(k,) for k, v, op in rows if op == "d"], "d_key long"
        )
        ref = MG.scd2_apply_cdc(
            ref, upd, dels, "k", "u_key", "d_key", "val", "new_val",
            change_date=f"batch-{i:06d}",
        )
    want = frozenset(
        tuple(r) for r in ref.select("k", "p", "val", "valid_from", "valid_to", "is_current").collect()
    )
    got = _cow_rows(spark, path)
    assert got == want

    # the inserted-then-deleted key 100 is a closed tombstone; key 1
    # has the full three-version history
    k100 = [r for r in got if r[0] == 100]
    assert len(k100) == 1 and k100[0][5] is False and k100[0][4] == "batch-000001"
    k1 = sorted((r for r in got if r[0] == 1), key=lambda r: r[3])
    assert [(r[2], r[5]) for r in k1] == [(1.0, False), (100.0, False), (200.0, True)]

    # redelivery of an already-committed batch id is skipped outright
    replay = spark.createDataFrame(b2, "k long, new_value double, op string")
    sink.process_batch(replay, 2)
    assert _cow_rows(spark, path) == want and sink.last_batch_id() == 2

    # restart over the same source + checkpoint: nothing re-applies
    sink2 = run_cdc_ingest(spark, src, path, "k", "val", "p")
    assert _cow_rows(spark, path) == want and sink2.last_batch_id() == 2

    # a new CDC file after restart applies incrementally
    b3 = [(5, 55.0, "u")]
    _write_cdc_file(spark, src, 3, b3)
    sink3 = run_cdc_ingest(spark, src, path, "k", "val", "p")
    assert sink3.last_batch_id() == 3
    ref = MG.scd2_apply_cdc(
        ref,
        spark.createDataFrame([(5, 55.0)], "u_key long, new_val double"),
        spark.createDataFrame([], "d_key long"),
        "k", "u_key", "d_key", "val", "new_val", change_date="batch-000003",
    )
    want3 = frozenset(
        tuple(r) for r in ref.select("k", "p", "val", "valid_from", "valid_to", "is_current").collect()
    )
    assert _cow_rows(spark, path) == want3


def test_cdc_crash_before_manifest_flip_reapplies(spark, tmp_path):
    """The exactly-once argument's other half: if the process dies
    AFTER staging but BEFORE the manifest flip, the recorded batch id
    still names the previous batch, so the replayed merge re-runs and
    commits — no lost batch. Constructed state: stage gen_v2 by hand
    (as a crashed merge would), leave the manifest at v1."""
    import shutil as _sh

    from labs_stream_processing_examples_scala_spark.streaming.cdc_ingest import CdcMergeSink

    path = str(tmp_path / "t")
    _init_target(spark, path)
    sink = CdcMergeSink(path, "k", "val", "p")
    b0 = spark.createDataFrame([(1, 100.0, "u")], "k long, new_value double, op string")
    sink.process_batch(b0, 0)
    assert sink.last_batch_id() == 0
    before = _cow_rows(spark, path)

    # fake a crashed batch-1 merge: staged generation, manifest untouched
    meta = CT.read_manifest(path)
    _sh.copytree(
        os.path.join(path, f"gen_v{meta['version']}"),
        os.path.join(path, f"gen_v{meta['version'] + 1}"),
    )
    assert sink.last_batch_id() == 0  # progress NOT recorded
    assert _cow_rows(spark, path) == before  # staged gen invisible

    # the replayed batch recovers the stale staging and commits
    b1 = spark.createDataFrame([(3, 33.0, "u")], "k long, new_value double, op string")
    sink.process_batch(b1, 1)
    assert sink.last_batch_id() == 1
    got = _cow_rows(spark, path)
    assert any(r[0] == 3 and r[2] == 33.0 and r[5] for r in got)


def test_insert_partition_derives_real_partition(spark, tmp_path):
    """With ``insert_partition`` (the ADVICE-suggested remedy) inserts
    land in a key-derived REAL partition instead of the null dir: the
    target never grows a HIVE_DEFAULT partition, only the matched and
    insert-target partitions are rewritten, and a later update to the
    inserted key prunes to its derived partition alone. Result rows
    equal the scd2_apply chain with the same override."""
    path = str(tmp_path / "t")
    df = _init_target(spark, path)
    parts = ("A", "B", "C")
    # derive the partition the same way the base table was built
    derive = F.element_at(F.array(*[F.lit(p) for p in parts]), (F.col("k") % 3 + 1).cast("int"))

    u1 = _upd(spark, [(100, 1.0), (3, 33.0)])  # 100 % 3 = 1 → "B"
    s1 = MG.scd2_merge_cow(
        spark, path, u1, "k", "u_key", "val", "new_val", "p",
        change_date="1998-01-01", insert_partition=derive,
    )
    assert not s1["null_rewritten"]
    assert s1["touched"] == ["A", "B"]  # key 3 matched in A; insert lands in B
    live = os.path.join(path, f"gen_v{CT.read_manifest(path)['version']}")
    assert not os.path.exists(os.path.join(live, "__HIVE_DEFAULT_PARTITION__"))

    # a later update to the inserted key touches ONLY its derived partition
    u2 = _upd(spark, [(100, 2.0)])
    s2 = MG.scd2_merge_cow(
        spark, path, u2, "k", "u_key", "val", "new_val", "p",
        change_date="1999-01-01", insert_partition=derive,
    )
    assert s2["touched"] == ["B"] and not s2["null_rewritten"]

    got = _cow_rows(spark, path)
    ref = MG.scd2_init(df)
    for upd, date in [(u1, "1998-01-01"), (u2, "1999-01-01")]:
        ref = MG.scd2_apply(
            ref, upd, "k", "u_key", "val", "new_val", change_date=date,
            carried_overrides={"p": derive},
        )
    want = frozenset(
        tuple(r) for r in ref.select("k", "p", "val", "valid_from", "valid_to", "is_current").collect()
    )
    assert got == want
    k100 = sorted((r for r in got if r[0] == 100), key=lambda r: r[3])
    assert [(r[1], r[2], r[5]) for r in k100] == [("B", 1.0, False), ("B", 2.0, True)]

    # a null-producing derivation is refused, not silently mis-filed
    import pytest as _pytest

    with _pytest.raises(ValueError, match="null partition value"):
        MG.scd2_merge_cow(
            spark, path, _upd(spark, [(200, 1.0)]), "k", "u_key", "val", "new_val", "p",
            change_date="2000-01-01", insert_partition=F.lit(None).cast("string"),
        )


def test_time_travel_reads_retained_generation(spark, tmp_path):
    """read_cow(version=n): the retained previous generation is a
    complete pre-merge snapshot (time travel, one generation deep by
    default); GC'd and future versions are refused with the retained
    list, never a partial table."""
    import pytest as _pytest

    path = str(tmp_path / "t")
    df = _init_target(spark, path)
    u1 = _upd(spark, [(0, 100.0)])
    u2 = _upd(spark, [(1, 200.0)])
    v0 = _cow_rows(spark, path)
    MG.scd2_merge_cow(spark, path, u1, "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")
    v1 = _cow_rows(spark, path)
    MG.scd2_merge_cow(spark, path, u2, "k", "u_key", "val", "new_val", "p",
                      change_date="1999-01-01")

    def at(v):
        return frozenset(
            tuple(r)
            for r in CT.read_cow(spark, path, version=v)
            .select("k", "p", "val", "valid_from", "valid_to", "is_current")
            .collect()
        )

    assert at(2) == _cow_rows(spark, path)   # live, addressable by number
    assert at(1) == v1                        # the retained snapshot
    with _pytest.raises(ValueError, match="not available"):
        at(0)                                 # GC'd past the window
    with _pytest.raises(ValueError, match="not available"):
        at(7)                                 # the future
    assert v0 != v1


def test_cluster_output_writes_one_file_per_partition(spark, tmp_path):
    """commit_generation(cluster_output=True): the rewrite shuffles on
    the partition column first, so each touched partition lands as a
    single file run instead of tasks×partitions fragments; rows are
    identical either way."""
    import glob

    pa = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    df = _init_target(spark, pa, n=300)
    _init_target(spark, pb, n=300)
    # touch every partition, with the update spread over many tasks
    u = _upd(spark, [(k, k * 2.0) for k in range(0, 300, 2)])

    MG.scd2_merge_cow(spark, pa, u, "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")
    ra = _cow_rows(spark, pa)

    from labs_stream_processing_examples_scala_spark.operators import merge as _m
    upd_keys = u.select(F.col("u_key").alias("__uk"))
    _, pruned, touched, include_null, _base = _m._cow_touched(
        spark, pb, upd_keys, upd_keys, "k", "p"
    )
    out = MG.scd2_apply(pruned, u, "k", "u_key", "val", "new_val", "1998-01-01")
    CT.commit_generation(pb, out, "p", cluster_output=True)
    rb = _cow_rows(spark, pb)
    assert ra == rb

    live = os.path.join(pb, f"gen_v{CT.read_manifest(pb)['version']}")
    for d in ("p=A", "p=B", "p=C"):
        files = glob.glob(os.path.join(live, d, "part-*.parquet"))
        assert len(files) == 1, f"{d}: {len(files)} files with cluster_output"


def test_writer_lock_blocks_live_concurrent_writer(spark, tmp_path):
    """The single-writer contract is enforced, not prose: a live lock
    holder makes a second commit raise ConcurrentWriterError; a lock
    left by a DEAD pid is stolen and the commit proceeds."""
    import pytest as _pytest

    path = str(tmp_path / "t")
    _init_target(spark, path)
    u = _upd(spark, [(0, 1.0)])

    # live holder (this test's own pid would be treated as re-entry —
    # use a real OTHER process that sleeps)
    import subprocess

    other = subprocess.Popen(["sleep", "30"])
    try:
        with open(os.path.join(path, CT.WRITER_LOCK), "w") as f:
            f.write(str(other.pid))
        # lock_timeout=0.5: the wrapper now waits out live holders
        # (round-8 cross-process patience) — cap the wait so the
        # 30s-sleeping holder still surfaces as the error contract
        with _pytest.raises(CT.ConcurrentWriterError, match="one\nmaintenance writer|one maintenance writer"):
            MG.scd2_merge_cow(spark, path, u, "k", "u_key", "val", "new_val", "p",
                              change_date="1998-01-01", lock_timeout=0.5)
    finally:
        other.kill()
        other.wait()

    # dead holder: stolen, merge proceeds, lock released afterwards
    with open(os.path.join(path, CT.WRITER_LOCK), "w") as f:
        f.write(str(other.pid))  # now a dead pid
    s = MG.scd2_merge_cow(spark, path, u, "k", "u_key", "val", "new_val", "p",
                          change_date="1998-01-01")
    assert s["version"] == 1
    assert not os.path.exists(os.path.join(path, CT.WRITER_LOCK))


def test_alter_add_column_is_metadata_only(spark, tmp_path):
    """Schema evolution (cow_table.alter_add_column): adding a column
    with a default rewrites ZERO data files — the manifest records it,
    the reader projects it (mergeSchema + coalesce), later merges
    materialize it physically only in the partitions they rewrite, and
    time travel projects it over old generations too."""
    import glob

    import pyarrow.parquet as pq
    import pytest as _pytest

    path = str(tmp_path / "t")
    _init_target(spark, path)
    u1 = _upd(spark, [(0, 100.0)])
    MG.scd2_merge_cow(spark, path, u1, "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")

    def snapshot():
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                fp = os.path.join(root, f)
                out[os.path.relpath(fp, path)] = os.path.getmtime(fp)
        return out

    before = snapshot()
    CT.alter_add_column(path, "tier", "string", "'standard'")
    after = snapshot()
    assert {k: v for k, v in after.items() if not k.startswith("_")} == {
        k: v for k, v in before.items() if not k.startswith("_")
    }, "alter rewrote data files"

    t = CT.read_cow(spark, path)
    assert "tier" in t.columns
    assert t.filter(F.col("tier") != "standard").count() == 0
    assert t.count() == len(_cow_rows(spark, path))

    # a later merge materializes the column in the partitions it
    # rewrites; untouched partitions stay pre-alter on disk
    u2 = _upd(spark, [(1, 200.0)])  # key 1 → partition B
    MG.scd2_merge_cow(spark, path, u2, "k", "u_key", "val", "new_val", "p",
                      change_date="1999-01-01")
    live = os.path.join(path, f"gen_v{CT.read_manifest(path)['version']}")
    b_cols = set()
    for f in glob.glob(os.path.join(live, "p=B", "part-*.parquet")):
        b_cols |= set(pq.read_schema(f).names)
    a_cols = set()
    for f in glob.glob(os.path.join(live, "p=A", "part-*.parquet")):
        a_cols |= set(pq.read_schema(f).names)
    assert "tier" in b_cols, "rewritten partition did not materialize the column"
    assert "tier" not in a_cols, "untouched partition was rewritten for the alter"

    t2 = CT.read_cow(spark, path)
    assert t2.filter(F.col("tier") != "standard").count() == 0
    # time travel projects the evolved schema over the old generation
    prev = CT.read_cow(spark, path, version=CT.read_manifest(path)["version"] - 1)
    assert "tier" in prev.columns and prev.filter(F.col("tier") != "standard").count() == 0

    with _pytest.raises(ValueError, match="already added"):
        CT.alter_add_column(path, "tier", "string", "'x'")


def _init_skewed_files(spark, path):
    """Legacy-layout table where p=A has ONE data file and p=B has
    many (the post-merge small-file state OPTIMIZE exists to fix);
    migrated to generational by ensure_generational."""
    a = spark.createDataFrame(
        [(k, "A", float(k)) for k in range(10)], "k long, p string, val double"
    ).coalesce(1)
    b = spark.createDataFrame(
        [(k, "B", float(k)) for k in range(100, 140)], "k long, p string, val double"
    ).repartition(8)
    a.write.partitionBy("p").parquet(path)
    b.write.mode("append").partitionBy("p").parquet(path)
    CT.ensure_generational(path)
    return a.unionByName(b)


def _part_files(path, version, part):
    import glob

    return sorted(glob.glob(os.path.join(path, f"gen_v{version}", part, "*.parquet")))


def test_optimize_cow_binpacks_only_small_file_partitions(spark, tmp_path):
    """OPTIMIZE (cow_table.optimize_cow): partitions over the file-count
    target are rewritten into one clustered file run; partitions already
    at target are hardlinked untouched (same inode); rows are identical;
    the swap is a normal generational commit (old version retained for
    time travel)."""
    path = str(tmp_path / "t")
    _init_skewed_files(spark, path)
    v0 = CT.read_manifest(path)["version"]
    assert len(_part_files(path, v0, "p=B")) > 1
    assert len(_part_files(path, v0, "p=A")) == 1
    before = frozenset(tuple(r) for r in CT.read_cow(spark, path).collect())
    a_inode = os.stat(_part_files(path, v0, "p=A")[0]).st_ino

    stats = CT.optimize_cow(spark, path, "p", target_files_per_partition=1)
    assert stats["compacted"] == ["p=B"]
    v1 = stats["version"]
    assert v1 == v0 + 1
    assert len(_part_files(path, v1, "p=B")) == 1, stats
    assert os.stat(_part_files(path, v1, "p=A")[0]).st_ino == a_inode, (
        "untouched partition was copied, not hardlinked"
    )
    assert frozenset(tuple(r) for r in CT.read_cow(spark, path).collect()) == before
    # old generation still readable (retention window)
    assert frozenset(
        tuple(r) for r in CT.read_cow(spark, path, version=v0).collect()
    ) == before
    # idempotent: nothing left over target → no new generation
    again = CT.optimize_cow(spark, path, "p", target_files_per_partition=1)
    assert again["compacted"] == [] and again["version"] == v1


def test_optimize_cow_sorted_multifile_packs_disjoint_ranges(spark, tmp_path):
    """The spill-aware form: target_files_per_partition > 1 with
    sort_cols range-partitions the rewrite so each output file covers a
    disjoint, internally-sorted range of the sort column (parquet
    min/max skipping); >1 without sort_cols is refused."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    path = str(tmp_path / "t")
    _init_skewed_files(spark, path)
    before = frozenset(tuple(r) for r in CT.read_cow(spark, path).collect())

    with _pytest.raises(ValueError, match="sort_cols"):
        CT.optimize_cow(spark, path, "p", target_files_per_partition=2)

    stats = CT.optimize_cow(
        spark, path, "p", target_files_per_partition=2, sort_cols=["val"]
    )
    assert stats["compacted"] == ["p=B"]
    files = _part_files(path, stats["version"], "p=B")
    assert 1 <= len(files) <= 3, files  # range split is approximate
    ranges = []
    for f in files:
        vals = pq.read_table(f, columns=["val"]).column("val").to_pylist()
        assert vals == sorted(vals), "file not internally sorted"
        if vals:
            ranges.append((min(vals), max(vals)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file value ranges overlap"
    assert frozenset(tuple(r) for r in CT.read_cow(spark, path).collect()) == before


def test_history_records_lifecycle_and_vacuum_reclaims(spark, tmp_path):
    """DESCRIBE HISTORY + VACUUM (cow_table.history/vacuum): each
    commit stages its record inside its own generation dir (atomic
    with the data), history lists retained generations newest-first
    with operation + written/linked partitions, and vacuum drops
    history past the requested window — never the live generation."""
    import pytest as _pytest

    path = str(tmp_path / "t")
    _init_target(spark, path)  # legacy layout → first merge migrates
    MG.scd2_merge_cow(spark, path, _upd(spark, [(0, 100.0)]), "k", "u_key",
                      "val", "new_val", "p", change_date="1998-01-01")
    h = CT.history(path)
    assert [r["operation"] for r in h] == ["merge", "migrate"]
    assert h[0]["live"] and not h[1]["live"]
    assert h[0]["written"] == ["p=A"] and set(h[1].keys()) >= {"committed_at"}
    assert "p=B" in h[0]["linked"]

    # deeper window: keep 3 generations, then three more commits
    for i, (k, v) in enumerate([(1, 200.0), (2, 300.0), (4, 400.0)]):
        out_keys = _upd(spark, [(k, v)])
        MG.scd2_merge_cow(spark, path, out_keys, "k", "u_key", "val",
                          "new_val", "p", change_date=f"199{i + 5}-01-01")
    h2 = CT.history(path)
    assert len(h2) == 2  # default retention: live + one previous
    assert h2[0]["version"] == 4 and h2[0]["live"]

    before = _cow_rows(spark, path)
    stats = CT.vacuum(path)  # keep_generations=0 → only live survives
    assert stats == {"live": 4, "removed": [3]}
    assert [r["version"] for r in CT.history(path)] == [4]
    assert _cow_rows(spark, path) == before
    with _pytest.raises(ValueError, match="not available"):
        CT.read_cow(spark, path, version=3)
    # idempotent; live generation is never a candidate
    assert CT.vacuum(path)["removed"] == []
    with _pytest.raises(ValueError):
        CT.vacuum(path, keep_generations=-1)


def test_append_cow_adds_files_without_rewrites(spark, tmp_path):
    """INSERT INTO (cow_table.append_cow): rows land as new files, all
    pre-existing files hardlink-carried (inode-asserted), the CDF
    across the append is pure inserts, and two appends to DISJOINT
    partitions commit through the optimistic path without conflict."""
    import pytest as _pytest

    path = str(tmp_path / "t")
    _init_target(spark, path)
    CT.ensure_generational(path)
    before_rows = _cow_rows(spark, path)

    def inodes(v):
        gen = CT._gen_dir(path, v)
        return {
            os.stat(os.path.join(gen, e, f)).st_ino
            for e in os.listdir(gen)
            if CT._is_partition_entry(e)
            for f in os.listdir(os.path.join(gen, e))
            if f.endswith(".parquet")
        }

    base_inodes = inodes(0)
    new_rows = spark.createDataFrame(
        [(100, "A", 1.0), (101, "D", 2.0)], "k long, p string, val double"
    )
    s = CT.append_cow(spark, MG.scd2_init(new_rows), path, "p")
    assert s["version"] == 1 and set(s["written"]) == {"p=A", "p=D"}
    assert base_inodes <= inodes(1), "append rewrote an existing file"
    got = _cow_rows(spark, path)
    assert got > before_rows and len(got) == len(before_rows) + 2
    feed = CT.table_changes(spark, path, 0, 1)
    assert {r["change_type"] for r in feed.collect()} == {"insert"}
    assert feed.count() == 2

    # OCC: a stale-base append to a DISJOINT partition rebases...
    more = MG.scd2_init(
        spark.createDataFrame([(102, "E", 3.0)], "k long, p string, val double")
    )
    s2 = CT.append_cow(
        spark,
        MG.scd2_init(
            spark.createDataFrame([(103, "B", 4.0)], "k long, p string, val double")
        ),
        path, "p",
    )
    assert s2["version"] == 2
    s3 = CT.append_cow(spark, more, path, "p", base_version=1)
    assert s3["version"] == 3 and s3["written"] == ["p=E"]
    # ...while an overlapping one conflicts
    with _pytest.raises(CT.CommitConflictError):
        CT.append_cow(
            spark,
            MG.scd2_init(
                spark.createDataFrame([(104, "B", 5.0)], "k long, p string, val double")
            ),
            path, "p", base_version=1,
        )
    assert {r[0] for r in CT.read_cow(spark, path).select("k").collect()} == (
        set(range(24)) | {100, 101, 102, 103}
    )


def test_restore_rolls_back_as_a_forward_commit(spark, tmp_path):
    """RESTORE (cow_table.restore_cow): rolling back to a retained
    version reproduces its rows exactly, moves history FORWARD (a new
    auditable commit, not a rewrite), costs zero data bytes (hardlink
    identity), and the CDF across the restore is the inverse of the
    rolled-back merge's feed."""
    path = str(tmp_path / "t")
    _init_target(spark, path)
    CT.ensure_generational(path)
    v0_rows = _cow_rows(spark, path)
    MG.scd2_merge_cow(spark, path, _upd(spark, [(1, 11.0)]),
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")
    merged_rows = _cow_rows(spark, path)
    assert merged_rows != v0_rows
    # capture the merge's feed BEFORE restoring (restore's GC drops v0)
    fwd = {
        (tuple(r)[:-1], {"insert": "delete", "delete": "insert"}[r["change_type"]])
        for r in CT.table_changes(spark, path, 0, 1).collect()
    }

    import pytest as _pytest

    s = CT.restore_cow(path, 0)
    assert s == {"version": 2, "restored_version": 0}
    assert _cow_rows(spark, path) == v0_rows
    assert [h["operation"] for h in CT.history(path)][0] == "restore"
    # zero-copy: the restored generation shares v0's... v0 was GC'd by
    # the merge, but the untouched partitions' inodes prove the link
    # chain; and the restore must not have copied data bytes
    assert CT.changed_partitions(path, 1, 2) == ["p=B"]  # only the rolled-back one
    # CDF across the restore = inverse of the merge's feed
    inv = {
        (tuple(r)[:-1], r["change_type"])
        for r in CT.table_changes(spark, path, 1, 2).collect()
    }
    assert inv == fwd

    # guard rails: live version and GC'd versions refuse
    with _pytest.raises(ValueError):
        CT.restore_cow(path, 2)
    with _pytest.raises(ValueError):
        CT.restore_cow(path, 99)


def test_shallow_clone_is_zero_copy_and_independent(spark, tmp_path):
    import pytest as _pytest

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _init_target(spark, src)
    CT.ensure_generational(src)
    orig = _cow_rows(spark, src)

    s = CT.clone_cow(src, dst)
    assert s["version"] == 0
    assert _cow_rows(spark, dst) == orig
    # zero-copy: every cloned data file is the SAME inode
    src_gen = CT._gen_dir(src, CT.read_manifest(src)["version"])
    dst_gen = CT._gen_dir(dst, 0)
    for part in os.listdir(src_gen):
        if not CT._is_partition_entry(part):
            continue
        for f in os.listdir(os.path.join(src_gen, part)):
            if f.endswith(".parquet"):
                assert (
                    os.stat(os.path.join(src_gen, part, f)).st_ino
                    == os.stat(os.path.join(dst_gen, part, f)).st_ino
                )

    # independence: a merge into the CLONE never changes the source
    MG.scd2_merge_cow(spark, dst, _upd(spark, [(1, 11.0)]),
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")
    assert _cow_rows(spark, src) == orig
    assert _cow_rows(spark, dst) != orig
    # ...and a merge into the SOURCE never changes the clone
    clone_rows = _cow_rows(spark, dst)
    MG.scd2_merge_cow(spark, src, _upd(spark, [(2, 22.0)]),
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1999-01-01")
    assert _cow_rows(spark, dst) == clone_rows
    with _pytest.raises(ValueError):
        CT.clone_cow(src, dst)  # existing target refuses


def test_apply_changes_to_agg_is_incremental_view_maintenance(spark, tmp_path):
    """The CDF consumer (cow_table.apply_changes_to_agg): advancing an
    aggregate MV by the v0→v1 feed equals re-aggregating v1 from
    scratch — including the retraction paths the q71 fixture can't
    reach: a group fully deleted from the feed must DROP from the MV
    (not linger at zero), and a group born in the feed must appear."""
    path = str(tmp_path / "t")
    _init_target(spark, path)
    measures = {
        "n_rows": F.lit(1),
        "n_open": F.when(F.col("is_current"), 1).otherwise(0),
        "open_val": F.when(F.col("is_current"), F.col("val")).otherwise(0.0),
    }
    CT.ensure_generational(path)  # legacy fixture → gen_v0 + manifest
    mv0 = CT.aggregate_view(CT.read_cow(spark, path, version=0), ["p"], measures)

    # a merge (update + insert into a derived partition) → real feed
    u = _upd(spark, [(1, 11.0), (100, 5.0)])
    MG.scd2_merge_cow(
        spark, path, u, "k", "u_key", "val", "new_val", "p",
        change_date="1998-01-01",
        insert_partition=F.lit("NEW"),
    )
    feed = CT.table_changes(spark, path, 0, 1)
    got = CT.apply_changes_to_agg(mv0, feed, ["p"], measures)
    want = CT.aggregate_view(CT.read_cow(spark, path), ["p"], measures)
    as_map = lambda df: {  # noqa: E731
        r["p"]: (r[1], r[2], round(r[3], 6)) for r in df.collect()
    }
    assert as_map(got) == as_map(want)
    assert "NEW" in as_map(got), "group born in the feed missing from the MV"

    # synthetic full-group retraction: every row of partition A deleted
    gone = (
        CT.read_cow(spark, path).filter("p = 'A'")
        .withColumn("change_type", F.lit("delete"))
    )
    shrunk = CT.apply_changes_to_agg(want, gone, ["p"], measures)
    assert "A" not in as_map(shrunk), "fully-retracted group lingers in the MV"
    assert {k: v for k, v in as_map(shrunk).items()} == {
        k: v for k, v in as_map(want).items() if k != "A"
    }


def test_table_changes_prunes_by_hardlink_identity(spark, tmp_path):
    """Change data feed (cow_table.table_changes): the diff between two
    retained versions equals the full-table multiset diff but reads
    ONLY the partitions whose files differ — hardlinked (untouched)
    partitions are excluded by inode identity without opening a file.
    A row-neutral rewrite (OPTIMIZE) yields an empty feed even though
    its partitions' files all changed."""
    path = str(tmp_path / "t")
    _init_target(spark, path)
    MG.scd2_merge_cow(spark, path, _upd(spark, [(1, 200.0), (4, 400.0)]),
                      "k", "u_key", "val", "new_val", "p",
                      change_date="1998-01-01")  # keys 1,4 → partition B only
    assert CT.changed_partitions(path, 0, 1) == ["p=B"]

    old = CT.read_cow(spark, path, version=0)
    new = CT.read_cow(spark, path, version=1)
    truth = frozenset(
        tuple(r) + ("insert",) for r in new.exceptAll(old).collect()
    ) | frozenset(
        tuple(r) + ("delete",) for r in old.exceptAll(new).collect()
    )
    feed = CT.table_changes(spark, path, 0, 1)
    got = frozenset(tuple(r) for r in feed.collect())
    assert got == truth and len(got) == 6  # 2 keys × (1 delete + 2 inserts)
    assert feed.filter(F.col("p") != "B").count() == 0, (
        "diff leaked rows from untouched partitions"
    )

    # row-neutral rewrite: files change, feed is empty
    CT.optimize_cow(spark, path, "p", target_files_per_partition=0,
                    sort_cols=["k"], )
    v2 = CT.read_manifest(path)["version"]
    assert v2 == 2 and CT.changed_partitions(path, 1, 2) != []
    assert CT.table_changes(spark, path, 1, 2).count() == 0

    # dropped version → clear error
    CT.vacuum(path)
    try:
        CT.table_changes(spark, path, 0, 2)
        raise AssertionError("expected ValueError for vacuumed version")
    except ValueError:
        pass


# --- round 11 self-review: flat-table migration, null-partition CDF
# --- pruning, retention depth on the simple verbs -----------------------


def test_ensure_generational_migrates_flat_legacy_table(spark, tmp_path):
    """A plain df.write.parquet() table (loose part files at root, no
    partition dirs) must migrate its DATA into gen_v0 — the old loop
    linked only partition entries, flipping the manifest over an EMPTY
    generation and orphaning the real data (self-review finding, r11)."""
    path = str(tmp_path / "flat")
    df = spark.createDataFrame([(k, float(k)) for k in range(10)], "k long, v double")
    df.write.parquet(path)
    before = frozenset(tuple(r) for r in spark.read.parquet(path).collect())
    CT.ensure_generational(path)
    assert CT.read_manifest(path) == {"version": 0}
    after = frozenset(tuple(r) for r in CT.read_cow(spark, path).collect())
    assert after == before, "migrated table must serve the same rows"


def test_table_changes_prunes_when_null_partition_sorts_first(spark, tmp_path):
    """'__HIVE_DEFAULT_PARTITION__' sorts before lowercase 'col='
    entries; deriving pcol from changed[0] disabled pruning entirely
    whenever the null partition changed. The feed must stay correct
    AND pick the partition column from any '='-bearing entry
    (self-review finding, r11)."""
    path = str(tmp_path / "t")
    rows = [(k, None if k % 3 == 0 else ("a" if k % 2 else "b"), float(k))
            for k in range(12)]
    df = spark.createDataFrame(rows, "k long, p string, v double")
    CT.cow_init(df, path, "p")
    # rewrite the null partition AND one named partition via merge-less
    # append (touches p=a and the null dir)
    add = spark.createDataFrame([(100, None, 1.0), (101, "a", 2.0)],
                                "k long, p string, v double")
    CT.append_cow(spark, add, path, "p")
    feed = CT.table_changes(spark, path, 0, 1)
    got = {(r.k, r.p) for r in feed.filter("change_type = 'insert'").collect()}
    assert got == {(100, None), (101, "a")}
    assert feed.filter("change_type = 'delete'").count() == 0


def test_append_and_restore_honor_keep_generations(spark, tmp_path):
    """append_cow/restore_cow hardcoded a one-back GC, destroying
    history deeper commits had retained (self-review finding, r11)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(0, "A", 0.0)], "k long, p string, v double")
    CT.cow_init(df, path, "p")
    add = spark.createDataFrame([(1, "A", 1.0)], "k long, p string, v double")
    CT.append_cow(spark, add, path, "p", keep_generations=3)
    CT.append_cow(spark, add, path, "p", keep_generations=3)
    assert CT._gen_versions(path) == [0, 1, 2]
    CT.restore_cow(path, 0, keep_generations=3)
    assert CT._gen_versions(path) == [0, 1, 2, 3]
