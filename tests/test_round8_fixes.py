"""Round-8 concurrency/evolution fixes, each with the failure it closes.

1. commit_generation conflicts UP FRONT when the planned-against base
   generation left the retention window (previously: the staged write's
   lazy scan died mid-flight with FileNotFoundException the merge retry
   loops don't catch).
2. delete_ids allocates tombstone deltas atomically (previously: two
   concurrent deletes computed the same d{n} and one clobbered the
   other — a missed deletion already reported as applied).
3. alter_add_column + mor_upsert interplay: MOR write planning reads
   the evolved schema deterministically via mergeSchema + default
   projection (previously: schema sampled from an arbitrary file of a
   mixed-schema generation).
4. The writer-lock stale steal is atomic under a kernel-flock sidecar
   (previously: two processes observing the same dead holder could both
   remove-and-create, putting two live writers in the commit section).
5. TRUE cross-process OCC: two OS processes (own JVMs) merge disjoint
   partitions concurrently; both commit via rebase and the result is
   the serial one (verdict round-7 task #7).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

import labs_stream_processing_examples_scala_spark.operators.cow_table as CT
import labs_stream_processing_examples_scala_spark.operators.merge as MG
import labs_stream_processing_examples_scala_spark.operators.mor_table as MT

from tests.conftest import SF_SMOKE


def _init(spark, path, n=24, parts=("A", "B", "C")):
    rows = [(k, parts[k % len(parts)], float(k)) for k in range(n)]
    df = spark.createDataFrame(rows, "k long, p string, val double")
    CT.cow_init(MG.scd2_init(df), path, "p")
    return df


def _upd(spark, pairs):
    return spark.createDataFrame(pairs, "u_key long, new_val double")


def test_stale_base_gcd_generation_conflicts_up_front(spark, tmp_path):
    """A writer stale by >= 2 commits (its base generation GC'd under
    keep_generations=1) must get CommitConflictError — the signal the
    merge wrappers' retry loops re-plan on — not a FileNotFound
    mid-write from the staged scan."""
    path = str(tmp_path / "t")
    _init(spark, path)
    upd = _upd(spark, [(3, 33.0)])
    keys = upd.select(F.col("u_key").alias("__uk"))
    _, pruned, _, _, base = MG._cow_touched(spark, path, keys, keys, "k", "p")
    out = MG.scd2_apply(pruned, upd, "k", "u_key", "val", "new_val",
                        change_date="1998-01-01")
    assert base == 0
    # two interleaved commits: v2's GC (keep_generations=1) drops gen_v0
    for k, v in [(1, 11.0), (4, 44.0)]:
        MG.scd2_merge_cow(spark, path, _upd(spark, [(k, v)]),
                          "k", "u_key", "val", "new_val", "p",
                          change_date="1998-01-01")
    assert not os.path.isdir(CT._gen_dir(path, 0)), "precondition: base GC'd"
    with pytest.raises(CT.CommitConflictError, match="retention window"):
        CT.commit_generation(path, out, "p", operation="merge",
                             base_version=base)
    assert CT.read_manifest(path)["version"] == 2, "failed commit must not flip"
    assert not os.path.isdir(CT._gen_dir(path, 3)), "no staged leftover"


def test_concurrent_delete_ids_no_clobber(spark, tmp_path):
    """Two tombstone deletes racing (the online takedown path) must
    BOTH survive: atomic delta allocation gives them distinct d{n}
    slots instead of one overwrite-clobbering the other."""
    import threading

    from labs_stream_processing_examples_scala_spark.operators.similarity import (
        _seed_centroids,
    )
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table
    from labs_stream_processing_examples_scala_spark.streaming.ivf_ingest import (
        run_ivf_ingest,
    )

    src = str(tmp_path / "src")
    embs = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    embs.write.parquet(src)
    total = embs.count()
    proc = run_ivf_ingest(spark, src, str(tmp_path / "work"), _seed_centroids(spark, SF_SMOKE, 8))

    ids = [r.vec_id for r in embs.select("vec_id").orderBy("vec_id").limit(8).collect()]
    batches = [ids[:2], ids[2:4], ids[4:6], ids[6:8]]
    errors: list[Exception] = []

    def deleter(batch):
        try:
            proc.delete_ids(spark, batch)
        except Exception as e:  # noqa: BLE001 — surfaced via assert
            errors.append(e)

    ts = [threading.Thread(target=deleter, args=(b,)) for b in batches]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    # all four deltas landed in distinct slots and every id is hidden
    deltas = sorted(
        d for d in os.listdir(proc._tombstone_dir()) if d.startswith("d")
    )
    assert len(deltas) == 4, f"clobbered tombstone delta: {deltas}"
    left = {r.vec_id for r in proc.index(spark).select("vec_id").collect()}
    assert not (set(ids) & left), "a concurrent delete was lost"
    assert len(left) == total - 8


def test_alter_add_column_then_mor_upsert_deterministic(spark, tmp_path):
    """Schema evolution on the MOR tier: after alter_add_column, a
    mor_upsert must plan against the EVOLVED schema (mergeSchema +
    defaults) so appended version rows and inserts carry the added
    column deterministically — matched updates, inserts, and untouched
    rows all read back with the column populated."""
    path = str(tmp_path / "t")
    _init(spark, path)
    CT.alter_add_column(path, "tier", "string", default_sql="'standard'")

    s = MT.mor_upsert(
        spark, path,
        _upd(spark, [(3, 33.0), (300, 5.0)]),  # 3 = matched, 300 = insert
        "k", "u_key", "val", "new_val", "p",
        change_date="1998-01-01", insert_partition=F.lit("B"),
    )
    assert s["position_deletes"] == 1
    out = MT.read_mor(spark, path)
    assert "tier" in out.columns
    # every row — pre-alter base, appended closed+reopened versions,
    # and the insert — carries the default, never a sampled-schema null
    assert out.filter(F.col("tier").isNull()).count() == 0
    assert out.filter("k = 3").count() == 2  # closed + reopened
    got = {
        (r.k, r.val, r.is_current, r.tier)
        for r in out.filter("k IN (3, 300)").select("k", "val", "is_current", "tier").collect()
    }
    assert got == {
        (3, 3.0, False, "standard"),
        (3, 33.0, True, "standard"),
        (300, 5.0, True, "standard"),
    }
    # a second upsert over the now-mixed-schema generation (some files
    # carry `tier`, pre-alter ones don't) stays deterministic
    MT.mor_upsert(spark, path, _upd(spark, [(300, 6.0)]),
                  "k", "u_key", "val", "new_val", "p",
                  change_date="1999-01-01", insert_partition=F.lit("B"))
    out2 = MT.read_mor(spark, path)
    assert out2.filter(F.col("tier").isNull()).count() == 0
    assert out2.filter("k = 300 AND is_current").select("val").first()[0] == 6.0


def test_ingest_hot_bucket_resolves_distributed(spark, tmp_path):
    """Verdict round-7 task #2 / 'What's wrong #2': a pathological
    batch whose in-batch near-dup pairs exceed ``driver_resolve_cap``
    must resolve through the distributed per-component greedy
    (cogroup.applyInPandas over two-star components) with results
    IDENTICAL to the driver greedy, across two batches (exercising both
    the in-batch arm and the vs-kept knockout arm) and through a replay
    (idempotence retained). cap=0 forces EVERY batch down the failover
    path; the reference run uses the default cap (driver loop)."""
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table
    from labs_stream_processing_examples_scala_spark.streaming.ingest_pipeline import (
        StreamingIngestPipeline,
    )

    # hot-bucket fixture: 5 distinct texts × 40 identical copies each →
    # 5 × C(40,2) = 3900 verified in-batch pairs in batch 0, far past a
    # realistic collision count; batch 1 re-sends 2 copies per text (ko
    # arm: they match the kept index) plus fresh singletons
    base = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.length("text") > 80)
        .orderBy("doc_id")
        .limit(5)
        .select("text", "lang", "source")
        .collect()
    )
    rows0, rows1 = [], []
    for g, r in enumerate(base):
        for i in range(40):
            rows0.append((g * 1000 + i, r.text, r.lang, r.source, len(r.text)))
        for i in range(2):
            rows1.append((100_000 + g * 1000 + i, r.text, r.lang, r.source, len(r.text)))
    for j in range(3):  # fresh singletons in batch 1
        rows1.append((200_000 + j, f"unique document number {j} " * 20, "en", "web", 500))
    schema = "doc_id long, text string, lang string, source string, n_chars int"
    b0 = spark.createDataFrame(rows0, schema)
    b1 = spark.createDataFrame(rows1, schema)

    results = {}
    for name, cap in [("driver", 20_000), ("distributed", 0)]:
        proc = StreamingIngestPipeline(
            str(tmp_path / name), bench_shingles=[], quality_min=0.0,
            driver_resolve_cap=cap,
        )
        proc.process_batch(b0, 0)
        proc.process_batch(b1, 1)
        proc.process_batch(b1, 1)  # replay: idempotent_write must skip
        results[name] = {r.doc_id for r in proc.survivors(spark).collect()}

    assert results["driver"] == results["distributed"]
    surv = results["driver"]
    # exactly one survivor per hot group (greedy keeps the minimum —
    # every other member matches it directly), none of batch 1's dups
    # (ko by the kept index), all fresh singletons kept
    assert {d for d in surv if d < 100_000} == {g * 1000 for g in range(5)}
    assert not {d for d in surv if 100_000 <= d < 200_000}
    assert {d for d in surv if d >= 200_000} == {200_000, 200_001, 200_002}


def test_remove_dup_spans_matches_python_oracle(spark):
    """Third engine for the round-8 span-removal transform (the DuckDB
    SQL oracle shares the rolling-hash helpers, so this pure-Python
    remover over the RAW texts independently proves tokenization parity
    and hash-collision-freedom): keep-first-by-(doc_id, pos) per k-gram
    corpus-wide, excise covered token positions, rebuild with single
    spaces."""
    from labs_stream_processing_examples_scala_spark.operators.dedup import (
        SPAN_WORDS,
        remove_dup_spans,
    )
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    k = SPAN_WORDS
    rows = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: [w for w in (r.text or "").split(" ") if w] for r in rows}
    seen: set[tuple] = set()
    covered: dict[int, set[int]] = {}
    for d in sorted(toks):
        ws = toks[d]
        for p in range(len(ws) - k + 1):
            g = tuple(ws[p : p + k])
            if g in seen:
                covered.setdefault(d, set()).update(range(p, p + k))
            else:
                seen.add(g)
    want = {
        d: (
            " ".join(w for i, w in enumerate(ws) if i not in covered.get(d, set())),
            len(covered.get(d, set())),
        )
        for d, ws in toks.items()
    }
    got = {
        r.doc_id: (r.text, r.n_removed_tokens)
        for r in remove_dup_spans(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert any(n > 0 for _, n in want.values()), "fixture must exercise removal"
    assert any(n == 0 for _, n in want.values()), "fixture must have untouched docs"


def test_nsw_graph_ann_recall_and_structure(spark):
    """Round-8 graph-based ANN (sharded NSW): recall@10 vs exact brute
    force clears the registry floor; the graph is structurally sound —
    every vector present exactly once, degree ≤ M, neighbours stay
    inside their own shard (shards are independent by design); a
    second probe over the cached graph returns identical rows."""
    from labs_stream_processing_examples_scala_spark.operators import graph_ann as GA
    from labs_stream_processing_examples_scala_spark.operators import similarity as SIM
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    total = load_table(spark, SF_SMOKE, "embeddings").count()
    g = GA.nsw_build(spark, SF_SMOKE).collect()
    assert len(g) == total, "every vector must be in exactly one shard"
    by_id = {r.vec_id: r for r in g}
    shard_members: dict[int, set] = {}
    for r in g:
        shard_members.setdefault(r.part, set()).add(r.vec_id)
    for r in g:
        # round 9: blocked build keeps forward links ≤ m and reverse
        # merges up to the HNSW layer-0 degree cap of 2m
        assert len(r.nbrs) <= 2 * GA.M_LINKS, f"degree {len(r.nbrs)} > 2M at {r.vec_id}"
        assert set(r.nbrs) <= shard_members[r.part], "edge crossed a shard"
        assert r.vec_id not in set(r.nbrs), "self-loop"
    # connectivity floor: all but the first-inserted node have ≥1 edge
    n_shards = len(shard_members)
    isolated = [r.vec_id for r in g if len(r.nbrs) == 0]
    assert len(isolated) <= n_shards, f"too many isolated nodes: {isolated[:10]}"

    brute = [r.vec_id for r in SIM.brute_force_topk(spark, SF_SMOKE, k=10).collect()]
    got = [(r.vec_id, r.cos_sim) for r in GA.nsw_topk(spark, SF_SMOKE, k=10).collect()]
    recall = len(set(brute) & {v for v, _ in got}) / 10
    assert recall >= 0.85, f"NSW recall {recall} below floor"
    assert by_id  # silence linters; structure assertions above
    again = [(r.vec_id, r.cos_sim) for r in GA.nsw_topk(spark, SF_SMOKE, k=10).collect()]
    assert again == got, "probe over the cached graph must be deterministic"


def test_mor_delete_on_evolved_column_predicate(spark, tmp_path):
    """alter_add_column + mor_delete interplay: a DELETE WHERE over the
    EVOLVED column must see the projected defaults (pre-alter rows) and
    materialized values (post-alter appends) alike — the write planner
    reads through the same mergeSchema+defaults path as read_mor."""
    path = str(tmp_path / "t")
    _init(spark, path)
    CT.alter_add_column(path, "tier", "string", default_sql="'standard'")
    # one upsert materializes tier='standard' on new files; key 300 inserts
    MT.mor_upsert(spark, path, _upd(spark, [(3, 33.0), (300, 5.0)]),
                  "k", "u_key", "val", "new_val", "p",
                  change_date="1998-01-01", insert_partition=F.lit("B"))
    # delete every CURRENT standard-tier row in partition A — matches
    # pre-alter rows only through the projected default
    s = MT.mor_delete(spark, path, "tier = 'standard' AND p = 'A' AND is_current", "p")
    assert s["deleted_rows"] == 8  # 24 keys / 3 partitions = 8 current rows in A
    out = MT.read_mor(spark, path)
    assert out.filter("p = 'A' AND is_current").count() == 0
    assert out.filter("p = 'A' AND NOT is_current").count() > 0  # history kept
    assert out.filter("k = 300 AND is_current").count() == 1  # B untouched
    # re-running the same predicate is a no-op (idempotent by read-through)
    s2 = MT.mor_delete(spark, path, "tier = 'standard' AND p = 'A' AND is_current", "p")
    assert s2["deleted_rows"] == 0


def test_nsw_streaming_segments_lifecycle(spark, tmp_path):
    """Streaming NSW (segment model): ingest in micro-batches, probe
    recall clears the graph tier's floor; replaying a batch is a no-op
    (idempotent sink); delete_ids hides ids from the next probe on and
    backfills; segment merge (compaction) folds tombstoned vectors
    physically, keeps recall, and collapses the segment count."""
    from labs_stream_processing_examples_scala_spark.operators.similarity import (
        _query_embedding,
        brute_force_topk,
    )
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table
    from labs_stream_processing_examples_scala_spark.streaming.nsw_ingest import (
        run_nsw_ingest,
    )

    src = str(tmp_path / "src")
    embs = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    total = embs.count()
    embs.withColumn("split", F.pmod(F.col("vec_id"), F.lit(3))).repartitionByRange(
        3, "split"
    ).drop("split").write.parquet(src)
    proc = run_nsw_ingest(spark, src, str(tmp_path / "work"))
    qvec = _query_embedding(spark, SF_SMOKE, 0)

    assert proc.segments(spark).count() == total
    got = [r.vec_id for r in proc.probe(spark, qvec, 0, 10).collect()]
    brute = [r.vec_id for r in brute_force_topk(spark, SF_SMOKE, k=10).collect()]
    assert len(set(brute) & set(got)) / 10 >= 0.85

    # replay the last batch (what a restarted stream legally does —
    # the same input rows land in the same _batch_id dir, overwrite):
    # segment membership and probe quality unchanged
    b2 = {r.vec_id for r in proc.segments(spark).filter("seg = 2").select("vec_id").collect()}
    proc.process_batch(
        embs.join(
            spark.createDataFrame([(int(i),) for i in sorted(b2)], "vec_id long"),
            "vec_id",
        ),
        2,
    )
    assert proc.segments(spark).count() == total, "replay must be a no-op"
    assert {
        r.vec_id for r in proc.segments(spark).filter("seg = 2").select("vec_id").collect()
    } == b2
    got_replay = [r.vec_id for r in proc.probe(spark, qvec, 0, 10).collect()]
    assert len(set(brute) & set(got_replay)) / 10 >= 0.85
    got = got_replay  # downstream assertions compare against live state

    # online delete: victims vanish from results, probe backfills
    victims = got[:3]
    s = proc.delete_ids(spark, victims)
    assert s["ids"] == 3
    got2 = [r.vec_id for r in proc.probe(spark, qvec, 0, 10).collect()]
    assert not (set(victims) & set(got2))
    assert len(got2) == 10
    # concurrent second delete lands in its own delta slot
    proc.delete_ids(spark, victims)  # replay by value: harmless
    assert [r.vec_id for r in proc.probe(spark, qvec, 0, 10).collect()] == got2

    # segment merge: rebuilds one graph per shard over the merged span,
    # drops tombstoned vectors physically, keeps the newest batch out
    stats = proc.compact(spark)
    assert stats["compacted"]
    seg_after = proc.segments(spark)
    merged_victims = seg_after.filter(
        F.col("vec_id").isin(victims) & (F.col("seg") == -1)
    ).count()
    assert merged_victims == 0, "merge must fold tombstones out of merged segments"
    segs = {r.seg for r in seg_after.select("seg").distinct().collect()}
    assert -1 in segs and len(segs) == 2, f"expected merged + newest, got {segs}"
    got3 = [r.vec_id for r in proc.probe(spark, qvec, 0, 10).collect()]
    assert not (set(victims) & set(got3))
    assert len(set(brute) & set(got3 + victims)) / 10 >= 0.85


def test_lock_patience_covers_planning_phase(spark, tmp_path):
    """Round-8 review finding: the live-lock wait must engage when the
    OTHER process holds the lock during THIS writer's PLANNING heal
    (_cow_touched / _resolve_base) — the likelier collision, since a
    peer holds the lock for its whole staged Spark write. A live
    foreign holder that exits mid-wait must be waited out and stolen,
    the merge landing without caller retry code; with the patience
    capped below the holder's lifetime the error still surfaces."""
    import subprocess
    import threading

    path = str(tmp_path / "t")
    _init(spark, path)
    u = _upd(spark, [(3, 33.0)])

    def _expiring_holder(seconds: str) -> subprocess.Popen:
        """A live foreign pid that exits mid-wait — REAPED by a
        background thread the moment it dies (an unreaped zombie still
        answers kill(pid, 0), which would keep the lock 'alive')."""
        p = subprocess.Popen(["sleep", seconds])
        threading.Thread(target=p.wait, daemon=True).start()
        return p

    holder = _expiring_holder("3")
    try:
        with open(os.path.join(path, CT.WRITER_LOCK), "w") as f:
            f.write(str(holder.pid))
        s = MG.scd2_merge_cow(spark, path, u, "k", "u_key", "val", "new_val",
                              "p", change_date="1998-01-01", lock_timeout=60)
        assert s["version"] == 1, "merge must land after waiting out the holder"
    finally:
        holder.kill()

    # MOR tier, same phase: mor_delete's _resolve_base hits the holder
    holder2 = _expiring_holder("3")
    try:
        with open(os.path.join(path, CT.WRITER_LOCK), "w") as f:
            f.write(str(holder2.pid))
        s = MT.mor_delete(spark, path, "k = 4", "p", lock_timeout=60)
        assert s["deleted_rows"] == 1
    finally:
        holder2.kill()

    # patience below the holder's lifetime: the contract error surfaces
    holder3 = subprocess.Popen(["sleep", "30"])
    try:
        with open(os.path.join(path, CT.WRITER_LOCK), "w") as f:
            f.write(str(holder3.pid))
        with pytest.raises(CT.ConcurrentWriterError):
            MG.scd2_merge_cow(spark, path, _upd(spark, [(6, 66.0)]),
                              "k", "u_key", "val", "new_val", "p",
                              change_date="1999-01-01", lock_timeout=0.5)
    finally:
        holder3.kill()
        holder3.wait()
        os.remove(os.path.join(path, CT.WRITER_LOCK))


_WRITER_SCRIPT = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from labs_stream_processing_examples_scala_spark import get_spark
import labs_stream_processing_examples_scala_spark.operators.cow_table as CT
import labs_stream_processing_examples_scala_spark.operators.merge as MG
from pyspark.sql import functions as F

path, key, val, tag, sync = sys.argv[1], int(sys.argv[2]), float(sys.argv[3]), sys.argv[4], sys.argv[5]
spark = get_spark(app_name="occ-proc-" + tag, shuffle_partitions=4)
upd = spark.createDataFrame([(key, val)], "u_key long, new_val double")
keys = upd.select(F.col("u_key").alias("__uk"))
_, pruned, _, _, base = MG._cow_touched(spark, path, keys, keys, "k", "p")
out = MG.scd2_apply(pruned, upd, "k", "u_key", "val", "new_val",
                    change_date="1998-01-01")
# materialize the plan so the commit below holds the lock briefly
out = spark.createDataFrame(out.collect(), out.schema)
open(os.path.join(sync, "ready_" + tag), "w").close()
while not os.path.exists(os.path.join(sync, "go")):
    time.sleep(0.05)
# commit with the caller-side live-lock patience (CT.lock_retry_loop —
# the same loop the merge wrappers now run): whichever process commits
# second waits out the first's critical section, then REBASES its
# stale-base plan through the OCC footprint check
wait = CT.lock_retry_loop(120.0)
while True:
    try:
        s = CT.commit_generation(path, out, "p", operation="merge",
                                 base_version=base)
        break
    except CT.ConcurrentWriterError:
        if not wait():
            raise
print("COMMITTED", tag, s["version"], base, flush=True)
spark.stop()
"""


def test_cross_process_disjoint_writers_both_commit(spark, tmp_path):
    """Verdict round-7 task #7: two REAL OS processes (separate JVMs —
    the in-process RLock layer cannot serialize them) plan against the
    same base, then commit concurrently on a file barrier. Both must
    land via the OCC rebase (pid-lockfile + flock steal-guard + _log
    footprints are the only coordination), the log survives, and the
    table equals the serial execution."""
    path = str(tmp_path / "t")
    df = _init(spark, path)
    sync = str(tmp_path / "sync")
    os.makedirs(sync)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = str(tmp_path / "writer.py")
    with open(script, "w") as f:
        f.write(_WRITER_SCRIPT.format(repo=repo))

    # key 3 → partition A, key 1 → partition B: disjoint footprints
    procs = [
        subprocess.Popen(
            [sys.executable, script, path, str(k), str(v), tag, sync],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for k, v, tag in [(3, 33.0, "a"), (1, 11.0, "b")]
    ]
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if all(
                os.path.exists(os.path.join(sync, f"ready_{t}")) for t in ("a", "b")
            ):
                break
            if any(p.poll() is not None for p in procs):
                break  # a writer died before the barrier — fail below
            time.sleep(0.1)
        open(os.path.join(sync, "go"), "w").close()
        outs = [p.communicate(timeout=240) for p in procs]
    finally:
        for p in procs:
            p.kill()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"writer failed:\n{so}\n{se}"
        assert "COMMITTED" in so
    assert CT.read_manifest(path)["version"] == 2, "one commit was lost"

    want = MG.scd2_apply(
        MG.scd2_apply(MG.scd2_init(df), _upd(spark, [(3, 33.0)]),
                      "k", "u_key", "val", "new_val", change_date="1998-01-01"),
        _upd(spark, [(1, 11.0)]), "k", "u_key", "val", "new_val",
        change_date="1998-01-01",
    )
    cols = ["k", "p", "val", "valid_from", "valid_to", "is_current"]
    got = frozenset(tuple(r) for r in CT.read_cow(spark, path).select(*cols).collect())
    assert got == frozenset(tuple(r) for r in want.select(*cols).collect())
    # both versions' footprints are in the retention-independent log
    assert os.path.exists(os.path.join(path, CT.ROOT_LOG, "v1.json"))
    assert os.path.exists(os.path.join(path, CT.ROOT_LOG, "v2.json"))
