"""Compaction of batch-id-partitioned streaming outputs
(streaming/compaction.py): merged indexes must read identically at
every crash point of the marker protocol, continued ingest over a
compacted index must stay equivalent to the batch operator, and the
file count must actually drop (the point of the exercise)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.streaming.compaction import (
    MARKER,
    STAGING,
    _batch_ids,
    compact_batched_dir,
    read_batched_dir,
)
from labs_stream_processing_examples_scala_spark.streaming.sinks import idempotent_write
from tests.conftest import SF_SMOKE


def _write_batches(spark, path: str, n_batches: int = 4, rows_per: int = 100):
    for b in range(n_batches):
        df = spark.range(b * rows_per, (b + 1) * rows_per).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        idempotent_write(df.repartition(4), path, b)  # 4 small files/batch


def _ids(spark, path, before=None):
    return sorted(
        r.id for r in read_batched_dir(spark, path, "id long, v long", before).collect()
    )


def test_compact_merges_and_preserves_reads(spark, tmp_path):
    path = str(tmp_path / "out")
    _write_batches(spark, path)
    full = _ids(spark, path)
    assert len(full) == 400
    before2 = _ids(spark, path, before=2)

    stats = compact_batched_dir(spark, path, target_bytes=1 << 30)
    # keep_latest: batches 0..2 merge into _batch_id=2; 3 stays
    assert stats["compacted"] and stats["sources"] == [0, 1, 2] and stats["target_id"] == 2
    assert _batch_ids(path) == [2, 3]
    assert stats["files_after"] < stats["files_before"]
    assert _ids(spark, path) == full
    # batch-id semantics survive: a replay of batch 3 (the only legal
    # replay) still sees everything below it
    assert _ids(spark, path, before=3) == sorted(range(300))
    # re-run is a no-op (only [2] would merge below the latest)
    assert compact_batched_dir(spark, path)["compacted"] is False
    # retire mode merges everything into one dir
    stats2 = compact_batched_dir(spark, path, keep_latest=False)
    assert stats2["compacted"] and _batch_ids(path) == [3]
    assert _ids(spark, path) == full


def test_reader_is_complete_at_every_crash_point(spark, tmp_path):
    """Walk the protocol's crash windows by constructing each on-disk
    state and asserting the reader returns the full row set."""
    path = str(tmp_path / "out")
    _write_batches(spark, path)
    full = _ids(spark, path)

    # window A: marker written, staging incomplete (no _SUCCESS) —
    # sources untouched, staging must be ignored
    os.makedirs(os.path.join(path, STAGING))
    import json

    with open(os.path.join(path, MARKER), "w") as f:
        json.dump({"target_id": 2, "sources": [0, 1, 2], "staging": STAGING}, f)
    assert _ids(spark, path) == full
    # recovery: rolls the stale attempt back, then compacts fresh
    stats = compact_batched_dir(spark, path, target_bytes=1 << 30)
    assert stats["compacted"] and not os.path.exists(os.path.join(path, MARKER))
    assert _ids(spark, path) == full

    # window B: committed staging (_SUCCESS), sources partially deleted,
    # rename not yet done — staging is the truth for its sources
    path2 = str(tmp_path / "out2")
    _write_batches(spark, path2)
    merged = read_batched_dir(spark, path2, before_batch=3)
    merged.repartition(1).write.parquet(os.path.join(path2, STAGING))
    with open(os.path.join(path2, MARKER), "w") as f:
        json.dump({"target_id": 2, "sources": [0, 1, 2], "staging": STAGING}, f)
    shutil.rmtree(os.path.join(path2, "_batch_id=0"))  # crash mid-delete
    assert _ids(spark, path2) == full
    assert _ids(spark, path2, before=3) == sorted(range(300))
    # recovery resumes: finish deletes + rename
    stats = compact_batched_dir(spark, path2)
    assert stats["compacted"] and stats.get("resumed")
    assert _batch_ids(path2) == [2, 3] and _ids(spark, path2) == full

    # window C: rename done, marker left behind — reader ignores the
    # stale marker (staging gone), dirs are already correct
    path3 = str(tmp_path / "out3")
    _write_batches(spark, path3)
    compact_batched_dir(spark, path3, target_bytes=1 << 30)
    with open(os.path.join(path3, MARKER), "w") as f:
        json.dump({"target_id": 2, "sources": [0, 1, 2], "staging": STAGING}, f)
    assert _ids(spark, path3) == full


def test_incremental_dedup_online_compaction_equivalent(spark, tmp_path):
    """compact_every: the processor compacts its own indexes inside
    foreachBatch. Results must equal the batch operator exactly and the
    directory count must be bounded by the cadence, not the batch
    count."""
    from labs_stream_processing_examples_scala_spark.operators.dedup import lsh_candidate_pairs
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table
    from labs_stream_processing_examples_scala_spark.streaming.incremental_dedup import (
        run_incremental,
    )

    src = str(tmp_path / "src")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    docs.withColumn("split", F.pmod(F.col("doc_id"), F.lit(6))).repartitionByRange(
        6, "split"
    ).drop("split").write.parquet(src)
    proc = run_incremental(spark, src, str(tmp_path / "work"), compact_every=2)
    got = {(r.doc_a, r.doc_b): round(r.jaccard, 6) for r in proc.pairs(spark).collect()}
    want = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in lsh_candidate_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want
    # 6 batches at cadence 2: everything below the latest is one dir
    assert len(_batch_ids(proc.buckets_dir)) <= 3


def test_incremental_dedup_survives_compaction_mid_stream(spark, tmp_path):
    """Ingest 3 of 4 splits, compact the index dirs, ingest the 4th
    from the same checkpoint: the accumulated pair set must still equal
    the batch operator over the whole corpus — i.e. the compacted index
    serves the new batch's bucket-join and before_batch view exactly."""
    from labs_stream_processing_examples_scala_spark.operators.dedup import lsh_candidate_pairs
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table
    from labs_stream_processing_examples_scala_spark.streaming.incremental_dedup import (
        run_incremental,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", F.pmod(F.col("doc_id"), F.lit(4)).alias("split")
    )
    src = str(tmp_path / "src")
    os.makedirs(src)

    def add_split(s: int) -> None:
        # one plain parquet FILE per split at the stream-dir root, so
        # maxFilesPerTrigger=1 → one micro-batch per split
        stage = str(tmp_path / f"stage{s}")
        docs.filter(F.col("split") == s).drop("split").coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        shutil.move(os.path.join(stage, part), os.path.join(src, f"split{s}.parquet"))

    for s in range(3):
        add_split(s)
    work = str(tmp_path / "work")
    proc = run_incremental(spark, src, work)
    n_dirs_before = len(_batch_ids(proc.buckets_dir))
    assert n_dirs_before == 3
    for d in (proc.arrays_dir, proc.buckets_dir, proc.pairs_dir):
        compact_batched_dir(spark, d, target_bytes=1 << 30)
    assert _batch_ids(proc.buckets_dir) == [1, 2]

    # 4th split arrives later; availableNow resumes from the checkpoint
    add_split(3)
    proc = run_incremental(spark, src, work)
    got = {(r.doc_a, r.doc_b): round(r.jaccard, 6) for r in proc.pairs(spark).collect()}
    want = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in lsh_candidate_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want
