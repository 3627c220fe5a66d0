"""Takedown orchestration (operators/takedown.py): one call removes
documents from the MOR table AND the streaming ANN index, the audit
feed carries exactly the removed rows, and re-running the same
takedown is a no-op in both stores."""

from __future__ import annotations

from pyspark.sql import functions as F

import labs_stream_processing_examples_scala_spark.operators.cow_table as CT
import labs_stream_processing_examples_scala_spark.operators.merge as MG
import labs_stream_processing_examples_scala_spark.operators.mor_table as MT
from labs_stream_processing_examples_scala_spark.operators.takedown import (
    takedown,
    takedown_audit,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _docs_table(spark, path):
    """A doc table keyed like the embeddings (doc_id == vec_id),
    partitioned by lang — the one-embedding-per-document layout."""
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    docs = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select(F.col("vec_id").alias("doc_id"))
        .withColumn("lang", F.concat(F.lit("l"), F.pmod("doc_id", F.lit(3))))
        .withColumn("body", F.concat(F.lit("doc-"), F.col("doc_id")))
    )
    CT.cow_init(docs, path, "lang")
    return docs


def test_takedown_hits_table_and_index_and_audits(spark, tmp_path):
    from labs_stream_processing_examples_scala_spark.operators.similarity import (
        _query_embedding,
        _seed_centroids,
    )
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table
    from labs_stream_processing_examples_scala_spark.streaming.ivf_ingest import (
        IncrementalIvfIndex,
    )

    docs_path = str(tmp_path / "docs")
    docs = _docs_table(spark, docs_path)
    n = docs.count()

    idx = IncrementalIvfIndex(
        str(tmp_path / "idx"), _seed_centroids(spark, SF_SMOKE, 16)
    )
    embs = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    idx.process_batch(embs, 0)
    qvec = _query_embedding(spark, SF_SMOKE, 0)
    victims = [r.vec_id for r in idx.probe(spark, qvec, 0, 5, 4).collect()][:2]

    s = takedown(spark, docs_path, "doc_id", "lang", victims, index=idx)
    assert s["doc_ids"] == 2 and s["table"]["deleted_rows"] == 2
    assert s["index"]["ids"] == 2

    # table: rows gone, zero base-file rewrite (vector-only commit)
    assert MT.read_mor(spark, docs_path).count() == n - 2
    assert CT.changed_partitions(docs_path, *s["audit_feed_versions"]) == []
    # index: victims never returned again, next-best backfills
    got = [r.vec_id for r in idx.probe(spark, qvec, 0, 5, 4).collect()]
    assert not (set(victims) & set(got)) and len(got) == 5

    # audit feed = exactly the removed rows
    audit = takedown_audit(spark, docs_path, s["audit_feed_versions"])
    rows = audit.collect()
    assert {r["change_type"] for r in rows} == {"delete"}
    assert sorted(r["doc_id"] for r in rows) == sorted(victims)

    # idempotent retry (the crash-between-stores story): no-ops
    s2 = takedown(spark, docs_path, "doc_id", "lang", victims, index=idx)
    assert s2["table"]["deleted_rows"] == 0
    assert MT.read_mor(spark, docs_path).count() == n - 2
    assert [r.vec_id for r in idx.probe(spark, qvec, 0, 5, 4).collect()] == got


def test_takedown_fans_out_to_multiple_indexes(spark, tmp_path):
    """Round 8: a corpus carrying BOTH ANN tiers (IVF and NSW) takes
    one takedown call — every index tombstones (before the table, each
    preserving the fail-safe ordering) and stops returning the
    victims; the table's audit feed carries exactly the removed rows."""
    from labs_stream_processing_examples_scala_spark.operators.similarity import (
        _query_embedding,
        _seed_centroids,
    )
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table
    from labs_stream_processing_examples_scala_spark.streaming.ivf_ingest import (
        run_ivf_ingest,
    )
    from labs_stream_processing_examples_scala_spark.streaming.nsw_ingest import (
        run_nsw_ingest,
    )

    docs_path = str(tmp_path / "docs")
    _docs_table(spark, docs_path)
    src = str(tmp_path / "src")
    embs = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    embs.write.parquet(src)
    ivf = run_ivf_ingest(
        spark, src, str(tmp_path / "ivf"), _seed_centroids(spark, SF_SMOKE, 8)
    )
    nsw = run_nsw_ingest(spark, src, str(tmp_path / "nsw"))

    qvec = _query_embedding(spark, SF_SMOKE, 0)
    victims = [r.vec_id for r in ivf.probe(spark, qvec, 0, 10, 4).collect()][:3]

    s = takedown(spark, docs_path, "doc_id", "lang", victims, index=[ivf, nsw])
    assert [rec["ids"] for rec in s["index"]] == [3, 3]
    assert s["table"]["deleted_rows"] == 3

    for idx in (ivf.probe(spark, qvec, 0, 10, 4), nsw.probe(spark, qvec, 0, 10)):
        got = [r.vec_id for r in idx.collect()]
        assert not (set(victims) & set(got)), "an index still returns a victim"
        assert len(got) == 10
    assert MT.read_mor(spark, docs_path).filter(
        F.col("doc_id").isin(victims)
    ).count() == 0
    audit = takedown_audit(spark, docs_path, s["audit_feed_versions"])
    assert {r.doc_id for r in audit.collect()} == set(victims)

    # idempotent retry across ALL stores
    s2 = takedown(spark, docs_path, "doc_id", "lang", victims, index=[ivf, nsw])
    assert s2["table"]["deleted_rows"] == 0


def test_takedown_nsw_survives_mid_compaction_crash(spark, tmp_path):
    """Round-9 verdict task #6: takedown through the NSW SEGMENT model
    under a crash between the tombstone write and the segment merge —
    the kill-matrix treatment the IVF tier has. At every crash window
    the probe must already hide the victims (tombstones filter at
    search), the takedown replay must be a no-op, and the recovered
    compaction must fold the victims OUT PHYSICALLY while keeping
    probe quality."""
    import json
    import os

    from labs_stream_processing_examples_scala_spark.operators.similarity import (
        _query_embedding,
    )
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table
    from labs_stream_processing_examples_scala_spark.streaming.compaction import (
        MARKER,
        STAGING,
    )
    from labs_stream_processing_examples_scala_spark.streaming.nsw_ingest import (
        run_nsw_ingest,
    )

    docs_path = str(tmp_path / "docs")
    _docs_table(spark, docs_path)
    src = str(tmp_path / "src")
    embs = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    total = embs.count()
    embs.withColumn("split", F.pmod(F.col("vec_id"), F.lit(3))).repartitionByRange(
        3, "split"
    ).drop("split").write.parquet(src)
    nsw = run_nsw_ingest(spark, src, str(tmp_path / "nsw"))
    qvec = _query_embedding(spark, SF_SMOKE, 0)
    victims = [r.vec_id for r in nsw.probe(spark, qvec, 0, 10).collect()][:3]

    # --- crash window 1: tombstone written, compact never started ---
    s = takedown(spark, docs_path, "doc_id", "lang", victims, index=nsw)
    assert s["index"]["ids"] == 3
    got1 = [r.vec_id for r in nsw.probe(spark, qvec, 0, 10).collect()]
    assert not (set(victims) & set(got1)) and len(got1) == 10
    # the victims are still physical graph rows (waypoints until merged)
    assert nsw.segments(spark).filter(
        F.col("vec_id").isin(victims)
    ).count() == 3

    # replaying the takedown in this window is a no-op everywhere
    s2 = takedown(spark, docs_path, "doc_id", "lang", victims, index=nsw)
    assert s2["table"]["deleted_rows"] == 0
    assert [r.vec_id for r in nsw.probe(spark, qvec, 0, 10).collect()] == got1

    # --- crash window 2: compaction marker written, staging incomplete
    # (no _SUCCESS) — the reader must ignore the stale attempt, probes
    # unchanged, and recovery must roll it back then compact fresh ---
    os.makedirs(os.path.join(nsw.seg_dir, STAGING), exist_ok=True)
    with open(os.path.join(nsw.seg_dir, MARKER), "w") as f:
        json.dump({"target_id": 1, "sources": [0, 1], "staging": STAGING}, f)
    assert nsw.segments(spark).count() == total, "stale staging leaked into reads"
    got2 = [r.vec_id for r in nsw.probe(spark, qvec, 0, 10).collect()]
    assert got2 == got1, "mid-crash probe changed"

    stats = nsw.compact(spark)
    assert stats["compacted"]
    assert not os.path.exists(os.path.join(nsw.seg_dir, MARKER))

    # merged segment: victims folded out PHYSICALLY (not just filtered);
    # the newest batch stays unmerged per the replay contract, so any
    # victim row remaining must live there and stay tombstone-filtered
    merged_victims = nsw.segments(spark).filter(
        (F.col("seg") == -1) & F.col("vec_id").isin(victims)
    )
    assert merged_victims.count() == 0, "compaction resurrected a victim"
    got3 = [r.vec_id for r in nsw.probe(spark, qvec, 0, 10).collect()]
    assert not (set(victims) & set(got3)) and len(got3) == 10

    # replay-idempotence AFTER the fold: same no-op contract
    s3 = takedown(spark, docs_path, "doc_id", "lang", victims, index=nsw)
    assert s3["table"]["deleted_rows"] == 0
    assert [r.vec_id for r in nsw.probe(spark, qvec, 0, 10).collect()] == got3


def test_takedown_accepts_string_document_ids(spark, tmp_path):
    """Purge lists are commonly string/UUID keyed; the old int()
    coercion made such a takedown unexecutable (self-review, r11)."""
    path = str(tmp_path / "docs")
    rows = [(f"doc-{k:05d}", "en" if k % 2 else "fr", float(k)) for k in range(8)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, score double")
    CT.cow_init(df, path, "lang")
    out = takedown(spark, path, "doc_id", "lang", ["doc-00003", "doc-00004"])
    assert out["doc_ids"] == 2
    left = {r.doc_id for r in MT.read_mor(spark, path).collect()}
    assert "doc-00003" not in left and "doc-00004" not in left
    assert len(left) == 6
