"""Incremental materialized view: equivalence, row-collapsing
compaction, and continued-ingest across a restart.

(The registry entry x_mv_event_stats — 3 micro-batches + one
compaction ≡ the batch GROUP BY — is additionally hash-checked against
DuckDB on every pytest run by test_registry_oracle.)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.streaming import materialized_view as MV
from labs_stream_processing_examples_scala_spark.streaming.compaction import read_batched_dir
from tests.conftest import SF_SMOKE


def _batch_agg(df):
    v = F.col("value").cast("double")
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum(v), 6).alias("sum_v"),
        F.round(F.min(v), 6).alias("min_v"),
        F.round(F.max(v), 6).alias("max_v"),
        F.round(F.sum(v) / F.count("*"), 6).alias("avg_v"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_view_equals_batch_agg_and_compaction_collapses_rows(spark, tmp_path):
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    src = str(tmp_path / "src")
    ev.withColumn("s", F.pmod("event_id", F.lit(4))).repartitionByRange(4, "s").drop(
        "s"
    ).write.parquet(src)

    proc = MV.run_incremental_view(
        spark,
        src,
        str(tmp_path / "mv"),
        key_cols=["event_type"],
        key_schema="event_type string",
        value_col="value",
        compact_every=2,
    )
    assert _rows(proc.view(spark)) == _rows(_batch_agg(ev))

    # after the batch-1 and batch-3 compactions, the delta table holds
    # one collapsed span + the kept-latest batch: ≤ 2 × n_keys rows
    n_keys = ev.select("event_type").distinct().count()
    deltas = read_batched_dir(spark, proc.deltas_dir, proc.delta_schema)
    assert deltas.count() <= 2 * n_keys


def test_view_survives_restart_and_continued_ingest(spark, tmp_path):
    """Ingest half the files, stop; add the rest, restart on the SAME
    checkpoint/workdir: the view serves the full aggregate with
    nothing lost or double-counted (replay + compaction included)."""
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    work = str(tmp_path / "mv")
    first.repartition(2).write.parquet(src)

    kwargs = dict(
        key_cols=["event_type"],
        key_schema="event_type string",
        value_col="value",
        compact_every=2,
    )
    proc = MV.run_incremental_view(spark, src, work, **kwargs)
    assert _rows(proc.view(spark)) == _rows(_batch_agg(first))

    # drop in more files and resume from the same checkpoint
    second.repartition(2).write.mode("append").parquet(src)
    proc = MV.run_incremental_view(spark, src, work, **kwargs)
    assert _rows(proc.view(spark)) == _rows(_batch_agg(ev))


def test_replayed_batch_is_a_content_noop(spark, tmp_path):
    """Re-delivering a committed micro-batch (at-least-once) overwrites
    its delta directory with identical content — the view is unchanged."""
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "event_type", "value")
        .limit(200)
    )
    proc = MV.IncrementalAggView(
        str(tmp_path / "mv"), ["event_type"], "event_type string", "value"
    )
    proc.process_batch(ev, 0)
    before = _rows(proc.view(spark))
    proc.process_batch(ev, 0)  # replay
    assert _rows(proc.view(spark)) == before
    # exactly one delta dir — the replay reused it
    assert os.listdir(proc.deltas_dir) == ["_batch_id=0"]


def test_distinct_view_tracks_exact_counts(spark):
    """Sketch-partial MV: the incrementally-merged HLL estimate per
    event_type is within 2% of the exact distinct user count."""
    got = {r["event_type"]: r["approx_distinct"] for r in
           MV.incremental_distinct_users(spark, SF_SMOKE).collect()}
    exact = {r["event_type"]: r["n"] for r in
             spark.read.parquet(f"{SF_SMOKE}/events.parquet")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n"))
             .collect()}
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(2, 0.02 * n), (k, got[k], n)


def test_view_complete_when_transform_compaction_crashes_mid_swap(spark, tmp_path):
    """Crash window for the ROW-COLLAPSING compaction: staging holds
    transformed (re-merged) partial rows and the marker is committed,
    but sources are only partially deleted. The marker-aware reader
    must serve staging ∪ surviving-unmerged dirs, and because partials
    re-aggregate at read time, the view still equals the batch agg."""
    import json
    import shutil

    from labs_stream_processing_examples_scala_spark.streaming.compaction import (
        STAGING,
        _marker_path,
    )

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "event_type", "value")
        .limit(300)
    )
    proc = MV.IncrementalAggView(
        str(tmp_path / "mv"), ["event_type"], "event_type string", "value"
    )
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    for i, p in enumerate(parts):
        proc.process_batch(p, i)

    path = proc.deltas_dir
    # hand-construct the committed-but-unswapped state with the
    # transform applied (exactly what compact_batched_dir stages)
    merged = spark.read.option("basePath", path).parquet(
        os.path.join(path, "_batch_id=0"), os.path.join(path, "_batch_id=1")
    ).drop("_batch_id")
    proc._merge_partials(merged).repartition(1).write.parquet(
        os.path.join(path, STAGING)
    )
    with open(_marker_path(path), "w") as f:
        json.dump({"target_id": 1, "sources": [0, 1], "staging": STAGING}, f)
    shutil.rmtree(os.path.join(path, "_batch_id=0"))  # crash mid-delete

    assert _rows(proc.view(spark)) == _rows(_batch_agg(ev))


def test_time_travel_view_as_of_each_batch(spark, tmp_path):
    """Every committed micro-batch is a readable snapshot: the view as
    of batch k equals the batch aggregate over the first k+1 ingested
    slices (and the final as-of equals the live view)."""
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "event_type", "value")
        .limit(400)
    )
    proc = MV.IncrementalAggView(
        str(tmp_path / "mv"), ["event_type"], "event_type string", "value"
    )
    slices = [ev.filter(F.col("event_id") % 4 == i) for i in range(4)]
    for i, s in enumerate(slices):
        proc.process_batch(s, i)

    acc = None
    for k, s in enumerate(slices):
        acc = s if acc is None else acc.unionByName(s)
        assert _rows(MV.view_as_of(proc, spark, k)) == _rows(_batch_agg(acc)), k
    assert _rows(MV.view_as_of(proc, spark, 3)) == _rows(proc.view(spark))


def test_streaming_heavy_hitters_error_bounds(spark, tmp_path):
    """The merged-MG view's per-token guarantee holds against exact
    counts of everything ingested: est ≤ true ≤ est + max_undercount,
    and every token with true count > 2·N/K is present."""
    from collections import Counter

    from labs_stream_processing_examples_scala_spark.operators.frequency import K_COUNTERS

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    proc = MV.IncrementalHeavyHittersView(str(tmp_path / "hh"), compact_every=2)
    for i in range(3):
        proc.process_batch(docs.filter(F.col("doc_id") % 3 == i), i)

    got = {r["token"]: (r["est"], r["max_undercount"]) for r in
           proc.view(spark).collect()}
    exact: Counter = Counter()
    for r in docs.collect():
        for w in r["text"].split(" "):
            if w:
                exact[w] += 1
    n_total = sum(exact.values())
    assert got, "summary is empty"
    for tok, (est, bound) in got.items():
        assert est <= exact[tok] <= est + bound, (tok, est, bound, exact[tok])
    for tok, true in exact.items():
        if true > 2 * n_total / K_COUNTERS:
            assert tok in got, (tok, true)
