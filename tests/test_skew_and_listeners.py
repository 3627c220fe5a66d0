"""Skew utilities ≡ plain plans; K5 ack tracking via listener."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.operators import skew
from labs_stream_processing_examples_scala_spark.streaming.listeners import AckTracker
from tests.conftest import SF_SMOKE


def _skewed_df(spark):
    # 90% of rows share one key — the shape that melts a single reducer
    return spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_agg_equals_plain(spark):
    df = _skewed_df(spark)
    got = skew.salted_agg(
        df, ["k"], {"total": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")}
    )
    want = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("v").alias("n"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_agg_rejects_non_decomposable(spark):
    import pytest

    with pytest.raises(ValueError):
        skew.salted_agg(_skewed_df(spark), ["k"], {"a": ("avg", "v")})


def test_salted_join_equals_plain(spark):
    large = _skewed_df(spark)
    small = spark.createDataFrame([(1, "hot"), (13, "cold")], ["k", "label"])
    got = skew.salted_join(large, small, ["k"])
    want = large.join(small, ["k"])
    assert got.count() == want.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    large = _skewed_df(spark)
    small = spark.createDataFrame([(1, "hot")], ["k", "label"])
    got = skew.salted_join(large, small, ["k"], how="left")
    want = large.join(small, ["k"], "left")
    assert got.count() == want.count()
    assert got.filter(F.col("label").isNull()).count() == want.filter(F.col("label").isNull()).count()


def test_events_by_type_salted_equals_plain_groupby(spark):
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    got = skew.events_by_type_salted(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    want = (
        ev.groupBy("event_type")
        .agg(
            F.count("event_id").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )
    assert got.collect() == want.collect()


def test_events_by_segment_salted_forces_shuffle_join(spark):
    # the salted form must (a) match the plain join, (b) actually take
    # the shuffle-join path — a broadcast would silently defeat salting
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    got = skew.events_by_segment_salted(spark, SF_SMOKE)
    assert "SortMergeJoin" in got._jdf.queryExecution().executedPlan().toString()
    ev = load_table(spark, SF_SMOKE, "events")
    cust = load_table(spark, SF_SMOKE, "customer")
    want = (
        ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("c_mktsegment")
    )
    assert got.collect() == want.collect()


def test_ack_tracker_observes_batch_commits(spark, tmp_path):
    from labs_stream_processing_examples_scala_spark.streaming.pipeline import StreamingEnrichmentPipeline
    from labs_stream_processing_examples_scala_spark.streaming.sources import events_message_stream

    tracker = AckTracker()
    spark.streams.addListener(tracker)
    try:
        pipe = StreamingEnrichmentPipeline(
            str(tmp_path / "out"), str(tmp_path / "dlq"), str(tmp_path / "ckpt")
        )
        pipe.run_bounded(events_message_stream(spark, SF_SMOKE))
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline and not tracker.log.acked:
            time.sleep(0.25)  # listener bus is async
        assert tracker.log.started >= 1
        assert tracker.log.terminated >= 1 or tracker.log.acked
        total_rows = sum(a.num_input_rows for a in tracker.log.acked)
        assert total_rows == 1000  # every input row was in an acked batch
        assert tracker.log.exception is None
    finally:
        spark.streams.removeListener(tracker)


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew-join handling — the first line of defense
    before explicit salting (operators/skew.py): a hot key's oversized
    shuffle partition is split at runtime (AQEShuffleRead ... skewed) and
    the join result is still exact."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # thresholds scaled down so local-size data exhibits the 100 TB
        # phenomenon: one key owning 75% of the fact
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.range(400_000).select(
            F.when(F.col("id") < 300_000, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = fact.join(dim.hint("merge"), "k")
        assert len(j.collect()) == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert any("skewed" in line for line in plan.splitlines() if "AQEShuffleRead" in line), plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
