"""Physical-layout scale levers: bucketed co-located joins (no shuffle)
and directory-partitioned writes (partition pruning). These are plan-
property tests — the 100 TB posture is the contract being tested."""

from __future__ import annotations

from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.sources import layout as L
from labs_stream_processing_examples_scala_spark.sources.batch import load_table
from tests.conftest import SF_SMOKE


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    # the scenario bucketing exists for is fact⋈fact where NEITHER side
    # broadcasts — at sf0.001 the planner would broadcast instead, so
    # disable it to exercise the 100 TB plan shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = L.demo_bucketed_orders_lineitem(spark, SF_SMOKE, n_buckets=4)
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # and it is still a real join producing the right row count
        o = load_table(spark, SF_SMOKE, "orders")
        li = load_table(spark, SF_SMOKE, "lineitem")
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_reuses_layout(spark):
    # an aggregation keyed on the bucket column also needs no exchange
    L.write_bucketed(
        load_table(spark, SF_SMOKE, "orders").withColumnRenamed("o_orderkey", "orderkey"),
        "orders_b_agg",
        "orderkey",
        4,
    )
    agg = spark.table("orders_b_agg").groupBy("orderkey").agg(F.sum("o_totalprice").alias("t"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF_SMOKE, "events")
    L.write_partitioned(ev, path, "event_type")
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _executed_plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan
    # pruned read returns exactly the partition's rows
    assert back.count() == ev.filter(F.col("event_type") == "click").count()
