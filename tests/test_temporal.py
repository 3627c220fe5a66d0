"""Temporal joins: the window-based as-of join must agree with pandas
merge_asof (the reference semantics everyone knows), and the bucketed
range join must equal the naive theta join."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.operators import temporal as TP
from tests.conftest import SF_SMOKE


def test_asof_matches_pandas_merge_asof(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    got = {
        r.event_id: r.last_view_id
        for r in TP.clicks_last_view(spark, SF_SMOKE).collect()
    }
    pdf = ev.select("event_id", "user_id", "ts", "event_type").toPandas()
    clicks = pdf[pdf.event_type == "click"].sort_values("ts")
    views = (
        pdf[pdf.event_type == "view"]
        .rename(columns={"event_id": "view_id"})
        .sort_values("ts")
    )
    want = pd.merge_asof(
        clicks, views[["user_id", "ts", "view_id"]], on="ts", by="user_id", direction="backward"
    )
    for row in want.itertuples():
        expect = None if pd.isna(row.view_id) else int(row.view_id)
        assert got[row.event_id] == expect, f"click {row.event_id}: {got[row.event_id]} != {expect}"


def test_range_join_bucketed_equals_naive(spark):
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .filter(F.col("o_totalprice") > 450000)
        .select("o_orderkey", "o_orderdate")
    )
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    lower, upper = F.expr("INTERVAL -1 DAY"), F.expr("INTERVAL 1 DAY")
    bucketed = TP.range_join(o, li, "o_orderdate", "l_shipdate", lower, upper)
    naive = o.join(
        li,
        (F.col("l_shipdate") >= F.col("o_orderdate") + lower)
        & (F.col("l_shipdate") <= F.col("o_orderdate") + upper),
    )
    key = ["o_orderkey", "l_orderkey", "l_linenumber"]
    assert sorted(map(tuple, bucketed.select(*key).collect())) == sorted(
        map(tuple, naive.select(*key).collect())
    )


def test_range_join_avoids_nested_loop(spark):
    """The whole point: the bucketed plan must be a hash/sort-merge join,
    never BroadcastNestedLoopJoin."""
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select("o_orderkey", "o_orderdate")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select("l_orderkey", "l_shipdate")
    df = TP.range_join(
        o, li, "o_orderdate", "l_shipdate", F.expr("INTERVAL -1 DAY"), F.expr("INTERVAL 1 DAY")
    )
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    plan = qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_asof_join_no_right_match(spark):
    """Left rows before any right row get null (merge_asof semantics)."""
    left = spark.createDataFrame([(1, 10, 100)], "id long, k long, t long").select(
        "id", "k", F.timestamp_micros(F.col("t")).alias("ts")
    )
    right = spark.createDataFrame([(2, 10, 200)], "rid long, k long, t long").select(
        "rid", "k", F.timestamp_micros(F.col("t")).alias("rts")
    )
    out = TP.asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rid"]).collect()
    assert len(out) == 1 and out[0].asof_rid is None
