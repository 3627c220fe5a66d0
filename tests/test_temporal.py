"""Temporal joins: the window-based as-of join must agree with pandas
merge_asof (the reference semantics everyone knows), and the bucketed
range join must equal the naive theta join."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.operators import temporal as TP
from labs_stream_processing_examples_scala_spark.sources.batch import normalize_ts
from tests.conftest import SF_SMOKE


def test_asof_matches_pandas_merge_asof(spark):
    ev = normalize_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
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


def test_range_join_subday_equals_naive(spark):
    """Hour and 15-minute grains (epoch-bucket path) must equal the
    naive theta join, keyed by user — the q64 shape at two grains."""
    ev = normalize_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("cid"), F.col("ts").alias("c_ts")
    )
    for win, bucket in [("1 HOUR", "1 hour"), ("45 MINUTE", "15 minutes")]:
        lower, upper = F.expr(f"INTERVAL -{win}"), F.expr(f"INTERVAL {win}")
        got = TP.range_join(
            p, c.withColumnRenamed("c_user", "user_id"),
            "p_ts", "c_ts", lower, upper, bucket=bucket, on=["user_id"],
        )
        naive = p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") >= F.col("p_ts") + lower)
            & (F.col("c_ts") <= F.col("p_ts") + upper),
        )
        assert sorted(map(tuple, got.select("pid", "cid").collect())) == sorted(
            map(tuple, naive.select("pid", "cid").collect())
        ), f"mismatch at bucket={bucket}"


def test_range_join_bucket_parser(spark):
    import pytest

    assert TP._bucket_seconds("1 day") == 86400
    assert TP._bucket_seconds("2 hours") == 7200
    assert TP._bucket_seconds("15 minutes") == 900
    assert TP._bucket_seconds("30 seconds") == 30
    for bad in ("day", "0 hours", "-1 hour", "1 fortnight"):
        with pytest.raises(ValueError):
            TP._bucket_seconds(bad)


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


def test_sessionize_gap_semantics(spark):
    """Rows strictly inside the gap share a session; a gap of exactly
    gap_minutes closes it (session_window convention); numbering
    restarts per key."""
    mins = lambda m: m * 60 * 1_000_000
    rows = [
        (1, mins(0)), (1, mins(10)), (1, mins(41)),  # 10' ok, 31' gap -> new
        (2, mins(0)), (2, mins(30)),                  # exactly 30' -> NEW
    ]
    df = spark.createDataFrame(rows, "k long, t long").select(
        "k", F.timestamp_micros(F.col("t")).alias("ts")
    )
    out = TP.sessionize(df, key="k", ts="ts", gap_minutes=30)
    got = {(r.k, r.t): r.session_id for r in out.select("k", F.unix_micros("ts").alias("t"), "session_id").collect()}
    assert got == {
        (1, mins(0)): 0, (1, mins(10)): 0, (1, mins(41)): 1,
        (2, mins(0)): 0, (2, mins(30)): 1,
    }


def test_sessionize_agrees_with_session_window(spark):
    """Two independent algorithms — lag/cumsum sessionization and
    Spark's session_window merge — must produce identical sessions
    (per-user session start + event count) on real fixture events."""
    ev = normalize_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet")).select(
        "user_id", "ts", F.lit(1.0).alias("value")
    )
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in TP.sessionize(ev, key="user_id", ts="ts")
        .groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    want = {
        (r.user_id, r.session_start): r.n
        for r in ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n",
        )
        .collect()
    }
    assert got == want


def test_sessionize_single_shuffle(spark):
    """Sessionize + per-session rollup must shuffle once: the groupBy on
    (user_id, session_id) reuses the window's user_id partitioning."""
    df = TP.user_sessions(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_rolling_window_includes_ties_and_bounds(spark):
    """RANGE frame: events exactly window_hours old are inside; ties at
    one timestamp see each other."""
    h = 3600 * 1_000_000
    rows = [(1, 0), (1, 0), (1, h), (1, 2 * h + 1)]
    df = spark.createDataFrame(rows, "u long, t long").select(
        F.monotonically_increasing_id().alias("event_id"),
        F.col("u").alias("user_id"),
        F.timestamp_micros(F.col("t")).alias("ts"),
        F.lit(1.0).alias("value"),
    )
    import labs_stream_processing_examples_scala_spark.operators.temporal as T
    span = h
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts"))).rangeBetween(-span, 0)
    out = df.select(F.unix_micros("ts").alias("t"), F.count("*").over(w).alias("n")).collect()
    got = sorted((r.t, r.n) for r in out)
    # t=0 rows: both ties -> 2; t=h: includes the two t=0 rows -> 3;
    # t=2h+1: its own only -> 1
    assert got == [(0, 2), (0, 2), (h, 3), (2 * h + 1, 1)]


def test_funnel_matches_python(spark):
    """Third engine: pure-Python scan reproduces the ordered funnel."""
    rows = normalize_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet")).select(
        "user_id", "event_type", "ts"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    want = {}
    for u, evs in by_user.items():
        views = [t for t, k in evs if k == "view"]
        if not views:
            continue
        tv = min(views)
        clicks = [t for t, k in evs if k == "click" and t > tv]
        tc = min(clicks) if clicks else None
        buys = [t for t, k in evs if k == "purchase" and tc and t > tc]
        tp_ = min(buys) if buys else None
        want[u] = 3 if tp_ else 2 if tc else 1
    got = {r.user_id: r.stage for r in TP.conversion_funnel(spark, SF_SMOKE).collect()}
    assert got == want


def test_cohort_counts_match_python(spark):
    import collections
    from datetime import date

    rows = normalize_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet")).select(
        "user_id", "ts"
    ).collect()
    epoch = date(2024, 1, 1)
    uw = {(r.user_id, (r.ts.date() - epoch).days // 7) for r in rows}
    coh = {}
    for u, w in uw:
        coh[u] = min(coh.get(u, w), w)
    want = collections.Counter((coh[u], w - coh[u]) for u, w in uw)
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in TP.cohort_retention(spark, SF_SMOKE).collect()}
    assert got == dict(want)
