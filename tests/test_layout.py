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


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """Z-order layout: footer min/max stats allow file skipping on BOTH
    clustered dimensions, where a single-column sort skips only on its
    own column. Judged from the parquet footers directly — the same
    stats the scan's row-group pruning consults."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    lo_ok, hi_ok, lo_pk, hi_pk = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).first()

    zpath = str(tmp_path / "li_zorder")
    spath = str(tmp_path / "li_sorted")
    n_files = 16
    L.write_zordered(
        li, zpath, "l_orderkey", "l_partkey", (lo_ok, hi_ok, lo_pk, hi_pk), n_files
    )
    # baseline: classic single-column sort layout
    (
        li.repartitionByRange(n_files, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # narrow box on each dimension (~10% of its range)
    pk_box = (lo_pk, lo_pk + (hi_pk - lo_pk) * 0.1)
    ok_box = (lo_ok, lo_ok + (hi_ok - lo_ok) * 0.1)

    z_pk, z_tot = L.file_skip_stats(zpath, "l_partkey", *pk_box)
    s_pk, s_tot = L.file_skip_stats(spath, "l_partkey", *pk_box)
    z_ok, _ = L.file_skip_stats(zpath, "l_orderkey", *ok_box)
    s_ok, _ = L.file_skip_stats(spath, "l_orderkey", *ok_box)

    # the single-column layout cannot skip anything on the OTHER dim;
    # z-order must skip a majority of files on BOTH dims
    assert s_pk == 0, "unexpected: linear layout skipped on the unsorted dim"
    assert z_pk >= z_tot // 2, (z_pk, z_tot)
    assert z_ok >= z_tot // 2, (z_ok, z_tot)
    assert s_ok >= s_tot // 2  # sanity: linear is good on its own dim

    # and the data survives intact
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(spath).count()
        == li.count()
    )


def test_zorder_code_is_morton_interleave(spark):
    """Cross-check the Catalyst bit-op chain against a Python Morton
    reference on exhaustive small values + edge values."""
    vals = [(a, b) for a in [0, 1, 2, 3, 5, 255, 65535] for b in [0, 1, 2, 3, 9, 65535]]
    df = spark.createDataFrame(vals, "a long, b long").withColumn(
        "z", L.zorder_code(F.col("a"), F.col("b"))
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(L.Z_BITS):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b)


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Runtime filtering: when a selective dim-side predicate feeds a
    shuffle join, Spark injects a bloom filter built from the filtered
    side into the fact side's scan (`bloom_filter_might_contain`) — the
    rows that would lose the join are dropped BEFORE the exchange. This
    is the no-layout complement to bucketing/z-order: at 100 TB it cuts
    the shuffled bytes by the dim predicate's selectivity with zero
    write-time preparation."""
    conf_keys = {
        # the application side must LOOK big (threshold default 10GB is
        # a minimum scan size); the creation side must stay under its
        # 10MB maximum — the fixture filter qualifies as-is
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    # both keys are defined confs: get() without default returns the
    # effective value (a typed conf validates any *explicit* default)
    old = {k: spark.conf.get(k) for k in conf_keys}
    try:
        for k, v in conf_keys.items():
            spark.conf.set(k, v)
        orders = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        li = load_table(spark, SF_SMOKE, "lineitem")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_extendedprice").alias("rev"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # physical spelling: the fact scan filters through
        # might_contain(bloom built by bloom_filter_agg on the dim side)
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert joined.count() > 0
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
