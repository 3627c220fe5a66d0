"""Sketch aggregates vs exact answers (tolerance-based — sketches have
no cross-engine oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.operators import sketches as SK
from labs_stream_processing_examples_scala_spark.sources.batch import load_table
from tests.conftest import SF_SMOKE


def test_hll_estimates_within_tolerance(spark):
    approx = {
        r.o_orderpriority: r.approx_custs
        for r in SK.hll_distinct_per_group(spark, SF_SMOKE).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.05 * n), (k, approx[k], n)


def test_hll_union_matches_global_estimate(spark):
    merged = SK.hll_mergeable_rollup(spark, SF_SMOKE).first()[0]
    exact = (
        load_table(spark, SF_SMOKE, "orders").agg(F.countDistinct("o_custkey")).first()[0]
    )
    assert abs(merged - exact) <= max(3, 0.05 * exact)


def test_approx_percentiles_bracket_exact(spark):
    got = {
        r.o_orderstatus: (r.p50_approx, r.p90_approx)
        for r in SK.approx_percentiles(spark, SF_SMOKE).collect()
    }
    o = load_table(spark, SF_SMOKE, "orders")
    exact = {
        r.o_orderstatus: (r.p50, r.p90)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.9).alias("p90"),
        )
        .collect()
    }
    for k, (p50, p90) in exact.items():
        assert abs(got[k][0] - p50) / p50 < 0.02
        assert abs(got[k][1] - p90) / p90 < 0.02


def test_hll_agg_is_partial_final(spark):
    plan = (
        SK.hll_distinct_per_group(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ObjectHashAggregate with partial_hll_sketch_agg = map-side combine
    assert "partial_hll_sketch_agg" in plan, plan
