"""Mergeable-sketch aggregates — the 100 TB pre-aggregation pattern.

At scale you never count distincts over raw data twice: you aggregate
each partition/day into a fixed-size sketch once, store it, and answer
every later question by merging sketches (associative, commutative, a
few KB each). Spark ships Apache DataSketches HLL for exactly this:

- ``hll_sketch_agg``    raw rows → binary sketch column (partial+final
                        like any agg; the shuffle carries KBs, not keys)
- ``hll_union_agg``     merge stored sketches across groups/days
- ``hll_sketch_estimate`` sketch → approximate distinct count

The reference has no aggregation at all (SURVEY §2.5); these are engine
additions used by the north-star extensions (corpus cardinality
monitoring). No DuckDB oracle — DataSketches internals are not
reproducible cross-engine — so correctness is tolerance-tested against
exact counts (tests/test_sketches.py), and the driver records rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.sources.batch import load_table

LG_K = 14  # 2^14 registers ≈ 0.8% relative error, ~16 KB per sketch


def hll_distinct_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct customers per order priority: one pass, one
    tiny shuffle (sketches combine map-side)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey", F.lit(LG_K)).alias("sk"))
        .select(
            "o_orderpriority",
            F.hll_sketch_estimate("sk").alias("approx_custs"),
        )
    )


def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that matters at scale: per-group sketches MERGE into
    the global answer without touching raw data again — pre-aggregate
    once per partition/day, union forever after."""
    o = load_table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey", F.lit(LG_K)).alias("sk")
    )
    return per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_total_custs")
    )


def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90 per order status (Greenwald-Khanna, one pass,
    bounded memory per group — the quantile you can afford at 100 TB;
    exact percentiles stay available as q16)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", 0.5, 10_000).alias("p50_approx"),
        F.approx_percentile("o_totalprice", 0.9, 10_000).alias("p90_approx"),
    )
