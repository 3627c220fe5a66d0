"""Connector matrix: round-trips per format, schema discipline, jar gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.sources import connectors as C
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def sample(spark):
    return spark.read.parquet(f"{SF_SMOKE}/nation.parquet")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    C.write_batch(sample, path, fmt=fmt)
    back = C.read_batch(spark, path, fmt=fmt, schema=sample.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        C.read_batch(spark, str(tmp_path), fmt="csv")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown format"):
        C.read_batch(spark, "/nowhere", fmt="xml")


def test_jar_gated_format_raises_cleanly(spark):
    with pytest.raises(NotImplementedError, match="connector jar"):
        C.read_batch(spark, "/nowhere", fmt="delta")


def test_streaming_csv_source(spark, sample, tmp_path):
    path = str(tmp_path / "csvstream")
    C.write_batch(sample, path, fmt="csv")
    stream = C.read_stream(spark, path, fmt="csv", schema=sample.schema)
    q = (
        stream.writeStream.format("memory")
        .queryName("csv_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert q.exception() is None
    got = spark.sql("SELECT * FROM csv_stream")
    assert got.count() == sample.count()


def test_partitioned_write_prunes(spark, tmp_path):
    """partitionBy → directory layout → partition pruning at read."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(1000)
    path = str(tmp_path / "by_type")
    C.write_batch(ev, path, fmt="parquet", partition_by=["event_type"])
    back = C.read_batch(spark, path, fmt="parquet").filter(F.col("event_type") == "click")
    qe = back._jdf.queryExecution()
    jvm = back.sparkSession._jvm
    plan = qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "PartitionFilters: [isnotnull(event_type" in plan
