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


# --- JDBC against a REAL embedded database (round 8, verdict task #5):
# Apache Derby ships in the Spark distribution, so the S4 external-DB
# path runs end-to-end instead of stopping at the jar-gate probe.


def test_jdbc_round_trip_embedded_derby(spark, sample, tmp_path):
    """Batch round-trip through a real JDBC database, the partitioned
    parallel read (the 100 TB shape: one WHERE-range query per task),
    and filter pushdown into the remote scan."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    C.write_jdbc(sample, url, "nation", mode="overwrite")
    back = C.read_jdbc(spark, url, "nation")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))

    part = C.read_jdbc(
        spark, url, "nation",
        partition_column="n_nationkey", lower_bound=0, upper_bound=25,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4, "partitioned read must fan out"
    assert sorted(map(tuple, part.collect())) == sorted(map(tuple, sample.collect()))

    q = back.filter(F.col("n_nationkey") >= 10).select("n_nationkey", "n_name")
    plan = q._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual" in plan, (
        "filter must push into the JDBC scan"
    )

    # appends accumulate (the mode a CDC sink uses)
    C.write_jdbc(sample.limit(3), url, "nation", mode="append")
    assert C.read_jdbc(spark, url, "nation").count() == sample.count() + 3


def test_jdbc_missing_driver_raises_cleanly(spark):
    with pytest.raises(NotImplementedError, match="driver"):
        C.read_jdbc(spark, "jdbc:mysql://localhost/db", "t",
                    driver="com.mysql.cj.jdbc.Driver")


def test_streaming_sink_into_jdbc(spark, sample, tmp_path):
    """S4 streaming against the real database: a file stream lands each
    micro-batch in Derby through a foreachBatch write_jdbc sink; the
    accumulated table equals the source."""
    src = str(tmp_path / "src")
    sample.repartition(3).write.parquet(src)
    url = f"jdbc:derby:{tmp_path}/sinkdb;create=true"
    C.write_jdbc(sample.limit(0), url, "sunk", mode="overwrite")  # create empty

    stream = C.read_stream(spark, src, fmt="parquet", schema=sample.schema)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda df, _bid: C.write_jdbc(df, url, "sunk", mode="append"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = C.read_jdbc(spark, url, "sunk")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, sample.collect()))
