"""Format-agnostic connectors — S4 breadth.

The reference names RabbitMQ and MySQL as its intended endpoints but
ships no connector code (SURVEY §2.1: they are build deps only). The
engine exposes Spark's own connector matrix behind two helpers so every
pipeline is format-independent; formats needing external jars (Delta,
Iceberg, Kafka, JDBC drivers) are declared but gated behind a runtime
probe — they raise a clear error instead of a class-not-found.

Scale notes: parquet/orc keep predicate pushdown + column pruning; csv
and json scans read every byte (schema applied, no pushdown) — the
helpers require an explicit schema for them so at least inference
never triggers a second full read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

NATIVE_FORMATS = ("parquet", "orc", "csv", "json", "text")
JAR_GATED_FORMATS = ("delta", "iceberg", "kafka", "jdbc", "avro")


def _check_format(spark: SparkSession, fmt: str) -> None:
    if fmt in NATIVE_FORMATS:
        return
    if fmt in JAR_GATED_FORMATS:
        try:
            spark._jvm.java.lang.Class.forName(  # probe the classpath
                {
                    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
                    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
                    "kafka": "org.apache.spark.sql.kafka010.KafkaSourceProvider",
                    "jdbc": "org.apache.spark.sql.execution.datasources.jdbc.JdbcRelationProvider",
                    "avro": "org.apache.spark.sql.avro.AvroFileFormat",
                }[fmt]
            )
        except Exception as exc:
            raise NotImplementedError(
                f"format '{fmt}' needs its connector jar on the classpath "
                f"(not present in this build)"
            ) from exc
        return
    raise ValueError(f"unknown format '{fmt}'")


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Batch read. csv/json REQUIRE a schema (inference = an extra full
    scan at 100 TB; never pay it silently)."""
    _check_format(spark, fmt)
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema (no silent inference)")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def read_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Streaming read (file-based formats; schema always required by
    Structured Streaming)."""
    _check_format(spark, fmt)
    if schema is None:
        raise ValueError("streaming file sources require an explicit schema")
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_batch(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    _check_format(df.sparkSession, fmt)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)
