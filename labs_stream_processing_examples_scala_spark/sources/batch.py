"""Batch (parquet) sources — SURVEY §2.1 S4.

The reference has no file/table source (its only source is a timer tick,
MessageProcessor.scala:21-22); the batch surface exists so every operator
is checkable against an offline oracle, and because at 100 TB the real
input IS a columnar table. Reads are plain ``spark.read.parquet`` so
Catalyst gets predicate pushdown / column pruning / partition pruning
for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_nanos_readable(spark: SparkSession) -> None:
    """Make parquet TIMESTAMP(NANOS) columns readable on ANY session.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS); without
    ``spark.sql.legacy.parquet.nanosAsLong=true`` the scan throws
    PARQUET_TYPE_ILLEGAL. The conf is runtime-settable, so set it here
    rather than relying on the session builder (session.py) — callers
    (e.g. an external correctness harness) may hand us a plain session.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf may be locked down; the read will surface the error


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (TESTDATA.md) as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    reads only as a nanosecond long (``ensure_nanos_readable``);
    convert it back to a timestamp here (lossless — fixture nanos are
    exact microsecond multiples).
    """
    ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
