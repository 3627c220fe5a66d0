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


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a parquet event-time column to TIMESTAMP whatever shape
    the writer used. Handles both fixture encodings seen so far:

    - TIMESTAMP(NANOS) surfaced as a nanosecond ``bigint`` (under
      ``nanosAsLong``) — convert; fixture nanos are exact microsecond
      multiples, so this is lossless.
    - ``timestamp[us]`` with isAdjustedToUTC=false, read as
      TIMESTAMP_NTZ — cast; lossless because the session zone is pinned
      to UTC (session.py), so wall-clock == instant.

    Consumers that need an instant (unix_micros, withWatermark,
    window()) reject NTZ outright, so every source path funnels
    through here. Works on batch and streaming DataFrames alike.
    """
    kind = dict(df.dtypes).get(col)
    if kind == "bigint":
        # integer `div`, NOT `/`: float division promotes the nanosecond
        # long to double first, and epoch-nanos (~1.7e18) exceed the
        # 2^53 exact-integer range — measured off-by-1µs on values with
        # sub-millisecond components
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    elif kind == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (TESTDATA.md) as a DataFrame, with the
    event-time column normalized to TIMESTAMP (``normalize_ts``)."""
    ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_ts(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
