"""Physical table layout for scale — bucketing and partitioned writes.

The reference has no storage layer at all (its sink is a fake
``Output.save``, Services.scala:83-88); at 100 TB the dominant cost of
every repeated join/agg is the shuffle, and the way you delete a shuffle
is to bake the partitioning into the table layout once at write time:

- ``write_bucketed``: hash-bucket a table by its join key
  (``bucketBy(n, key)`` + ``sortBy``). Two tables bucketed the same way
  join with ZERO exchange — Spark trusts the on-disk hash distribution.
  This is the batch analogue of co-partitioned stream-stream joins, and
  the single biggest lever for a fact⋈fact join that AQE can't broadcast.
- ``write_partitioned``: directory-partition by a low-cardinality column
  (date, type). Predicates on the partition column prune whole
  directories at planning time (PartitionFilters in the scan) — the scan
  never opens the files, which at 100 TB is the difference between
  touching 1 day and 7 years.

Bucketed tables must live in the session catalog (``saveAsTable``) —
bucket metadata travels through the metastore, not the parquet footer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from labs_stream_processing_examples_scala_spark.sources.batch import load_table


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist df hash-bucketed (and sorted) by ``bucket_col`` into the
    session catalog. Overwrites any previous version of the table."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # DROP only clears the catalog entry; a location left behind by an
    # earlier session makes saveAsTable fail with LOCATION_ALREADY_EXISTS
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts Spark plans a SortMergeJoin whose both
    sides read pre-bucketed data: no Exchange on either side. Callers
    assert that property (tests/test_layout.py) — if an Exchange
    appears, the layout contract broke.
    """
    return spark.table(left_table).join(spark.table(right_table), key)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Directory-partitioned parquet write (one dir per value)."""
    df.write.partitionBy(partition_col).mode("overwrite").parquet(path)


def demo_bucketed_orders_lineitem(spark: SparkSession, sf_dir: str, n_buckets: int = 8) -> DataFrame:
    """End-to-end: bucket orders and lineitem by orderkey, return the
    co-located join (order revenue per order with header columns)."""
    write_bucketed(
        load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "orderkey"),
        "orders_b",
        "orderkey",
        n_buckets,
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "orderkey"),
        "lineitem_b",
        "orderkey",
        n_buckets,
    )
    return bucketed_join(spark, "orders_b", "lineitem_b", "orderkey")
