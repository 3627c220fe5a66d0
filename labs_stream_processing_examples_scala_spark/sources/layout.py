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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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


# --- Z-order clustering (multi-dimensional data skipping) -------------
#
# Directory partitioning prunes on ONE column; sorting prunes row groups
# on ONE column. When queries filter on TWO dimensions (time AND key,
# orderkey AND partkey), a space-filling curve is the standard layout
# answer (the technique behind Delta/Iceberg OPTIMIZE ZORDER BY): map
# each row to the Morton code of its normalized dimensions, range-
# partition + sort by that code, and every file's min/max footer stats
# become a tight box in BOTH dimensions — so a reader (Spark's parquet
# scan does this at the row-group level with pushed filters) skips most
# files for any 2-D box predicate. A single-column sort gives unbounded
# ranges in the second dimension: zero skipping for predicates on it.
#
# The Morton code is a compile-time-expanded chain of Catalyst bit ops —
# whole-stage-codegens like arithmetic, no UDF. The only wide edge is
# the one repartitionByRange at WRITE time; reads prune forever after.

Z_BITS = 16  # per-dimension resolution; 2 dims × 16 bits = 32-bit code


def zorder_code(a: Column, b: Column) -> Column:
    """Morton (bit-interleaved) code of two already-normalized integer
    columns in [0, 2^Z_BITS). Bit i of `a` lands at bit 2i, bit i of
    `b` at 2i+1."""
    code = F.lit(0).cast("long")
    for i in range(Z_BITS):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return code


def normalize_dim(c: Column, lo: float, hi: float) -> Column:
    """Affine-map a numeric column into [0, 2^Z_BITS), clamped. The
    (lo, hi) bounds come from table stats — at scale, from the catalog;
    here callers pass min/max directly."""
    span = max(hi - lo, 1e-300)
    top = float((1 << Z_BITS) - 1)
    scaled = ((c.cast("double") - F.lit(lo)) / F.lit(span)) * F.lit(top)
    # clamp in DOUBLE space BEFORE the long cast: casting an extreme
    # outlier (or NaN) first raised CAST_INVALID_INPUT/overflow under
    # ANSI instead of clamping as documented (round-12 self-review);
    # NaN maps to the low edge via nanvl
    clamped = F.least(F.lit(top), F.greatest(F.lit(0.0), F.nanvl(scaled, F.lit(0.0))))
    return clamped.cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bounds: tuple[float, float, float, float],
    n_files: int = 16,
) -> None:
    """Write df as parquet clustered on the Z-curve of (col_a, col_b).

    One repartitionByRange shuffle on the Morton code, an in-partition
    sort (narrow), and the helper column dropped before the write so
    the on-disk schema is unchanged."""
    a_lo, a_hi, b_lo, b_hi = bounds
    z = zorder_code(
        normalize_dim(F.col(col_a), a_lo, a_hi),
        normalize_dim(F.col(col_b), b_lo, b_hi),
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skip_stats(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files that could be skipped, total files) for predicate
    ``col BETWEEN lo AND hi``, judged purely from parquet footer
    min/max — the same stats any engine's scan pruning consults."""
    from pathlib import Path as _P

    import pyarrow.parquet as pq

    total = skippable = 0
    for f in _P(path).glob("*.parquet"):
        md = pq.read_metadata(f)
        fmin, fmax = None, None
        stats_complete = True
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col:
                    if c.statistics is None:
                        # a stat-less row group can hold ANYTHING — a
                        # real engine cannot skip it, so neither may
                        # this helper (round-12 self-review: judging
                        # from only the stats-bearing groups overstated
                        # pruning effectiveness)
                        fmin = fmax = None
                        stats_complete = False
                    elif stats_complete:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if stats_complete and fmin is not None and (fmax < lo or fmin > hi):
            skippable += 1
    return skippable, total
