"""Deterministic sampling & splitting — training-data-pipeline staples.

A training pipeline needs splits that are (a) reproducible across runs
and engines, (b) stable under re-partitioning and replay (the streaming
at-least-once contract), and (c) computable without a shuffle. Random
sampling (``rand()``, ``TABLESAMPLE``) violates all three; hash-based
assignment violates none: split(x) is a pure function of the record key.

- ``hash_split``       — train/valid/test assignment from
                         rolling_hash(key) % 100 against cut points.
- ``stratified_sample``— per-stratum deterministic sampling: keep a
                         different hash-window per group (e.g., balance
                         labels by downsampling the majority class).

Both are narrow projections/filters (zero shuffle, fully pushdown-able)
and exactly reproducible in the DuckDB oracle via the shared
rolling-hash SQL renderer (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.functions import hashing as H
from labs_stream_processing_examples_scala_spark.sources.batch import load_table


def _bucket(key: Column) -> Column:
    """Deterministic 0..99 bucket from the record key (stringified)."""
    return H.rolling_hash(key.cast("string")) % 100


def hash_split(
    spark: SparkSession,
    sf_dir: str,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """documents + a split column: train/valid/test by hash bucket.

    The assignment depends only on doc_id — adding or removing OTHER
    rows never moves a document between splits (unlike fraction-based
    sampling), which is what keeps eval sets honest as a corpus grows.
    """
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + valid_pct, "valid")
        .otherwise("test")
    )
    return d.select("doc_id", b.cast("int").alias("bucket"), split.alias("split"))


def stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    fractions: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic stratified sample of documents by ``lang``:
    keep a doc iff its hash bucket < the stratum's percentage.

    ``fractions`` maps lang → keep-percentage (0..100); unlisted strata
    are dropped. One narrow filter — the 100 TB plan is a scan with the
    predicate pushed down, no sampling operator, no shuffle.
    """
    fractions = fractions or {"en": 50, "de": 100, "fr": 100, "es": 100}
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    pct = F.create_map(
        *[x for lang, p in sorted(fractions.items()) for x in (F.lit(lang), F.lit(p))]
    )[F.col("lang")]
    return d.filter(pct.isNotNull() & (b < pct)).select("doc_id", "lang", "source")
