"""Byte-pair-encoding tokenizer training — the missing piece between a
raw corpus and token-count statistics (Sennrich et al. 2016).

Training is inherently iterative (each merge depends on the previous),
but the trick that makes it cluster-friendly is WHERE the loop runs:
over the *word-frequency table*, not the corpus. One corpus-sized
groupBy("word") up front collapses 100 TB of text into a vocabulary
table (distinct words — millions of rows, not trillions); every merge
iteration then touches only that table:

  1. pair counts: explode adjacent symbol pairs weighted by word
     frequency, map-side-combined groupBy — shuffle ∝ distinct pairs.
  2. argmax: orderBy(count desc, pair asc) LIMIT 1 — TakeOrdered, and
     the single winning row is the ONLY thing the driver ever sees
     (fixed-size collect, annotated; the loop is driver-sequential by
     the algorithm's definition, not an implementation shortcut).
  3. apply: a row-local fold replaces adjacent (left,right) with the
     merged symbol left-to-right — pure Catalyst `aggregate`, no
     Python, no shuffle. localCheckpoint truncates the per-iteration
     lineage exactly as the connected-components loop does
     (operators/dedup.py).

Segmentation (applying trained merges to the corpus) is n_merges
chained row-local folds — a narrow map over the documents scan.

No SQL oracle (DuckDB has no iterative loop); correctness is proven by
an exact third-engine check: a pure-Python BPE trainer on the same
fixture must produce the identical merge list and identical
segmentations (tests/test_extensions.py).

Ties are broken lexicographically on (left, right) so the merge
sequence is deterministic across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.sources.batch import load_table

N_MERGES = 8  # registry/bench default; tests use the same


def word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word → count over documents — the ONE corpus-sized step."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )


def _merge_adjacent(syms: Column, left: str, right: str) -> Column:
    """Row-local left-to-right merge of adjacent (left,right) symbol
    pairs — the standard BPE application order. A fold that either
    glues the incoming symbol onto the accumulator's tail (when the
    tail is `left` and the symbol is `right`) or appends it; because
    the glued symbol is `left+right` ≠ `left` for non-degenerate
    merges, overlapping runs merge non-greedily left-to-right exactly
    like the reference Python implementation."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbolized vocabulary,
    weighted by word count. Narrow explode + one map-side-combined
    shuffle on (left,right)."""
    pairs = vocab.filter(F.size("syms") >= 2).select(
        "wc",
        F.explode(
            F.zip_with(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("wc").alias("pair_count")
    )


def bpe_train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """Run the training loop; returns [(rank, left, right, pair_count)].

    The per-iteration driver traffic is exactly one row (the argmax);
    everything else stays distributed.
    """
    vocab = word_freqs(spark, sf_dir).select("w", "wc", F.split("w", "").alias("syms"))
    vocab = vocab.localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()  # fixed-size: the single argmax row per iteration
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((rank, left, right, cnt))
        vocab = vocab.withColumn("syms", _merge_adjacent(F.col("syms"), left, right))
        # truncate the chained-fold lineage each round (dedup.py pattern)
        vocab = vocab.localCheckpoint()
    return merges


def bpe_train(spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES) -> DataFrame:
    """x_bpe_train — the learned merge table as a DataFrame.

    Rows-only in the driver gate (iterative — not SQL-expressible);
    exact third-engine oracle in tests/test_extensions.py.
    """
    merges = bpe_train_merges(spark, sf_dir, n_merges)
    return spark.createDataFrame(
        merges, schema="merge_rank int, left string, right string, pair_count long"
    )


def bpe_segment(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """x_bpe_segment — apply the trained merges to every document:
    per-doc BPE token count and first tokens of the segmentation.

    Application is n_merges chained row-local folds over the document
    scan — a narrow map (no shuffle, whole-stage-codegen'd); at 100 TB
    the trained merge list is a plan constant broadcast with the code.
    """
    merges = bpe_train_merges(spark, sf_dir, n_merges)
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    # per-word symbol arrays, merged then re-flattened in doc order
    syms = F.transform(toks, lambda w: F.split(w, ""))
    for _, left, right, _ in merges:
        syms = F.transform(syms, lambda a: _merge_adjacent(a, left, right))
    flat = F.flatten(syms)
    return d.select(
        "doc_id",
        F.size(flat).alias("n_bpe_tokens"),
        F.concat_ws(" ", F.slice(flat, 1, 8)).alias("head_tokens"),
    )
