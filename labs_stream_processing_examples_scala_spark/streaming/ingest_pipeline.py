"""Streaming corpus-ingest pipeline — the round-4 capstone composition.

The batch flagship (operators/corpus.py ``corpus_pipeline``) assembles a
training corpus in one plan; this is the ONLINE form a 100 TB ingest
actually runs: documents arrive in micro-batches and each batch flows

    decontaminate   (row-local shingle overlap vs the broadcast
                     benchmark set — stateless)
  → quality cut     (absolute threshold; the batch pipeline's per-group
                     percentile needs the whole corpus and is therefore
                     an offline re-rank, not an ingest decision — that
                     re-rank is operators/corpus.py ``quality_rerank``
                     over ``survivors()``, and ingest + re-rank is
                     pytest-proven ≡ the batch pipeline's quality stage)
  → near-dup dedup  (ONLINE GREEDY: a document is dropped iff it
                     exact-Jaccard-matches an already-KEPT document —
                     candidates from the on-disk LSH bucket index of
                     kept docs, plus in-batch pairs resolved greedily
                     in doc order)
  → resample        (deterministic hash-Bernoulli by length band —
                     order-independent, replay-stable)
  → idempotent append of survivors + their index rows

Greedy-vs-batch semantics: batch keep-first keeps only the minimum of
each near-dup COMPONENT; online greedy keeps a doc unless it matches a
kept doc directly (a chain a~b, b~c with a≁c keeps {a, c}). Greedy is
the only rule an ingest can implement without revisiting decisions;
the equivalence test's third engine is a pure-Python greedy over the
batch operator's verified pair list in arrival order.

Driver involvement is bounded: in-batch pair RESOLUTION (not data)
collects the verified pair list — cardinality ∝ bucket collisions
within one batch, never corpus-scaled — because greedy resolution is
inherently sequential in doc order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.operators.dedup import (
    banded_of,
    minhash_of,
    shingle_arrays_of,
)
from labs_stream_processing_examples_scala_spark.streaming.incremental_dedup import (
    _ARR_SCHEMA,
    _BUCKET_SCHEMA,
    _verified_pairs,
)
from labs_stream_processing_examples_scala_spark.streaming.sinks import idempotent_write


def _drop_docs(good: DataFrame, dropped: set[int]) -> DataFrame:
    """Remove the greedily-dropped ids via a broadcast LEFT ANTI join
    against a one-column DataFrame — not ``isin(list)``, which compiles
    every id into the plan as a literal, so a pathological batch of
    near-dups would bloat the plan and the driver instead of shipping
    the (still collision-bounded) id set as a broadcast relation. Plan
    size stays O(1) in |dropped| (tests/test_streaming.py pins it)."""
    if not dropped:
        return good
    ddf = good.sparkSession.createDataFrame(
        [(int(d),) for d in sorted(dropped)], "doc_id long"
    )
    return good.join(F.broadcast(ddf), "doc_id", "left_anti")


class StreamingIngestPipeline:
    """foreachBatch processor for the online corpus-assembly pipeline."""

    def __init__(
        self,
        workdir: str,
        bench_shingles: list[int] | None = None,
        quality_min: float = 0.0,
        threshold: float = 0.5,
    ):
        self.arrays_dir = os.path.join(workdir, "kept_arrays")
        self.buckets_dir = os.path.join(workdir, "kept_buckets")
        self.kept_dir = os.path.join(workdir, "kept_docs")
        self.bench_shingles = bench_shingles or []
        self.quality_min = quality_min
        self.threshold = threshold

    def _read_index(self, spark: SparkSession, path: str, schema: str, before: int) -> DataFrame:
        # empty only when the index genuinely has no batches yet; a real
        # read failure propagates (same contract as incremental_dedup).
        # Compaction-aware: a compacted (even mid-swap-interrupted)
        # index reads identically (streaming/compaction.py).
        from labs_stream_processing_examples_scala_spark.streaming.compaction import read_batched_dir

        return read_batched_dir(spark, path, schema=schema, before_batch=before)

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        from labs_stream_processing_examples_scala_spark.functions.text import _quality_parts

        spark = docs.sparkSession

        # 1) decontaminate + 2) quality cut — row-local, stateless
        arrs_all = shingle_arrays_of(docs)
        bench = F.lit(self.bench_shingles).cast("array<bigint>")
        clean_ids = arrs_all.filter(
            ~F.arrays_overlap("shs", bench) | (F.size("shs") == 0)
        ).select("doc_id")
        _, _, _, score = _quality_parts()
        good = (
            docs.join(clean_ids, "doc_id")
            .withColumn("quality", score)
            .filter(F.col("quality") >= self.quality_min)
        )

        new_arrs = shingle_arrays_of(good.select("doc_id", "text")).filter(F.col("sz") > 0).persist()
        try:
            new_buckets = banded_of(minhash_of(new_arrs))
            kept_arrs = self._read_index(spark, self.arrays_dir, _ARR_SCHEMA, batch_id)
            kept_buckets = self._read_index(spark, self.buckets_dir, _BUCKET_SCHEMA, batch_id)

            # 3a) drop new docs matching an already-kept doc
            cand_ko = (
                new_buckets.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
                .join(
                    kept_buckets.select(F.col("doc_id").alias("doc_b"), "band", "bucket"),
                    ["band", "bucket"],
                )
                .filter(F.col("doc_a") != F.col("doc_b"))
                .select("doc_a", "doc_b")
                .distinct()
            )
            vs_kept = _verified_pairs(cand_ko, new_arrs, kept_arrs, self.threshold)
            dropped = {r.doc_a for r in vs_kept.select("doc_a").distinct().collect()}

            # 3b) in-batch pairs, resolved greedily in doc order
            cand_nn = (
                new_buckets.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
                .join(new_buckets.select(F.col("doc_id").alias("doc_b"), "band", "bucket"), ["band", "bucket"])
                .filter(F.col("doc_a") < F.col("doc_b"))
                .select("doc_a", "doc_b")
                .distinct()
            )
            nn_pairs = _verified_pairs(cand_nn, new_arrs, new_arrs, self.threshold)
            by_doc: dict[int, list[int]] = {}
            for r in nn_pairs.collect():  # ∝ in-batch collisions, bounded
                by_doc.setdefault(r.doc_b, []).append(r.doc_a)
            for doc in sorted(by_doc):
                if doc in dropped:
                    continue
                if any(smaller not in dropped for smaller in by_doc[doc]):
                    dropped.add(doc)

            survivors = _drop_docs(good, dropped)

            # 4) deterministic length-band resample — recorded as a
            # FLAG on every dedup survivor, not a delete: the offline
            # quality re-rank (operators/corpus.py quality_rerank)
            # needs percentiles over the FULL survivor population (a
            # percentile over the resampled subset would be biased by
            # the length bands), while kept() serves only sampled rows
            from labs_stream_processing_examples_scala_spark.operators.sampling import (
                RESAMPLE_BANDS,
                _bucket,
            )

            pct = F.lit(RESAMPLE_BANDS[-1][1])
            for lo, p in reversed(RESAMPLE_BANDS[:-1]):
                pct = F.when(F.col("n_chars") >= lo, p).otherwise(pct)

            # 5) idempotent append: kept docs + index rows of ALL
            # dedup-survivors (resample losers still index — they were
            # kept by the dedup rule, and future dups of them must drop)
            surv_ids = survivors.select("doc_id")
            idempotent_write(
                survivors.select(
                    "doc_id",
                    "lang",
                    "source",
                    "n_chars",
                    "quality",
                    (_bucket(F.col("doc_id")) < pct).alias("sampled"),
                ),
                self.kept_dir,
                batch_id,
            )
            idempotent_write(new_arrs.join(surv_ids, "doc_id"), self.arrays_dir, batch_id)
            idempotent_write(new_buckets.join(surv_ids, "doc_id"), self.buckets_dir, batch_id)
        finally:
            new_arrs.unpersist()

    def survivors(self, spark: SparkSession) -> DataFrame:
        """Every dedup survivor, with its quality score and the
        deterministic ``sampled`` resample flag — the population the
        offline quality re-rank runs over."""
        from labs_stream_processing_examples_scala_spark.streaming.compaction import read_batched_dir

        return read_batched_dir(spark, self.kept_dir)

    def kept(self, spark: SparkSession) -> DataFrame:
        """The assembled corpus: dedup survivors that also passed the
        length-band resample."""
        return self.survivors(spark).filter("sampled").drop("sampled")


def run_ingest(
    spark: SparkSession,
    docs_source_dir: str,
    workdir: str,
    bench_shingles: list[int],
    quality_min: float = 0.0,
    threshold: float = 0.5,
    files_per_trigger: int = 1,
    timeout: float = 600.0,
) -> StreamingIngestPipeline:
    schema = spark.read.parquet(docs_source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(docs_source_dir)
    )
    proc = StreamingIngestPipeline(
        workdir, bench_shingles=bench_shingles, quality_min=quality_min, threshold=threshold
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .foreachBatch(proc.process_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    if q.isActive:
        q.stop()
    if q.exception() is not None:
        raise RuntimeError(f"ingest pipeline failed: {q.exception()}")
    return proc
