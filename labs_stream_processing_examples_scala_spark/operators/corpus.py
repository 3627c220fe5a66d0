"""Corpus-preparation operators for LLM training-data pipelines.

The dedup/similarity/text modules cover filtering; this module covers
the *assembly* side of a training run:

- :func:`pack_sequences` — token-budget sharding: assign documents to
  fixed-budget training sequences (the "sequence packing" step before
  tokenizer batching).
- :func:`pack_stats` — per-shard packing-efficiency report.
- :func:`contamination_report` / :func:`decontaminate` — benchmark
  n-gram-overlap contamination detection and removal (the eval-leakage
  guard every corpus pipeline needs).
- :func:`embed_normalize` — L2 normalization of the embedding column
  with norm diagnostics (the projection ANN indexes consume).

All are pure Catalyst (window functions, HOF folds, hash joins) — no
Python in any hot path — and each has an exact DuckDB oracle
(``oracles.py``) because every step is deterministic arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.functions.text import _tokens
from labs_stream_processing_examples_scala_spark.operators.dedup import _shingle_hashes
from labs_stream_processing_examples_scala_spark.sources.batch import load_table

PACK_BUDGET = 512  # tokens per packed sequence
PACK_SHARDS = 32  # packing parallelism (scale knob: one window per shard)
BENCHMARK_DOCS = 20  # fixture stand-in for the benchmark suite: doc_id < 20


def pack_sequences(
    spark: SparkSession, sf_dir: str, budget: int = PACK_BUDGET, n_shards: int = PACK_SHARDS
) -> DataFrame:
    """Assign each document to a (shard, seq_id) training-sequence slot.

    Documents are sharded by ``doc_id % n_shards`` and packed in doc_id
    order within the shard: a running token count assigns each doc the
    sequence index ``floor(tokens_before_doc / budget)`` — contiguous
    token-budget chunking (docs longer than the budget spill over,
    exactly like cross-document attention-masked packing).

    Scale: the window partitions by shard, so state is one running sum
    per shard — raise ``n_shards`` with the cluster and no partition
    ever holds more than corpus/n_shards rows. A single global window
    (no partitionBy) would serialize the whole corpus through one task;
    this never does.
    """
    d = load_table(spark, sf_dir, "documents")
    shard = F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("shard")
    w = Window.partitionBy("shard").orderBy("doc_id")
    toks = d.select("doc_id", shard, F.size(_tokens("text")).alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("seq_id"),
    )


def pack_stats(
    spark: SparkSession, sf_dir: str, budget: int = PACK_BUDGET, n_shards: int = PACK_SHARDS
) -> DataFrame:
    """Packing-efficiency report: docs and tokens per packed sequence,
    and the fill ratio against the budget. Second-stage agg over
    :func:`pack_sequences` — one extra shuffle on (shard, seq_id)."""
    packed = pack_sequences(spark, sf_dir, budget, n_shards)
    return (
        packed.groupBy("shard", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn("fill_ratio", F.round(F.col("n_tokens") / budget, 6))
    )


def contamination_report(
    spark: SparkSession, sf_dir: str, n_benchmark: int = BENCHMARK_DOCS
) -> DataFrame:
    """(doc_id, n_shared) for corpus docs sharing ≥1 word-3-gram shingle
    with the benchmark set (doc_id < n_benchmark stands in for an eval
    suite). Reuses the cached shingle arrays from the dedup pipeline.

    The benchmark shingle set is broadcast — justified by cardinality:
    eval suites are fixed-size (thousands of docs) and do NOT grow with
    the corpus, so the broadcast is bounded at any SF. The corpus side
    streams through a broadcast-hash semi-probe: no shuffle of corpus
    shingles at all.
    """
    sh = _shingle_hashes(spark, sf_dir)
    bench = (
        sh.filter(F.col("doc_id") < n_benchmark).select("h").distinct()
    )
    return (
        sh.filter(F.col("doc_id") >= n_benchmark)
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate(
    spark: SparkSession, sf_dir: str, n_benchmark: int = BENCHMARK_DOCS
) -> DataFrame:
    """The decontaminated corpus: drop every non-benchmark doc that
    shares a shingle with the benchmark set (left-anti against the
    contamination report)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") >= n_benchmark)
    dirty = contamination_report(spark, sf_dir, n_benchmark).select("doc_id")
    return d.join(dirty, "doc_id", "left_anti").select("doc_id", "lang", "source", "n_chars")


def decontaminate_spans(
    spark: SparkSession, sf_dir: str, n_benchmark: int = BENCHMARK_DOCS, k: int = 8
) -> DataFrame:
    """SPAN-level decontamination (round 8): rewrite every corpus doc
    with the k-word spans that appear in the BENCHMARK set excised —
    the surgical form of :func:`decontaminate`, which drops whole docs.
    An LLM pipeline wants both: doc-level for heavy overlap, span-level
    to keep an otherwise-clean document that quotes one benchmark
    passage (the Lee et al. machinery pointed at an external gram set
    instead of corpus-internal duplicates).

    Plan: the benchmark's distinct positional-gram hashes (bounded —
    eval suites are fixed-size and never corpus-scaled, the same
    cardinality argument as contamination_report's broadcast) join
    broadcast against the corpus gram stream; matched (doc_id, pos)
    feed the shared row-local excision (dedup.excise_spans). No shuffle
    of corpus grams at all — one broadcast probe + the per-doc
    removed-starts agg (∝ contaminated volume only).

    Returns (doc_id, n_removed_tokens, text) for every NON-benchmark
    doc. Exact DuckDB oracle (same shared hash SQL as the span family).
    """
    from labs_stream_processing_examples_scala_spark.operators.dedup import (
        excise_spans,
        positional_gram_occurrences,
    )

    occ = positional_gram_occurrences(spark, sf_dir, k)
    bench = (
        occ.filter(F.col("doc_id") < n_benchmark).select("h").distinct()
    )
    removed = (
        occ.filter(F.col("doc_id") >= n_benchmark)
        .join(F.broadcast(bench), "h")
        .select("doc_id", "pos")
    )
    return excise_spans(
        spark, sf_dir, removed, k, doc_filter=F.col("doc_id") >= n_benchmark
    )


def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm + normalized head component per embedding row.

    The fold runs in double (the float32 components are upcast first)
    so the arithmetic matches the DuckDB oracle exactly; accumulation
    order is the array order on both sides. Pure row-local HOFs — zero
    shuffle at any scale.
    """
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(norm, 6).alias("l2_norm"),
        F.round(F.element_at(dbl, 1) / norm, 6).alias("u0"),
    )


def streaming_decontaminate(
    stream_docs: DataFrame, bench_shingles: DataFrame
) -> DataFrame:
    """Streaming corpus filter: drop arriving documents that share a
    word-3-gram shingle with the benchmark set — the online form of
    :func:`decontaminate`.

    The shingle computation is the same row-local HOF chain as the
    batch path; the contamination test is ``arrays_overlap`` against
    the benchmark shingle set collapsed to ONE static row (a
    stream-static cross join of a broadcast single row — the same
    "attach the small static thing to every stream row" shape as
    brute_force_topk's query vector). No state store, no stream
    shuffle, and legal in Structured Streaming (a derived-stream
    anti-join would be stream-stream and is not). The benchmark set is
    an eval suite: fixed-size by nature, so the one-row array is
    bounded at any corpus SF.

    ``stream_docs`` needs (doc_id, text); ``bench_shingles`` is one
    column ``h`` (e.g. the batch pipeline's benchmark shingle set).
    """
    from labs_stream_processing_examples_scala_spark.operators.dedup import (
        shingle_array_col,
    )

    bench_row = bench_shingles.agg(F.collect_set("h").alias("bench_shs"))
    return (
        stream_docs.withColumn("shs", shingle_array_col("text"))
        .crossJoin(F.broadcast(bench_row))
        # keep-on-NULL: a NULL-text record has a NULL shingle array,
        # arrays_overlap returns NULL, and a bare ~NULL filter DROPPED
        # the row — while the batch decontaminate keeps shingle-less
        # docs (they produce no gram rows to match). coalesce restores
        # the stream ≡ batch equivalence (round-12 self-review).
        .filter(F.coalesce(~F.arrays_overlap("shs", "bench_shs"), F.lit(True)))
        .drop("shs", "bench_shs")
    )


CHUNK_TOKENS = 64  # tokens per training chunk
CHUNK_STRIDE = 48  # stride between chunk starts (overlap = 64 - 48)


def chunk_tokens(
    df: DataFrame, chunk: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Sliding-window chunking of ANY DataFrame with (doc_id, text) —
    batch or streaming (projection + Generate are both streaming-legal,
    no state): split each document into overlapping ``chunk``-token
    windows every ``stride`` tokens — the long-context preprocessing
    step (chunk for embedding/retrieval, or for fixed-window
    pretraining with overlap).

    Row-local: the start positions and slices are array HOFs computed
    per document; posexplode then emits one row per chunk (Generate is
    a narrow node — no shuffle), so the operator scales as a
    projection. Chunk counts are bounded by doc length, never corpus
    size.
    """
    from labs_stream_processing_examples_scala_spark.functions import hashing as H

    toks = _tokens("text")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk))
    return (
        df.filter(F.size(toks) >= 1)
        .select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_toks"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("chunk_toks").alias("n_chunk_tokens"),
            H.rolling_hash(F.array_join("chunk_toks", " ")).alias("chunk_hash"),
        )
    )


def chunk_documents(
    spark: SparkSession, sf_dir: str, chunk: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Oracle-checked form of :func:`chunk_tokens` over the documents
    table."""
    return chunk_tokens(load_table(spark, sf_dir, "documents"), chunk, stride)


def corpus_pipeline(
    spark: SparkSession, sf_dir: str, n_benchmark: int = BENCHMARK_DOCS
) -> DataFrame:
    """The full training-corpus assembly pipeline as ONE declarative
    plan — the flagship composition of the extension operators:

        documents
          → decontaminate   (drop docs sharing a shingle with the
                             benchmark set; broadcast bench probe)
          → exact dedup     (keep-first per md5(text))
          → quality filter  (top half by quality per (lang, source))
          → resample        (length-band deterministic Bernoulli)

    Every stage is the same arithmetic as its standalone operator, so
    the whole chain is exactly reproducible in the DuckDB oracle.
    Catalyst sees ONE plan: the narrow stages fuse, the dedup groupBy
    and the percentile window are the only wide edges (plus the
    broadcast bench probe) — at 100 TB that is two shuffles of the
    surviving corpus, with every filter pushed as early as its inputs
    allow.
    """
    from labs_stream_processing_examples_scala_spark.functions.text import _quality_parts
    from labs_stream_processing_examples_scala_spark.operators.sampling import (
        RESAMPLE_SALT,
        _bucket,
        band_keep_pct,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") >= n_benchmark)
    dirty = contamination_report(spark, sf_dir, n_benchmark).select("doc_id")
    s1 = d.join(dirty, "doc_id", "left_anti")
    # keep-first as ONE window pass (row_number over the content hash)
    # rather than agg + semi-join: the join form traverses s1 — and the
    # expensive contamination branch under it — twice (measured 3×
    # slower end-to-end)
    first = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    s2 = (
        s1.withColumn("_rn", F.row_number().over(first))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    _, _, _, score = _quality_parts()
    scored = s2.select("doc_id", "lang", "source", "n_chars", score.alias("quality"))
    # stages 3-4 ARE the standalone operators, not inline copies
    # (round-12 self-review): quality_rerank's window+cut and
    # band_keep_pct's length-band fold — n_chars rode along through
    # the window, so the resample weight is a plain projection
    s3 = quality_rerank(scored, 0.5)
    return s3.filter(
        _bucket(F.col("doc_id"), RESAMPLE_SALT) < band_keep_pct()
    ).select(
        "doc_id", "lang", "source", "quality", "pr"
    )


def quality_rerank(survivors: DataFrame, cut: float = 0.5) -> DataFrame:
    """Offline quality re-rank — the batch job that closes the gap the
    streaming ingest pipeline documents (streaming/ingest_pipeline.py):
    an ingest decision can only apply an ABSOLUTE quality threshold (a
    percentile needs the whole corpus), so the per-(lang, source)
    percentile cut the batch pipeline uses (``corpus_pipeline`` stage 3)
    runs afterwards, over the accumulated survivor population
    (``StreamingIngestPipeline.survivors()``).

    Exactly the batch pipeline's quality stage: percent_rank over
    (quality, doc_id) within (lang, source), keep ``pr >= cut``. The
    ``sampled`` resample flag rides along untouched — the final corpus
    is ``quality_rerank(survivors).filter("sampled")``, and
    tests/test_streaming.py proves ingest + re-rank ≡ corpus_pipeline
    end-to-end on a dup-free input. ONE window shuffle on the group
    key; at 100 TB that is the same wide edge the batch pipeline pays.
    """
    w = Window.partitionBy("lang", "source").orderBy("quality", "doc_id")
    return survivors.withColumn(
        "pr", F.round(F.percent_rank().over(w), 6)
    ).filter(F.col("pr") >= cut)
