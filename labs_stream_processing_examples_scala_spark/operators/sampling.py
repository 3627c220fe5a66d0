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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.functions import hashing as H
from labs_stream_processing_examples_scala_spark.sources.batch import load_table


#: per-sampler bucket salts. Every sampler used to share the identical
#: unsalted _bucket(doc_id), so COMPOSED samplers were fully correlated
#: (round-12 self-review): after importance_resample, every survivor had
#: bucket < keep_pct, so hash_split(train=80) could never route a
#: short-band survivor to valid/test. A distinct salt per sampler makes
#: composed keep-decisions independent, like RESERVOIR_SALT already did
#: for the reservoir rank. The resample salt is shared by
#: importance_resample, the corpus pipeline's stage 4, and the streaming
#: ingest decision — those three ARE one sampler (the proven
#: ingest ≡ batch equivalence depends on it).
SPLIT_SALT = "split:"
STRAT_SALT = "strat:"
RESAMPLE_SALT = "imp:"
MIX_SALT = "mix:"


def _bucket(key: Column, salt: str = "") -> Column:
    """Deterministic 0..99 bucket from the record key (stringified),
    decorrelated across samplers by the salt prefix."""
    k = key.cast("string")
    if salt:
        k = F.concat(F.lit(salt), k)
    return H.rolling_hash(k) % 100


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
    b = _bucket(F.col("doc_id"), SPLIT_SALT)
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
    b = _bucket(F.col("doc_id"), STRAT_SALT)
    pct = F.create_map(
        *[x for lang, p in sorted(fractions.items()) for x in (F.lit(lang), F.lit(p))]
    )[F.col("lang")]
    return d.filter(pct.isNotNull() & (b < pct)).select("doc_id", "lang", "source")


# per-band keep percentages for importance_resample: weight docs by the
# stored n_chars length band (integer arithmetic only — no FP boundary
# can disagree with the oracle). Rendered into the DuckDB SQL.
RESAMPLE_BANDS = ((400, 100), (300, 75), (200, 50), (100, 25), (0, 10))


def band_keep_pct(n_chars: Column | None = None) -> Column:
    """keep-probability (0-100) from the RESAMPLE_BANDS length bands —
    the ONE fold both :func:`importance_resample` and the flagship
    corpus pipeline's resample stage evaluate (round-12 self-review:
    two inline copies could silently desynchronize the pipeline from
    its standalone stage)."""
    n_chars = F.col("n_chars") if n_chars is None else n_chars
    pct = F.lit(RESAMPLE_BANDS[-1][1])
    for lo, p in reversed(RESAMPLE_BANDS[:-1]):
        pct = F.when(n_chars >= lo, p).otherwise(pct)
    return pct


def importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling: keep each document with a
    probability set by its length band (longer → likelier kept), via
    the same hash-bucket Bernoulli as :func:`hash_split`.

    The standard corpus-rebalancing step (upweight scarce long-form
    text by downsampling the short tail). Independence from other rows
    + pure-function-of-key gives replay stability — a document's fate
    never changes as the corpus grows. Narrow filter, zero shuffle,
    predicate pushes to the scan.
    """
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"), RESAMPLE_SALT)
    w = band_keep_pct()
    return (
        d.select("doc_id", "n_chars", w.alias("keep_pct"), b.cast("int").alias("bucket"))
        .filter(F.col("bucket") < F.col("keep_pct"))
    )


MIXTURE_TEMPERATURE = 0.5  # w_s ∝ n_s^T — T<1 upweights scarce sources
MIXTURE_BUDGET_PCT = 50    # target corpus size as % of the original


def mixture_sample(
    spark: SparkSession,
    sf_dir: str,
    temperature: float = MIXTURE_TEMPERATURE,
    budget_pct: int = MIXTURE_BUDGET_PCT,
) -> DataFrame:
    """Temperature-scaled source mixture — the standard LLM-pretraining
    rebalance: sample each ``source`` with share ∝ count^T (T < 1
    flattens the source distribution toward uniform, upweighting
    scarce sources), at an overall budget of ``budget_pct``% of the
    corpus. Deterministic: every keep decision is hash-bucket <
    per-source percentage, so membership is a pure function of
    (doc_id, source counts) and identical in the DuckDB oracle.

    FP discipline: the per-source percentage uses pow/floor only
    (floor, not round — no half-to-even boundary to disagree across
    engines); both engines compute the identical IEEE expression —
    EXCEPT ``SUM(w)``, whose accumulation order is engine-private. On
    a corpus with uniform source counts the floored quantity lands
    EXACTLY on an integer, and the summation-order ε (~1e-13 relative)
    flips the floor across engines (found by the round-14 builder
    fuzzer at temperature 0.86 / budget 61: Spark 60 vs DuckDB 61 on
    every source). The ``+ 1e-9`` before FLOOR absorbs that ε on both
    sides — far above any summation-order perturbation at percentage
    scale, far below the 1-percentage-point resolution of the result.

    Scale: one map-side-combined groupBy(source) over a low-cardinality
    key (the per-source count table is SOURCES rows, never SF-scaled);
    the two totals come from an agg + one-row broadcast crossJoin (the
    validation.py pattern — NOT a global window, whose single-partition
    warning elsewhere flags a real scale bug and must stay meaningful
    in the logs); the corpus side is a narrow filter — zero data
    shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_s"))
    w = F.pow(F.col("n_s").cast("double"), F.lit(float(temperature)))
    totals = counts.agg(
        F.sum("n_s").alias("tot_docs"), F.sum(w).alias("tot_w")
    )
    expected = (w / F.col("tot_w")) * (F.col("tot_docs") * budget_pct / 100.0)
    pct = F.least(
        F.lit(100.0),
        F.floor(F.lit(100.0) * expected / F.col("n_s") + F.lit(1e-9)),
    )
    rates = (
        counts.crossJoin(F.broadcast(totals))  # one row
        .select("source", pct.cast("int").alias("keep_pct"))
    )
    b = _bucket(F.col("doc_id"), MIX_SALT)
    return (
        d.join(F.broadcast(rates), "source")
        .select("doc_id", "source", "keep_pct", b.cast("int").alias("bucket"))
        .filter(F.col("bucket") < F.col("keep_pct"))
    )


RESERVOIR_K = 5  # per-group sample size
RESERVOIR_SALT = "rsv:"  # decorrelates the reservoir rank from hash_split buckets


def reservoir_sample(
    spark: SparkSession,
    sf_dir: str,
    k: int = RESERVOIR_K,
) -> DataFrame:
    """Deterministic per-group reservoir sample: the k documents per
    ``lang`` with the smallest salted hash rank.

    Rank-by-uniform-hash is distributionally identical to reservoir
    sampling (each size-k subset equally likely under a uniform hash)
    but stateless and replay-stable: membership is a pure function of
    doc_id, so re-running, re-partitioning, or streaming replay never
    rotates the sample — and it is exactly reproducible in the DuckDB
    oracle, unlike an actual seeded reservoir whose result depends on
    encounter order.

    Scale: Spark plans the rank-filter window as WindowGroupLimit —
    each input partition keeps only its local top-k per group BEFORE
    the shuffle, so the exchange carries ≤ k × n_groups × n_partitions
    rows, not the corpus. The salt decorrelates this rank from the
    hash_split/stratified bucket so composed samplers stay independent.
    """
    d = load_table(spark, sf_dir, "documents")
    h = H.rolling_hash(F.concat(F.lit(RESERVOIR_SALT), F.col("doc_id").cast("string")))
    ranked = d.select("doc_id", "lang", h.alias("rhash")).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.col("rhash").asc(), F.col("doc_id").asc())
        ),
    )
    return ranked.filter(F.col("rn") <= k)
