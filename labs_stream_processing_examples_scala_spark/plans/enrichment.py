"""The flagship enrichment pipeline — the reference's one real "query".

Reference dataflow (README.md:26-37, scenario.dot): timer source →
3 parallel enrichments (reverse / uppercase / char-sort) → combine →
transform (add ``additional``) → save, with errors routed to a DLQ.

Spark-native forms:

- :func:`enrichment_pipeline` — the idiomatic one. All enrichments are
  derived from the same row, so the whole fan-out/fan-in (J1/J2/J4) is a
  single narrow projection: no shuffle, whole-stage codegen, scales
  linearly with partitions. This is the form both batch and streaming
  execution use.
- :func:`gather_groupby_form` — J3 parity form: the Akka scatter/gather
  (AkkaEnrichmentPipeline.scala:104-163) re-expressed as union of three
  enrichment streams + ``groupBy(id)`` gather with an all-3-present
  completeness check. Exists to prove the semantics equivalence; the
  select form is what you'd run.
- :func:`enrichment_with_errors` — the E1-E3 errors-as-data layer over
  the same projection, with deterministic chaos for tests (P-Q4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.functions import errors as E
from labs_stream_processing_examples_scala_spark.functions import transforms as X


def enrichment_pipeline(messages: DataFrame) -> DataFrame:
    """``Data(id,value)`` → flat ``OutputData`` in one projection.

    Input: any DataFrame with ``id`` (long) and ``value`` (string)
    columns. Output columns: ``id value extra1 extra2 extra3_name
    additional`` (SURVEY §1.5 flattening of Services.scala:26-35).
    """
    return messages.select(*X.enrich("id", "value"))


def enrichment_output(messages: DataFrame) -> DataFrame:
    """Nested-parity variant: one ``output`` struct column shaped exactly
    like the reference's ``OutputData`` (Services.scala:35)."""
    return enrichment_pipeline(messages).select(
        F.col("id"), X.as_output_struct().alias("output")
    )


def enrichment_with_errors(messages: DataFrame, chaos: bool = False) -> DataFrame:
    """E1-E3 over the enrichment: each of the three enrichments carries an
    err slot; ``merge`` keeps the first error (E2, coalesce order =
    reference's left-to-right precedence); downstream transform is
    guarded (E3). With ``chaos=True`` the deterministic R7 predicate
    injects failures per enrichment step (origin tags ``enrich1..3``).
    """
    id_c, v = F.col("id"), F.col("value")
    if chaos:
        errs = [E.chaos_err(id_c, origin=f"enrich{i}", step=i) for i in (1, 2, 3)]
    else:
        errs = [F.lit(None).cast(E.ERR_SCHEMA)] * 3
    err = E.merge_errors(*errs).alias("err")
    df = messages.select(
        id_c.alias("id"),
        v.alias("value"),
        X.reverse_value(v).alias("extra1"),
        X.upper_value(v).alias("extra2"),
        X.char_sort(v).alias("extra3_name"),
        err,
    )
    return df.select(
        "*",
        E.guard(F.col("err"), X.transform_additional(F.col("id"))).alias("additional"),
    )


def gather_groupby_form(messages: DataFrame) -> DataFrame:
    """J3 — the Akka scatter/gather as a Spark plan.

    The reference scatters one message to three workers and a per-message
    cameo actor gathers ``Reversed``/``UpperCased``/``Sorted`` slots,
    emitting only when all three are present
    (AkkaEnrichmentPipeline.scala:104-163). Here: union of three slot
    streams → ``groupBy(id)`` with ``max(when(slot=…))`` pivots + a
    completeness HAVING count = 3. One shuffle on ``id``; partial
    aggregation (map-side combine) keeps it scale-safe.
    """
    base = messages.select("id", "value")
    slots = (
        base.select(
            "id", "value", F.lit("extra1").alias("slot"), X.reverse_value("value").alias("res")
        )
        .unionAll(
            base.select(
                "id", "value", F.lit("extra2").alias("slot"), X.upper_value("value").alias("res")
            )
        )
        .unionAll(
            base.select(
                "id", "value", F.lit("extra3").alias("slot"), X.char_sort("value").alias("res")
            )
        )
    )
    # completeness = all three DISTINCT slots present, not row count:
    # an at-least-once replay (or any duplicated id) produced 6 slot
    # rows and count(*)==3 silently DROPPED the message entirely
    # (round-12 self-review). Per-slot presence indicators keep the
    # plan expand-free (count(DISTINCT) would add an Expand), and
    # min(value) is deterministic across duplicate arrivals where
    # first() was not.
    def _has(slot: str) -> Column:
        return F.max(F.when(F.col("slot") == slot, 1))

    gathered = (
        slots.groupBy("id")
        .agg(
            F.min("value").alias("value"),
            F.max(F.when(F.col("slot") == "extra1", F.col("res"))).alias("extra1"),
            F.max(F.when(F.col("slot") == "extra2", F.col("res"))).alias("extra2"),
            F.max(F.when(F.col("slot") == "extra3", F.col("res"))).alias("extra3_name"),
            (_has("extra1") + _has("extra2") + _has("extra3")).alias("_slots"),
        )
        .filter(F.col("_slots") == 3)
        .drop("_slots")
    )
    return gathered.select(
        "id",
        "value",
        "extra1",
        "extra2",
        "extra3_name",
        X.transform_additional("id").alias("additional"),
    )
