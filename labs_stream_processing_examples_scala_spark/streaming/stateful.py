"""Stateful streaming operators — SURVEY §2.3 (J1/J3 distributed forms)
and §2.9 (watermarks, windows, dedup).

The reference's only stateful operator is the per-message 3-slot gather
(AkkaEnrichmentPipeline.scala:133-163). Three Spark-native forms exist,
in preference order:

1. :func:`plans.enrichment.enrichment_pipeline` — a narrow projection
   (all enrichments derive from the same row): no state at all. The one
   to run.
2. :func:`stream_stream_enrichment_join` — the distributed-system
   reading of J1 (three independent enrichment streams re-keyed by id):
   stream-stream inner equi-joins with watermarks bounding state.
3. :func:`stateful_gather` — J3's explicit slot-state as
   ``transformWithStateInPandas``-style processing via
   ``applyInPandasWithState``: accumulate (extra1, extra2, extra3)
   slots per id, emit when complete — the cameo actor's literal
   semantics, including the all-3-present check.

Windowed aggregation / watermarked dedup are engine additions (§2.9)
needed by the north-star extensions; each has a batch-equivalence test.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from labs_stream_processing_examples_scala_spark.functions import transforms as X


def derived_enrichment_streams(messages: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split one message stream into the three enrichment streams the
    reference fans out to (scatter, AkkaEnrichmentPipeline.scala:110-115)."""
    e1 = messages.select("id", "ts", X.reverse_value("value").alias("extra1"))
    e2 = messages.select("id", "ts", X.upper_value("value").alias("extra2"))
    e3 = messages.select("id", "ts", X.char_sort("value").alias("extra3_name"))
    return e1, e2, e3


def stream_stream_enrichment_join(messages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """J1 as stream-stream inner equi-joins on id with watermarks.

    State is bounded by the watermark: rows older than it are evicted
    from the join buffers, so the plan survives unbounded input. The
    equi-join keys include the event-time window implicitly via the
    watermark columns (Spark requires watermarks on both sides for
    state cleanup in inner joins).
    """
    base = messages.select("id", "ts", "value").withWatermark("ts", watermark)
    # the watermark set on `base` propagates to the derived streams;
    # re-applying it counts as "redefining" and is disallowed
    e1, e2, e3 = derived_enrichment_streams(base)
    e2 = e2.withColumnRenamed("id", "id2").withColumnRenamed("ts", "ts2")
    e3 = e3.withColumnRenamed("id", "id3").withColumnRenamed("ts", "ts3")
    joined = (
        base.join(e1.withColumnRenamed("id", "id1").withColumnRenamed("ts", "ts1"),
                  (F.col("id") == F.col("id1")) & (F.col("ts") == F.col("ts1")))
        .join(e2, (F.col("id") == F.col("id2")) & (F.col("ts") == F.col("ts2")))
        .join(e3, (F.col("id") == F.col("id3")) & (F.col("ts") == F.col("ts3")))
    )
    return joined.select(
        "id",
        "value",
        "extra1",
        "extra2",
        "extra3_name",
        X.transform_additional("id").alias("additional"),
    )


def stream_left_enrichment_join(
    messages: DataFrame, attrs: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Left-outer stream-stream join: every message emits exactly once —
    enriched when the attribute stream produced a matching (id, ts) row,
    null-padded otherwise. The outer semantics are what the reference's
    enrichment CANNOT express (a missing service response stalls its
    gather forever, AkkaEnrichmentPipeline.scala:133-163); here the
    watermark closes the wait: once it passes a message's event time,
    the unmatched row is emitted with nulls and its join state evicted.

    Both sides need watermarks (state cleanup) and the join condition
    must bound event time — (id, ts) equality does. ``attrs`` columns:
    (aid, ats, <payload...>).
    """
    lhs = messages.select("id", "ts", "value").withWatermark("ts", watermark)
    rhs = attrs.withWatermark("ats", watermark)
    return lhs.join(
        rhs, (F.col("id") == F.col("aid")) & (F.col("ts") == F.col("ats")), "left_outer"
    ).drop("aid", "ats")


# --- J3: explicit slot-state gather (applyInPandasWithState) ---

GATHER_OUTPUT_SCHEMA = (
    "id long, value string, extra1 string, extra2 string, extra3_name string, additional string"
)
GATHER_STATE_SCHEMA = "value string, extra1 string, extra2 string, extra3_name string"


def _gather_row(msg_id, value, e1, e2, e3, status, with_status: bool) -> pd.DataFrame:
    """The one J3 output-row builder, shared by BOTH stateful gather
    implementations (applyInPandasWithState and transformWithState) —
    the round-10 timer fix had to be reasoned about twice because each
    carried its own copy (round-12 self-review)."""
    out = {
        "id": msg_id,
        "value": value,
        "extra1": e1,
        "extra2": e2,
        "extra3_name": e3,
        "additional": X.transform_additional_py(msg_id),
    }
    if with_status:
        out["status"] = status
    return pd.DataFrame([out])


def _fold_slots(pdf_iter, value, e1, e2, e3):
    """Accumulate slot arrivals into the (value, e1, e2, e3) state —
    unexpected slots are dropped-and-logged in the reference (F3,
    AkkaPipelineActors.scala:55), here simply ignored."""
    for pdf in pdf_iter:
        for row in pdf.itertuples(index=False):
            value = row.value if row.value is not None else value
            if row.slot == "extra1":
                e1 = row.res
            elif row.slot == "extra2":
                e2 = row.res
            elif row.slot == "extra3":
                e3 = row.res
    return value, e1, e2, e3


def _make_gather_fn(ttl_ms: int | None):
    """Build the gather function; with ``ttl_ms`` the state carries an
    INACTIVITY deadline (GroupState ProcessingTimeTimeout — reset on
    every slot arrival, exactly Akka's ``context.setReceiveTimeout``
    semantics at reference AkkaPipelineActors.scala:144-151) and a
    timed-out gather emits its partial record with status='timeout'
    (the ``onNotProcessed`` NACK leg, errors-as-data)."""

    def gather(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        """Accumulate slot values for one message id; emit when all
        three enrichments are present (completeness check ≡
        AkkaEnrichmentPipeline.scala:154-163). State is dropped on emit
        (the cameo actor stops itself)."""
        (msg_id,) = key
        value, e1, e2, e3 = state.get if state.exists else (None, None, None, None)
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield _gather_row(msg_id, value, e1, e2, e3, "timeout", ttl_ms is not None)
            return
        value, e1, e2, e3 = _fold_slots(pdf_iter, value, e1, e2, e3)
        if e1 is not None and e2 is not None and e3 is not None:
            state.remove()
            yield _gather_row(msg_id, value, e1, e2, e3, "complete", ttl_ms is not None)
        else:
            state.update((value, e1, e2, e3))
            if ttl_ms is not None:
                # inactivity deadline: reset on every arrival
                state.setTimeoutDuration(ttl_ms)

    return gather


_gather_fn = _make_gather_fn(None)  # the round-9 form, kept importable


def slot_stream(messages: DataFrame) -> DataFrame:
    """Scatter: one (id, slot, res) record per enrichment per message —
    the union-of-slots shape the gather consumes."""
    base = messages.select("id", "value")
    return (
        base.select("id", "value", F.lit("extra1").alias("slot"), X.reverse_value("value").alias("res"))
        .unionAll(base.select("id", "value", F.lit("extra2").alias("slot"), X.upper_value("value").alias("res")))
        .unionAll(base.select("id", "value", F.lit("extra3").alias("slot"), X.char_sort("value").alias("res")))
    )


def stateful_gather(slots: DataFrame, ttl_seconds: float | None = None) -> DataFrame:
    """J3 — gather slot records per id with explicit state; emit complete
    EnrichedData+transform rows (update mode). ``ttl_seconds`` arms the
    K5 ``onNotProcessed`` leg on THIS API too (the TWS form is
    :func:`transform_with_state_gather`): a gather idle past the
    deadline emits its partial record with ``status='timeout'`` and
    frees its state — GroupState's ProcessingTimeTimeout, reset per
    arrival (Akka receiveTimeout semantics). With a TTL the output
    gains the ``status`` column."""
    use_ttl = ttl_seconds is not None
    return slots.groupBy("id").applyInPandasWithState(
        _make_gather_fn(int(ttl_seconds * 1000) if use_ttl else None),
        outputStructType=GATHER_TTL_OUTPUT_SCHEMA if use_ttl else GATHER_OUTPUT_SCHEMA,
        stateStructType=GATHER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="ProcessingTimeTimeout" if use_ttl else "NoTimeout",
    )


# --- §2.9 engine streaming surface ---


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type with a watermark for
    late data. Batch equivalent: group by date_trunc(hour)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time window (streaming form of relational.q47):
    per-window, per-type counts and value sums. Identical plan shape to
    the batch query — window() expands each row into window/slide
    buckets (a narrow Expand), then one agg shuffle on (window, type);
    streaming only adds the watermark that bounds state eviction."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def watermarked_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate event_ids within the watermark horizon — bounded
    state (vs unbounded exact dedup). At 100 TB stream scale this is the
    only dedup that holds; exact-history dedup belongs to the batch
    dedup operators (operators/dedup.py)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def sessionized_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based), counting events per session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("win.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n",
        )
    )


# --- J3 on the Spark 4.x transformWithState API ---


def has_transform_with_state() -> bool:
    """transformWithStateInPandas runs a protobuf-speaking Python
    worker; without the google.protobuf package the query crashes at
    start (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).
    :func:`protobuf_host.ensure_protobuf` first tries the installed
    package, then known host-bundled pure-Python runtimes."""
    from labs_stream_processing_examples_scala_spark.protobuf_host import ensure_protobuf

    return ensure_protobuf()


GATHER_TTL_OUTPUT_SCHEMA = GATHER_OUTPUT_SCHEMA + ", status string"


def transform_with_state_gather(
    slots: DataFrame, ttl_seconds: float | None = None
) -> DataFrame:
    """J3 gather on ``transformWithStateInPandas`` — the Spark 4.x
    stateful API (typed per-key ValueState, timers, RocksDB-backed).
    Same semantics as :func:`stateful_gather`; preferred where the
    protobuf dependency resolves because TWS state is incrementally
    checkpointed (RocksDB changelog) instead of full-snapshot per
    batch — the difference that matters when gather state is large at
    100 TB.

    ``ttl_seconds`` arms the K5 ``onNotProcessed`` timer (round-9
    verdict task #4) — the reference NACKs a message whose enrichment
    verdict never arrives (reference AkkaPipelineActors.scala:144-168:
    the cameo actor's receive timeout fires ``onNotProcessed`` from
    postStop). Here a PROCESSING-TIME timer is (re-)armed on EVERY
    arrival for the key — Akka's ``setReceiveTimeout`` resets after
    each received message, so the TTL bounds INACTIVITY, matching the
    ``applyInPandasWithState`` form's per-batch ``setTimeoutDuration``;
    if no further leg arrives within the TTL and the gather is still
    incomplete, ``handleExpiredTimer`` emits the partial record with
    ``status='timeout'`` (errors-as-data, the F2/K3 discipline) and
    drops the state — bounded state even when an enrichment leg is
    permanently lost. Completion deletes the pending timer and emits
    ``status='complete'``. Timers and state live in the checkpoint, so
    the deadline survives a query restart. With a TTL the output gains
    the ``status`` column; the downstream F2 split routes timeouts to
    the DLQ leg.

    Raises RuntimeError if no google.protobuf runtime can be resolved;
    callers fall back to :func:`stateful_gather`.
    """
    if not has_transform_with_state():
        raise RuntimeError(
            "transformWithStateInPandas needs the google.protobuf package; "
            "use stateful_gather (applyInPandasWithState) instead"
        )
    import pandas as _pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    use_ttl = ttl_seconds is not None
    ttl_ms = int(ttl_seconds * 1000) if use_ttl else 0

    class GatherProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState("slots", GATHER_STATE_SCHEMA)

        def _row(self, msg_id, value, e1, e2, e3, status):
            # the shared J3 row builder (round-12 self-review dedup)
            return _gather_row(msg_id, value, e1, e2, e3, status, use_ttl)

        def handleInputRows(self, key, rows, timerValues):
            (msg_id,) = key
            existed = self.state.exists()
            value, e1, e2, e3 = (
                self.state.get() if existed else (None, None, None, None)
            )
            value, e1, e2, e3 = _fold_slots(rows, value, e1, e2, e3)
            if e1 is not None and e2 is not None and e3 is not None:
                self.state.clear()
                if use_ttl:
                    for t in self.handle.listTimers():
                        self.handle.deleteTimer(t)
                yield self._row(msg_id, value, e1, e2, e3, "complete")
            else:
                self.state.update((value, e1, e2, e3))
                if use_ttl:
                    # re-arm the deadline on EVERY arrival (round-10
                    # ADVICE): Akka's context.setReceiveTimeout resets
                    # after each received message, and stateful_gather's
                    # setTimeoutDuration does the same per batch — the
                    # TTL bounds INACTIVITY, so legs that keep trickling
                    # in (each within TTL of the previous) complete even
                    # when the total elapsed exceeds one TTL
                    for t in self.handle.listTimers():
                        self.handle.deleteTimer(t)
                    self.handle.registerTimer(
                        timerValues.getCurrentProcessingTimeInMs() + ttl_ms
                    )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # onNotProcessed: the verdict never arrived — emit the
            # partial record as errors-as-data and free the state
            if self.state.exists():
                (msg_id,) = key
                value, e1, e2, e3 = self.state.get()
                self.state.clear()
                yield self._row(msg_id, value, e1, e2, e3, "timeout")

        def close(self) -> None:
            pass

    return slots.groupBy("id").transformWithStateInPandas(
        statefulProcessor=GatherProcessor(),
        outputStructType=GATHER_TTL_OUTPUT_SCHEMA if use_ttl else GATHER_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if use_ttl else "None",
    )


def stream_static_enrichment(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static dimension join — the production enrichment shape
    the reference approximates with its three service lookups: each
    streaming record picks up attributes from a slowly-changing static
    table. The static side is broadcast (re-read per micro-batch, so
    dimension updates are picked up batch-to-batch); no state store is
    involved and the stream side never shuffles.
    """
    return events.join(F.broadcast(dim), key, "left")
