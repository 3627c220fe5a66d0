"""Streaming sources — SURVEY §2.1 (S1-S3).

S1/S2: the reference's only sources are timer ticks that mint
``Data(tick, "Input Data: $tick")`` (MessageProcessor.scala:21-22;
AkkaEnrichmentPipeline.scala:56-70; FuturesProcessor.scala:27-42). The
Spark-native form is the ``rate`` source: ``value`` is the monotone tick,
the payload is the same synthesized string.

S3 (ACK/NACK contract, Services.scala:70-73): not a source operator in
Spark — it is the checkpoint protocol. Offsets are committed only after
a micro-batch's sinks complete, which IS ack-after-processing
(README.md:13); a crash before commit replays the batch (NACK ≡
redelivery, at-least-once, README.md:14). tests/test_streaming.py's
checkpoint-recovery scenario proves both directions.

File-fed bounded streams exist so every streaming operator can be
checked against its batch equivalent on identical input (SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.functions.transforms import synth_payload


def rate_messages(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """S1/S2 — timer-tick message stream: ``Data(id, "Input Data: $id")``.

    The reference paces 1 msg/s (Rx) or 0.5 msg/s (Akka/Futures); rate is
    a demo knob, not a semantic (SURVEY §6), so it's a parameter.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(
        F.col("value").alias("id"),
        synth_payload("value").alias("value"),
        F.col("timestamp").alias("ts"),
    )


def file_stream(spark: SparkSession, path: str, schema=None, fmt: str = "parquet") -> DataFrame:
    """Bounded file-fed stream (one file = one or more micro-batches).

    Structured Streaming requires an explicit schema for file sources;
    callers usually pass ``spark.read.parquet(path).schema``. A single
    *file* path is allowed (the fixtures are one parquet file per
    table); FileStreamSource insists on a directory, so a bare file is
    staged behind a symlink directory first.
    """
    import hashlib
    import os
    import tempfile

    if os.path.isfile(path):
        staged = os.path.join(
            tempfile.gettempdir(),
            "engine_stream_src",
            hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:16],
        )
        os.makedirs(staged, exist_ok=True)
        link = os.path.join(staged, os.path.basename(path))
        try:
            os.symlink(os.path.abspath(path), link)
        except FileExistsError:
            pass  # another session staged the same fixture concurrently
            # (the exists-then-symlink form was a check-then-act race —
            # round-12 self-review); same target by construction of the
            # hashed dir, so the existing link is correct
        path = staged
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def events_message_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture `events` table as a bounded message stream shaped like
    the reference's ``Data`` (id, value) + event time."""
    import os

    from labs_stream_processing_examples_scala_spark.sources.batch import ensure_nanos_readable, normalize_ts

    ensure_nanos_readable(spark)
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = normalize_ts(file_stream(spark, os.path.join(sf_dir, "events.parquet"), schema=batch.schema))
    return stream.select(
        F.col("event_id").alias("id"),
        synth_payload("event_id").alias("value"),
        F.col("ts"),
    )
