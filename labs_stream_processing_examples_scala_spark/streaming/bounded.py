"""Shared bounded-ingest driver for the incremental index/view tier.

Every incremental processor in this package (LSH dedup, IVF / IVF-PQ /
NSW ingest, the materialized views) drives the same shape: read a
parquet directory as an availableNow file stream, fan each micro-batch
into the processor's ``process_batch``, wait bounded, surface errors.
That block was copy-pasted six times across four modules — and all six
copies shared the same defect: ``awaitTermination(timeout)`` returning
False (batches still pending) fell through to a clean ``stop()`` and a
normal return, silently handing back a PARTIALLY-built index that the
registry memoizers then served forever (self-review finding, round
11). One driver, one timeout contract: a timeout RAISES.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def drive_bounded(
    spark: SparkSession,
    source_dir: str,
    select_cols: list[str],
    process_batch,
    checkpoint_dir: str,
    files_per_trigger: int = 1,
    timeout: float = 600.0,
    label: str = "bounded incremental run",
) -> None:
    """One availableNow pass over ``source_dir`` (``files_per_trigger``
    files per micro-batch) through ``process_batch``. Raises on query
    failure; raises TimeoutError when ``timeout`` elapses with batches
    pending — a partial index must never look like a finished one."""
    import os

    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
        .select(*select_cols)
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "ckpt"))
        .foreachBatch(process_batch)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout)
    if q.isActive:
        q.stop()
    if q.exception() is not None:
        raise RuntimeError(f"{label} failed: {q.exception()}")
    if not finished:
        raise TimeoutError(
            f"{label} timed out after {timeout}s with micro-batches still "
            "pending — the accumulated state is INCOMPLETE (re-run with a "
            "larger timeout; the checkpoint resumes where this run stopped)"
        )
