"""The reference's interval tick source as a Spark 4 Python DataSource.

The reference's only true source is a scheduler tick that fabricates
``Data(id, "Input Data: $id")`` messages (MessageProcessor.scala:21-22,
AkkaPipelineActors.scala:31-36). streaming/sources.py maps that onto
Spark's built-in rate source; this module is the other faithful form —
a first-class custom source via the Spark 4 ``pyspark.sql.datasource``
API, usable as BOTH ``spark.read.format("tick")`` (a bounded run of
ticks) and ``spark.readStream.format("tick")`` (unbounded, resumable:
offsets are plain tick counters, so checkpoint/restart resumes exactly
where the last commit ended — the same at-least-once contract as the
reference's ACK'd timer).

Options:
- ``n``                (batch) total ticks, default 1000
- ``ticks_per_batch``  (stream) ticks fabricated per micro-batch,
                       default 100 — deterministic (no wall clock), so
                       scenario tests replay identically
- ``partitions``       parallelism of the BATCH read, default 4 (the
                       stream form is a driver-prefetched simple
                       reader — see TickSimpleStreamReader)

Scale: tick fabrication is embarrassingly parallel in the batch form
(each partition generates its id range); the stream form keeps no
state beyond the engine-owned integer offset.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _emit(start: int, end: int) -> Iterator[tuple]:
    for i in range(start, end):
        yield (i, f"Input Data: {i}")


def _split(start: int, end: int, n_parts: int) -> list[_Range]:
    total = end - start
    step = max(total // n_parts, 1)
    parts = []
    s = start
    while s < end:
        e = min(s + step, end)
        # last partition absorbs the remainder
        if len(parts) == n_parts - 1:
            e = end
        parts.append(_Range(s, e))
        s = e
    return parts


class TickBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        return _split(0, self.n, self.n_parts)

    def read(self, partition: _Range):
        return _emit(partition.start, partition.end)


class TickSimpleStreamReader(SimpleDataSourceStreamReader):
    """Offsets are plain tick counters OWNED BY THE ENGINE.

    The full ``DataSourceStreamReader`` API cannot host a pure counter
    source safely: a fresh reader's ``latestOffset()`` must answer
    before it has any way to learn the checkpoint position, and the
    measured restart protocols (rounds 4-5) each left a window — treat
    a planned start as committed and a replayed batch silently empties
    (one lost batch); let a stale ``latestOffset`` below the WAL be
    committed and the engine rewinds its committed offset, re-emitting
    the span under a fresh batch id (permanent duplicates, because the
    file sink dedupes by batch id, not content). Sources with an
    external offset authority (Kafka brokers, file listings) don't have
    this problem; a counter's only authority is the checkpoint itself.

    The SIMPLE stream-reader API inverts control: the engine hands the
    committed start offset to ``read(start)`` and replays
    planned-but-uncommitted ranges via ``readBetweenOffsets`` — so this
    reader is STATELESS and restart-correct by construction: it can
    neither lose a replay nor plan backwards. Contract pinned by the
    restart tests in tests/test_streaming.py.

    Trade-off (documented Spark behavior): simple readers prefetch on
    the driver and serve one partition per micro-batch. Tick volume is
    trivial, so driver fabrication is free here; the parallel
    range-splitting generation lives in :class:`TickBatchReader`.
    """

    def __init__(self, options):
        self.per_batch = int(options.get("ticks_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def read(self, start: dict):
        s = int(start["tick"])
        e = s + self.per_batch
        # a LIST, not a generator — the engine pickles the prefetched
        # rows to ship them from the driver to the executors
        return list(_emit(s, e)), {"tick": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic fabrication → replay is bit-identical. This one
        # runs inside the executor's read task and must be an ITERATOR
        # (read()'s list is the driver-side picklable prefetch)
        return _emit(int(start["tick"]), int(end["tick"]))

    def commit(self, end: dict) -> None:
        pass  # pure counters — nothing external to clean up


class TickDataSource(DataSource):
    """``format("tick")`` — register with
    ``spark.dataSource.register(TickDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "tick"

    def schema(self) -> str:
        return "id bigint, value string"

    def reader(self, schema) -> TickBatchReader:
        return TickBatchReader(self.options)

    def simpleStreamReader(self, schema) -> TickSimpleStreamReader:
        return TickSimpleStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TickDataSource)
