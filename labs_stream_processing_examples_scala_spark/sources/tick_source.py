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
- ``partitions``       parallelism of each read, default 4

Scale: tick fabrication is embarrassingly parallel (each partition
generates its id range); no state beyond the integer offset.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
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


class TickStreamReader(DataSourceStreamReader):
    """Offsets are plain tick counters. A fresh reader instance is built
    on every (re)start, so the counter must be RECOVERED from the
    offsets the engine hands back, not assumed to start at 0:

    - ``_committed`` — high-water mark of everything the engine has
      already committed (learned from ``partitions(start, …)``'s start,
      which IS the engine's committed/available position, and from
      ``commit``). Emission never goes below it, so even if the engine
      briefly plans a stale range after a restart (its first
      ``latestOffset`` necessarily predates any observed offset), no
      already-committed id is re-emitted.
    - ``_planned`` — what ``latestOffset`` last promised; it builds on
      ``_committed`` so the very next plan after a restart jumps back
      ahead of the checkpoint instead of replaying from 0.

    A batch the engine REPLAYS after a crash (planned but uncommitted —
    its start equals the committed offset) is re-emitted unchanged:
    that is the at-least-once replay the reference's ACK'd timer has.
    Restart contract is pinned by
    tests/test_streaming.py::test_tick_stream_restart_resumes_no_dupes.
    """

    def __init__(self, options):
        self.per_batch = int(options.get("ticks_per_batch", 100))
        self.n_parts = int(options.get("partitions", 4))
        self._planned = 0
        self._committed = 0

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def latestOffset(self) -> dict:
        self._planned = max(self._planned, self._committed) + self.per_batch
        return {"tick": self._planned}

    def partitions(self, start: dict, end: dict):
        # start is the engine's committed/available position — everything
        # below it is durably committed (checkpoint WAL), so it is the
        # floor for both recovery bookkeeping and emission.
        self._committed = max(self._committed, start["tick"])
        self._planned = max(self._planned, end["tick"])
        return _split(max(start["tick"], self._committed), end["tick"], self.n_parts)

    def read(self, partition: _Range):
        return _emit(partition.start, partition.end)

    def commit(self, end: dict) -> None:
        # pure counters — nothing to clean up, but remember the high
        # water so a post-restart stale plan can never re-emit below it
        self._committed = max(self._committed, end["tick"])

    def stop(self) -> None:
        pass


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

    def streamReader(self, schema) -> TickStreamReader:
        return TickStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TickDataSource)
