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

    - ``_planned`` — high-water mark of every offset observed, learned
      from BOTH endpoints of each ``partitions(start, end)`` call (the
      engine replays its WAL through ``partitions`` before the first
      post-restart ``latestOffset``, so by then the counter is already
      at the checkpoint position) and from ``commit``.
      ``latestOffset`` builds on it, so planning always moves forward
      from the checkpoint instead of restarting at 0.
    - ``partitions`` returns EXACTLY [start, end) — never clamped. The
      measured restart protocol probes ``partitions(p, p)`` with the
      last PLANNED offset p before replaying the uncommitted batch
      ``partitions(committed, p)``; treating a planned start as a
      committed floor (the round-4 attempt) turned that replay into an
      empty range and silently dropped a batch. A planned range start
      proves nothing about sink state — only ``commit`` does.

    A batch the engine REPLAYS after a crash (planned but uncommitted)
    is therefore re-emitted unchanged: the at-least-once replay the
    reference's ACK'd timer has, made exactly-once end-to-end by any
    batch-id-transactional sink (e.g. the file sink). A stale
    post-restart ``latestOffset`` below the WAL position yields a
    backwards range, which ``_split`` renders empty — never a
    re-emission. Restart contract is pinned by
    tests/test_streaming.py::test_tick_stream_restart_resumes_no_dupes.
    """

    def __init__(self, options):
        self.per_batch = int(options.get("ticks_per_batch", 100))
        self.n_parts = int(options.get("partitions", 4))
        self._planned = 0

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def latestOffset(self) -> dict:
        self._planned += self.per_batch
        return {"tick": self._planned}

    def partitions(self, start: dict, end: dict):
        self._planned = max(self._planned, start["tick"], end["tick"])
        return _split(start["tick"], end["tick"], self.n_parts)

    def read(self, partition: _Range):
        return _emit(partition.start, partition.end)

    def commit(self, end: dict) -> None:
        # pure counters — nothing to clean up; just keep the planning
        # high-water current even if no partitions call preceded
        self._planned = max(self._planned, end["tick"])

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
