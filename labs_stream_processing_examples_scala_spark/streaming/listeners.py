"""Streaming observability — SURVEY §2.6 K5 (ACK/NACK responder).

The reference attaches a per-message completion listener
(onSuccess→ack / onError→DLQ / onNotProcessed→nack,
AkkaPipelineActors.scala:144-168). In Spark the unit of
acknowledgement is the micro-batch: a batch whose offsets commit IS
acked; a batch in flight when the query dies was nacked and will
replay. :class:`AckTracker` surfaces that protocol as an observable
log, which is what an operator hooks monitoring/alerting to.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class AckRecord:
    batch_id: int
    num_input_rows: int


@dataclass
class AckLog:
    acked: list[AckRecord] = field(default_factory=list)
    started: int = 0
    terminated: int = 0
    exception: str | None = None


class AckTracker(StreamingQueryListener):
    """Records every committed (acked) micro-batch; a termination with an
    exception means the in-flight batch was nacked (it will replay from
    the checkpoint on restart — tests/test_streaming.py proves the replay
    side)."""

    def __init__(self):
        self.log = AckLog()

    def onQueryStarted(self, event):  # noqa: N802
        self.log.started += 1

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        self.log.acked.append(AckRecord(p.batchId, p.numInputRows))

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        self.log.terminated += 1
        self.log.exception = event.exception
