"""A message-broker-shaped source/sink: file-backed queue with ACK
offsets, NACK replay, and the DLQ contract (round-9 verdict task #3).

The reference's intended real source is a RabbitMQ queue (reference
README.md:7, build.sbt:20 — the amqp-client dependency): consumers
receive messages, ACK on success, NACK for redelivery, and route poison
messages to a dead-letter queue. No broker client ships in this
environment (sources/connectors.py probes for the kafka jar and raises
cleanly), so this module builds the same contract out of what a broker
actually is — an append-only segmented log with consumer offsets —
using the Spark 4 Python DataSource API (the tick source's machinery,
sources/tick_source.py):

- **publish** appends an immutable JSONL segment atomically (stage +
  fsync + rename into the next ``seg-%012d`` slot, max+1 allocation —
  the tombstone-delta protocol): concurrent producers land in distinct
  segments, a torn write is invisible.
- **stream read** is a ``SimpleDataSourceStreamReader``: the engine
  owns the (segment, row) offset through its checkpoint, so an
  uncommitted micro-batch REPLAYS byte-identically after a crash
  (NACK-by-redelivery, at-least-once) — segments are immutable, which
  is what makes ``readBetweenOffsets`` deterministic. The same
  restart-correctness argument as the tick source applies: the
  checkpoint is the offset authority; this reader is stateless.
- **ACK** is two-ledger, like a real broker consumed through Spark:
  the engine's checkpoint commit is the processing ACK (exactly-once
  into transactional sinks), and ``commit()`` additionally records the
  consumer group's acked offset broker-side (``_consumers/<group>``)
  — the retention signal ``purge_acked`` GCs fully-acked segments by,
  exactly how consumer-group offsets drive broker retention.
- **DLQ**: poison messages (unparseable lines) are emitted as
  ``key=NULL, value=<raw line>`` rows — errors-as-data — so the
  engine's F3 malformed-guard / dead-letter split (functions/errors.py,
  streaming/sinks.py) routes them without killing the stream, the
  reference's R5 negative requirement.

At 100 TB: a real broker replaces the directory — the consumer-side
contract (offset-driven replay, group ACKs, DLQ-as-data) is what the
pipeline code depends on, and it is identical. The batch reader
parallelizes one segment per task; the stream reader prefetches on the
driver (documented SimpleReader trade-off; bounded by rows_per_batch).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SEG_PREFIX = "seg-"
_SEG_DIGITS = 12


# --- broker-side API (producer / retention) ---------------------------


def _seg_path(queue_dir: str, n: int) -> str:
    return os.path.join(queue_dir, f"{_SEG_PREFIX}{n:0{_SEG_DIGITS}d}.jsonl")


def _list_segments(queue_dir: str) -> list[int]:
    try:
        names = os.listdir(queue_dir)
    except FileNotFoundError:
        return []
    out = []
    for nm in names:
        if nm.startswith(_SEG_PREFIX) and nm.endswith(".jsonl"):
            body = nm[len(_SEG_PREFIX) : -len(".jsonl")]
            if body.isdigit():
                out.append(int(body))
    return sorted(out)


def _stage_lines(queue_dir: str, lines) -> str:
    """Durably write a staged segment file (fsync'd) and return its path."""
    os.makedirs(queue_dir, exist_ok=True)
    stage = os.path.join(queue_dir, f"_stage_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    with open(stage, "w", encoding="utf-8") as f:
        for line in lines:
            f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())
    return stage


def _commit_segment(queue_dir: str, stage: str) -> int:
    """Link the staged file into the next free ``seg-%012d`` slot
    (max+1, gap-safe — the tombstone-delta protocol). os.link, NOT
    os.rename: rename silently OVERWRITES an existing FILE target on
    POSIX (the tombstone precedent is safe only because its slots are
    directories), so two producers racing to the same slot would
    clobber one segment; link is atomic and raises FileExistsError for
    the loser, who re-scans and takes the next slot."""
    while True:
        segs = _list_segments(queue_dir)
        n = segs[-1] + 1 if segs else 0
        target = _seg_path(queue_dir, n)
        try:
            os.link(stage, target)
            os.unlink(stage)
            return n
        except FileExistsError:
            continue  # lost the slot race to a concurrent producer


def publish(queue_dir: str, records) -> int:
    """Append one immutable segment of ``records`` (iterable of
    (key, value) pairs or {"key","value"} dicts; values stringified).
    Atomic: a reader either sees the whole segment or none of it.
    Returns the segment number."""

    def lines():
        for rec in records:
            if isinstance(rec, dict):
                key, value = rec.get("key"), rec.get("value")
            else:
                key, value = rec
            yield json.dumps({"key": key, "value": value})

    return _commit_segment(queue_dir, _stage_lines(queue_dir, lines()))


def publish_poison(queue_dir: str, raw_lines: list[str]) -> int:
    """Append a segment of RAW lines (not JSON-wrapped) — the test
    hook for the DLQ contract: these decode as key=NULL poison rows."""
    stage = _stage_lines(queue_dir, (ln.rstrip("\n") for ln in raw_lines))
    return _commit_segment(queue_dir, stage)


def _group_path(queue_dir: str, group: str) -> str:
    return os.path.join(queue_dir, "_consumers", f"{group}.json")


def read_group_offset(queue_dir: str, group: str) -> dict | None:
    try:
        with open(_group_path(queue_dir, group), encoding="utf-8") as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _write_group_offset(queue_dir: str, group: str, offset: dict) -> None:
    path = _group_path(queue_dir, group)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:6]}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(offset, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic — a crashed commit leaves the old ack


def sync_group_offset(queue_dir: str, group: str, checkpoint_dir: str) -> dict | None:
    """Record the broker-side group ACK from the ENGINE's checkpoint —
    the committed-offsets ledger that actually decides replay. Spark
    treats ``commit()`` as log-cleanup (it may run late or not at all
    within a short run; with the real Kafka source Spark likewise NEVER
    commits consumer-group offsets to the broker — the documented
    pattern is exactly this: derive them from the checkpoint or a query
    listener). Reads the newest batch present in ``commits/`` and acks
    its end offset from ``offsets/<batch>``; monotonic like
    :meth:`QueueSimpleStreamReader.commit`. The ack is RETENTION
    metadata, never the replay authority (the checkpoint is): the
    monotonic check has a read-modify-write window, so two queries
    sharing one group can transiently under-report progress — which
    only delays purging, never loses data. Returns the acked offset,
    or None when nothing committed yet."""
    cdir = os.path.join(checkpoint_dir, "commits")
    try:
        done = [int(f) for f in os.listdir(cdir) if f.isdigit()]
    except FileNotFoundError:
        return None
    if not done:
        return None
    lines_path = os.path.join(checkpoint_dir, "offsets", str(max(done)))
    with open(lines_path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    end = json.loads(lines[2])  # v1 header, run metadata, source-0 offset
    cur = read_group_offset(queue_dir, group)
    if cur is None or (int(cur["seg"]), int(cur["row"])) < (
        int(end["seg"]),
        int(end["row"]),
    ):
        _write_group_offset(queue_dir, group, end)
    return read_group_offset(queue_dir, group)


def purge_acked(queue_dir: str, up_to_group: str | None = None) -> list[int]:
    """Broker retention: delete segments every consumer group has fully
    acked (strictly below the MIN group offset's segment). With
    ``up_to_group``, consider only that group. Returns purged segment
    numbers. Segments are immutable and replay stops needing them only
    once the engine checkpoint passed them too — call this with the
    same discipline as broker retention config."""
    cdir = os.path.join(queue_dir, "_consumers")
    groups = (
        [up_to_group]
        if up_to_group
        else [g[:-5] for g in os.listdir(cdir) if g.endswith(".json")]
        if os.path.isdir(cdir)
        else []
    )
    offs = [read_group_offset(queue_dir, g) for g in groups]
    if not offs or any(o is None for o in offs):
        return []
    min_seg = min(int(o["seg"]) for o in offs)
    purged = []
    for n in _list_segments(queue_dir):
        if n < min_seg:
            os.remove(_seg_path(queue_dir, n))
            purged.append(n)
    return purged


# --- decode ------------------------------------------------------------


def _decode_line(line: str) -> tuple[str | None, str]:
    """A well-formed message decodes to (key, value); a poison line
    decodes to (None, raw) — the errors-as-data DLQ row."""
    try:
        obj = json.loads(line)
        if isinstance(obj, dict) and "value" in obj:
            k = obj.get("key")
            return (None if k is None else str(k)), str(obj["value"])
    except json.JSONDecodeError:
        pass
    return None, line


def _read_segment_rows(
    queue_dir: str, seg: int, start_row: int = 0, end_row: int | None = None
) -> Iterator[tuple]:
    # stream line-by-line: a segment is never slurped whole, so a large
    # segment costs the reader only the span it consumes
    with open(_seg_path(queue_dir, seg), encoding="utf-8") as f:
        for pos, line in enumerate(f):
            if pos < start_row:
                continue
            if end_row is not None and pos >= end_row:
                break
            key, value = _decode_line(line.rstrip("\n"))
            yield (seg, pos, key, value)


# --- Spark DataSource --------------------------------------------------


class _SegPartition(InputPartition):
    def __init__(self, queue_dir: str, seg: int):
        self.queue_dir = queue_dir
        self.seg = seg


class QueueBatchReader(DataSourceReader):
    """Bounded read of the whole queue — one task per segment."""

    def __init__(self, options):
        self.queue_dir = options.get("path")
        if not self.queue_dir:
            raise ValueError("fqueue requires .option('path', <queue dir>)")

    def partitions(self):
        return [_SegPartition(self.queue_dir, n) for n in _list_segments(self.queue_dir)]

    def read(self, partition: _SegPartition):
        return _read_segment_rows(partition.queue_dir, partition.seg)


class QueueSimpleStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"seg": s, "row": r} — the next unread position in the
    (segment asc, row asc) linearization. The engine checkpoint owns
    it; replay of a planned-but-uncommitted span re-reads the immutable
    files (``readBetweenOffsets``), which is the NACK-redelivery arm.
    ``commit`` additionally records the broker-side group ACK."""

    def __init__(self, options):
        self.queue_dir = options.get("path")
        if not self.queue_dir:
            raise ValueError("fqueue requires .option('path', <queue dir>)")
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        self.group = options.get("group", "default")

    def initialOffset(self) -> dict:
        segs = _list_segments(self.queue_dir)
        return {"seg": segs[0] if segs else 0, "row": 0}

    def read(self, start: dict):
        s, r = int(start["seg"]), int(start["row"])
        rows: list[tuple] = []
        # ONE pass per segment: _read_segment_rows streams lines and
        # stops at the batch budget, so no separate length-count scan
        # (review finding: the old two-pass form read every candidate
        # segment twice per planning call)
        for seg in [n for n in _list_segments(self.queue_dir) if n >= s]:
            budget = self.rows_per_batch - len(rows)
            if budget <= 0:
                break
            first = r if seg == s else 0
            taken = list(
                _read_segment_rows(self.queue_dir, seg, first, first + budget)
            )
            if taken:
                rows.extend(taken)
                s, r = seg, taken[-1][1] + 1
            # empty ⇒ segment fully consumed (or empty): the offset
            # stays where it is; a later segment with rows advances it
        # an ITERATOR, not a list: when no data arrived (end == start)
        # the engine's prefetch wrapper probes it with next() to verify
        # emptiness (datasource_internal.add_result_to_cache)
        return iter(rows), {"seg": s, "row": r}

    def readBetweenOffsets(self, start: dict, end: dict):
        s0, r0 = int(start["seg"]), int(start["row"])
        s1, r1 = int(end["seg"]), int(end["row"])
        for seg in _list_segments(self.queue_dir):
            if seg < s0 or seg > s1:
                continue
            first = r0 if seg == s0 else 0
            last = r1 if seg == s1 else None
            yield from _read_segment_rows(self.queue_dir, seg, first, last)

    def commit(self, end: dict) -> None:
        # broker-side consumer-group ACK: monotonic (never rewind)
        cur = read_group_offset(self.queue_dir, self.group)
        if cur is not None and (int(cur["seg"]), int(cur["row"])) >= (
            int(end["seg"]),
            int(end["row"]),
        ):
            return
        _write_group_offset(self.queue_dir, self.group, dict(end))


class QueueDataSource(DataSource):
    """``format("fqueue")`` — register with
    ``spark.dataSource.register(QueueDataSource)``. Schema mirrors a
    broker record: (seg, pos) = the broker offset, key/value = payload;
    key is NULL for poison rows (the DLQ discriminator)."""

    @classmethod
    def name(cls) -> str:
        return "fqueue"

    def schema(self) -> str:
        return "seg bigint, pos bigint, key string, value string"

    def reader(self, schema) -> QueueBatchReader:
        return QueueBatchReader(self.options)

    def simpleStreamReader(self, schema) -> QueueSimpleStreamReader:
        return QueueSimpleStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(QueueDataSource)


def queue_sink(queue_dir: str, key_col: str = "key", value_col: str = "value"):
    """foreachBatch writer publishing each micro-batch as ONE segment —
    the producer half of an engine→broker→engine round-trip. Replay of
    a batch id publishes a SECOND segment (the broker is append-only);
    exactly-once across the hop belongs to the CONSUMER side (offset
    dedupe / idempotent downstream), as with a real broker."""

    def write(batch_df, batch_id: int) -> None:
        rows = batch_df.select(key_col, value_col).collect()
        publish(queue_dir, [(r[0], r[1]) for r in rows])

    return write
