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

Round 10 completes both ends of the hop:

- **distributed producer** — :func:`queue_sink` publishes one segment
  per non-empty partition FROM THE EXECUTORS (the round-9 form
  collect()ed the micro-batch to the driver); a stable ``producer_id``
  adds once-per-(batch, partition) markers.
- **competing consumers** — ``.option("consumer", <id>)`` switches a
  group to claim-based segment splitting
  (:class:`QueueCompetingStreamReader`): the RabbitMQ one-queue,
  many-workers pattern, with per-consumer ACK ledgers, crash
  re-adoption, competing retention, and dead-consumer claim release.
- **slot-stable retention** — purge TRUNCATES segments in place
  instead of deleting them, so the max+1 slot allocation can never
  hand a new publish an already-consumed segment number.

At 100 TB: a real broker replaces the directory — the consumer-side
contract (offset-driven replay, group ACKs, DLQ-as-data) is what the
pipeline code depends on, and it is identical; the directory would be
shared storage. The batch reader parallelizes one segment per task;
the stream reader prefetches on the driver (documented SimpleReader
trade-off; bounded by rows_per_batch).
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
    # offsets file layout: v1 header, run metadata, then ONE line per
    # source. Locate the fqueue source's {"seg","row"} line explicitly
    # instead of hardcoding line 2 (round-9 ADVICE): in a multi-source
    # query (join/union of streams) line 2 is only source 0, and acking
    # a different source's offset would mis-drive purge_acked retention.
    candidates = []
    for ln in lines[2:]:
        try:
            obj = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "seg" in obj and "row" in obj:
            candidates.append(obj)
    if len(candidates) != 1:
        raise ValueError(
            f"expected exactly one fqueue source offset in {lines_path}, "
            f"found {len(candidates)} — pass a single-fqueue-source "
            "checkpoint (per-source acking for multi-source queries is "
            "not supported)"
        )
    end = candidates[0]
    cur = read_group_offset(queue_dir, group)
    if cur is None or (int(cur["seg"]), int(cur["row"])) < (
        int(end["seg"]),
        int(end["row"]),
    ):
        _write_group_offset(queue_dir, group, end)
    return read_group_offset(queue_dir, group)


def _purge_segment(queue_dir: str, seg: int) -> bool:
    """Reclaim one segment's space by TRUNCATING it in place (round-10
    fix): deleting the file would let ``_commit_segment``'s max+1 slot
    allocation RE-USE the number once the max segment is purged — a new
    publish would then land below consumers' committed offsets (linear
    mode skips it silently; competing mode's claim tombstone blocks it)
    and the records would be lost. An empty segment keeps the slot
    occupied forever, costs one inode, reads as zero rows everywhere,
    and keeps every offset/claim invariant intact. Returns False when
    the segment is already empty (idempotence — don't re-report)."""
    p = _seg_path(queue_dir, seg)
    if os.path.getsize(p) == 0:
        return False
    with open(p, "r+b") as f:
        f.truncate(0)
        f.flush()
        os.fsync(f.fileno())
    return True


def purge_acked(queue_dir: str, up_to_group: str | None = None) -> list[int]:
    """Broker retention: reclaim segments every consumer group has fully
    acked (strictly below the MIN group offset's segment) by truncating
    them in place (:func:`_purge_segment` — slot numbers never reuse).
    With ``up_to_group``, consider only that group. Returns purged
    segment numbers. Segments are immutable and replay stops needing
    them only once the engine checkpoint passed them too — call this
    with the same discipline as broker retention config."""
    cdir = os.path.join(queue_dir, "_consumers")
    all_groups = (
        [g[:-5] for g in os.listdir(cdir) if g.endswith(".json")]
        if os.path.isdir(cdir)
        else []
    )
    # competing-mode ledgers ({"claimed","idx","row"} shape) share the
    # _consumers dir. A mixed queue (linear groups AND competing groups)
    # must NOT purge on linear offsets alone — a competing consumer may
    # still need those segments — so the linear sweep refuses EVEN when
    # an explicit up_to_group is passed (review finding: the narrowed
    # scan previously bypassed the guard); use purge_competing_acked
    # per competing group instead.
    all_offs = [read_group_offset(queue_dir, g) for g in all_groups]
    if any(o is not None and "seg" not in o for o in all_offs):
        return []
    groups = [up_to_group] if up_to_group else all_groups
    offs = [read_group_offset(queue_dir, g) for g in groups]
    if not offs or any(o is None for o in offs):
        return []
    min_seg = min(int(o["seg"]) for o in offs)
    purged = []
    for n in _list_segments(queue_dir):
        if n < min_seg and _purge_segment(queue_dir, n):
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


class QueueCompetingStreamReader(SimpleDataSourceStreamReader):
    """COMPETING CONSUMERS (round-9 verdict task #3): members of one
    group SPLIT the queue instead of each reading everything — the
    RabbitMQ pattern the reference is written against (one queue, many
    workers; reference Services.scala:70-73 consumes with per-message
    ACK precisely so multiple consumers can share the queue, and
    reference README.md:20 states the multi-core requirement).
    Activated by ``.option("consumer", <id>)``.

    Ownership is per SEGMENT, claimed atomically: a claim is a file
    ``_claims/<group>/<seg>`` whose content is the consumer id,
    committed by the stage + fsync + os.link protocol (link either
    fully succeeds for exactly one claimer or raises — no empty-claim
    crash window). The claimer is that segment's only reader in the
    group.

    Offset = ``{"claimed": [segs in claim order], "idx": i, "row": r}``
    — the consumer's private linearization is its claimed segments in
    claim order, and (idx, row) is the next unread position in it. The
    claimed list only ever appends, so ``readBetweenOffsets`` replays a
    span byte-identically after a crash (segments are immutable), and a
    restart RE-ADOPTS claims this consumer id owns that predate its
    checkpoint (the claim-then-crash window loses nothing as long as
    consumer ids are stable).

    Ordering (documented non-guarantees, as for any broker's competing
    consumers): rows WITHIN a segment stay ordered; segments of ONE
    consumer replay in claim order; there is NO cross-consumer or
    global queue order. Exactly-once per group = the union of the
    group's sinks, each query keeping its own checkpoint.

    A consumer that dies FOREVER strands its unconsumed claims — real
    brokers redeliver after a visibility timeout; here the operator
    fences the dead consumer and calls :func:`release_claims`
    (re-admitting a released consumer id afterwards would double-read,
    exactly like un-fenced redelivery)."""

    def __init__(self, options):
        self.queue_dir = options.get("path")
        if not self.queue_dir:
            raise ValueError("fqueue requires .option('path', <queue dir>)")
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        self.group = options.get("group", "default")
        self.consumer = str(options["consumer"])

    # -- claim bookkeeping (all driver-side: SimpleReader prefetch) --

    def _claims_dir(self) -> str:
        return _claims_dir(self.queue_dir, self.group)

    def _try_claim(self, seg: int) -> bool:
        d = self._claims_dir()
        os.makedirs(d, exist_ok=True)
        stage = os.path.join(d, f"_stage_{os.getpid()}_{uuid.uuid4().hex[:8]}")
        with open(stage, "w", encoding="utf-8") as f:
            f.write(self.consumer)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(stage, os.path.join(d, f"{seg:0{_SEG_DIGITS}d}"))
            won = True
        except FileExistsError:
            won = False
        os.unlink(stage)
        return won

    def initialOffset(self) -> dict:
        return {"claimed": [], "idx": 0, "row": 0}

    def read(self, start: dict):
        claimed = [int(s) for s in start["claimed"]]
        idx, row = int(start["idx"]), int(start["row"])
        # crash-recovery adoption: claims committed under this consumer
        # id before a crash but after its last checkpointed offset
        orphans = sorted(
            set(_group_claims(self.queue_dir, self.group).get(self.consumer, []))
            - set(claimed)
        )
        claimed.extend(orphans)
        rows: list[tuple] = []
        while len(rows) < self.rows_per_batch:
            if idx < len(claimed):
                budget = self.rows_per_batch - len(rows)
                try:
                    taken = list(
                        _read_segment_rows(
                            self.queue_dir, claimed[idx], row, row + budget
                        )
                    )
                except FileNotFoundError:
                    # purged by competing retention: purge only removes
                    # segments whose claimer FULLY acked them, and idx
                    # can lag one behind a fully-consumed segment (the
                    # row==len case) — treat as exhausted
                    taken = []
                rows.extend(taken)
                if len(taken) < budget:
                    idx += 1  # segment exhausted (immutable — stays so)
                    row = 0
                else:
                    row += len(taken)
                continue
            # need another segment: claim the lowest unclaimed one
            taken_by_anyone = _claimed_segments(self.queue_dir, self.group)
            got = None
            for seg in _list_segments(self.queue_dir):
                if seg in taken_by_anyone or seg in claimed:
                    continue
                if self._try_claim(seg):
                    got = seg
                    break
                # lost the race — that seg now belongs to a rival
            if got is None:
                break
            claimed.append(got)
        return iter(rows), {"claimed": claimed, "idx": idx, "row": row}

    def readBetweenOffsets(self, start: dict, end: dict):
        claimed = [int(s) for s in end["claimed"]]
        i0, r0 = int(start["idx"]), int(start["row"])
        i1, r1 = int(end["idx"]), int(end["row"])
        for i in range(i0, min(i1 + 1, len(claimed))):
            first = r0 if i == i0 else 0
            last = r1 if i == i1 else None
            yield from _read_segment_rows(self.queue_dir, claimed[i], first, last)

    def commit(self, end: dict) -> None:
        # per-consumer ACK ledger: _consumers/<group>.<consumer>.json —
        # group progress is the set of these files (group_progress)
        ledger = f"{self.group}.{self.consumer}"
        cur = read_group_offset(self.queue_dir, ledger)
        if cur is not None and (int(cur["idx"]), int(cur["row"])) > (
            int(end["idx"]),
            int(end["row"]),
        ):
            return
        _write_group_offset(self.queue_dir, ledger, dict(end))


def _claims_dir(queue_dir: str, group: str) -> str:
    return os.path.join(queue_dir, "_claims", group)


def _group_claims(queue_dir: str, group: str) -> dict[str, list[int]]:
    """{consumer_id: [claimed segments]} for one group."""
    d = _claims_dir(queue_dir, group)
    out: dict[str, list[int]] = {}
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return out
    for nm in names:
        if not nm.isdigit():
            continue
        try:
            with open(os.path.join(d, nm), encoding="utf-8") as f:
                owner = f.read().strip()
        except FileNotFoundError:
            continue
        out.setdefault(owner, []).append(int(nm))
    for v in out.values():
        v.sort()
    return out


def _claimed_segments(queue_dir: str, group: str) -> set[int]:
    d = _claims_dir(queue_dir, group)
    try:
        return {int(nm) for nm in os.listdir(d) if nm.isdigit()}
    except FileNotFoundError:
        return set()


def _segment_row_count(queue_dir: str, seg: int) -> int | None:
    """Line count of a segment, or None when it no longer exists
    (already purged)."""
    try:
        with open(_seg_path(queue_dir, seg), encoding="utf-8") as f:
            return sum(1 for _ in f)
    except FileNotFoundError:
        return None


def _acked_segments(queue_dir: str, off: dict) -> list[int]:
    """Segments a committed competing offset has FULLY delivered: the
    claimed[:idx] prefix, plus claimed[idx] itself when the committed
    row equals the segment's length (the reader only learns a segment
    is exhausted on its NEXT read, so idx can lag one behind)."""
    claimed = [int(s) for s in off["claimed"]]
    idx, row = int(off["idx"]), int(off["row"])
    done = claimed[:idx]
    if idx < len(claimed) and row > 0:
        n = _segment_row_count(queue_dir, claimed[idx])
        if n is not None and row >= n:
            done.append(claimed[idx])
    return done


def group_progress(queue_dir: str, group: str) -> dict:
    """Per-group ACK bookkeeping: which consumer owns which segments
    and how far each has acked along its private linearization.
    ``fully_acked`` per consumer = claimed segments its committed
    (idx, row) has delivered completely (see :func:`_acked_segments`)."""
    claims = _group_claims(queue_dir, group)
    acked: dict[str, dict] = {}
    cdir = os.path.join(queue_dir, "_consumers")
    prefix = f"{group}."
    if os.path.isdir(cdir):
        for nm in os.listdir(cdir):
            if nm.startswith(prefix) and nm.endswith(".json"):
                consumer = nm[len(prefix) : -5]
                off = read_group_offset(queue_dir, f"{group}.{consumer}")
                if off is not None and "claimed" in off:
                    acked[consumer] = {
                        "fully_acked": _acked_segments(queue_dir, off),
                        "offset": off,
                    }
    return {"claims": claims, "acked": acked}


def sync_competing_offset(
    queue_dir: str, group: str, consumer: str, checkpoint_dir: str
) -> dict | None:
    """Competing-mode twin of :func:`sync_group_offset`: derive the
    per-consumer broker-side ACK from the ENGINE's checkpoint (Spark
    may never call ``commit()`` within a short run — same rationale as
    the linear form). The consumer's offset line is the one carrying
    the competing shape {"claimed", "idx", "row"}."""
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
    candidates = []
    for ln in lines[2:]:
        try:
            obj = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "claimed" in obj and "idx" in obj:
            candidates.append(obj)
    if len(candidates) != 1:
        raise ValueError(
            f"expected exactly one competing fqueue offset in {lines_path}, "
            f"found {len(candidates)}"
        )
    end = candidates[0]
    ledger = f"{group}.{consumer}"
    cur = read_group_offset(queue_dir, ledger)
    if cur is None or (int(cur["idx"]), int(cur["row"])) < (
        int(end["idx"]),
        int(end["row"]),
    ):
        _write_group_offset(queue_dir, ledger, end)
    return read_group_offset(queue_dir, ledger)


def purge_competing_acked(queue_dir: str, group: str) -> list[int]:
    """Competing-mode retention: reclaim segments their CLAIMER has
    fully acked (the segment sits in the claimed[:idx] prefix of the
    claimer's committed offset, or at claimed[idx] with every row
    delivered). Truncation, not deletion (:func:`_purge_segment`), so
    slot numbers never reuse; claim files are kept as the ownership
    record."""
    prog = group_progress(queue_dir, group)
    done: set[int] = set()
    for info in prog["acked"].values():
        done.update(info["fully_acked"])
    purged = []
    for seg in _list_segments(queue_dir):
        if seg in done and _purge_segment(queue_dir, seg):
            purged.append(seg)
    return purged


def release_claims(queue_dir: str, group: str, consumer: str) -> list[int]:
    """Admin: release a PERMANENTLY DEAD consumer's unconsumed claims
    so surviving group members can claim those segments (the broker
    visibility-timeout/redelivery analogue). The caller must fence the
    dead consumer first — if it comes back after a release it would
    re-read or re-claim, exactly like un-fenced broker redelivery.
    Claims the consumer fully delivered are kept; a PARTIALLY consumed
    claim is released whole, so its acked head re-delivers to the new
    claimer — segment-granularity redelivery is at-least-once, exactly
    like a broker redelivering a dead consumer's unacked window.
    Returns released segment numbers."""
    off = read_group_offset(queue_dir, f"{group}.{consumer}")
    acked = (
        set(_acked_segments(queue_dir, off))
        if off is not None and "claimed" in off
        else set()
    )
    released = []
    d = _claims_dir(queue_dir, group)
    for seg in _group_claims(queue_dir, group).get(consumer, []):
        if seg not in acked:
            os.remove(os.path.join(d, f"{seg:0{_SEG_DIGITS}d}"))
            released.append(seg)
    return released


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

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        # .option("consumer", <id>) selects competing-consumers mode:
        # group members SPLIT segments via atomic claims instead of
        # each reading the whole queue
        if self.options.get("consumer"):
            return QueueCompetingStreamReader(self.options)
        return QueueSimpleStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(QueueDataSource)


def _marker_path(
    queue_dir: str, producer_id: str, batch_id: int, pid: int, digest: str
) -> str:
    return os.path.join(
        queue_dir, "_producers", producer_id, f"b{batch_id}-p{pid}-{digest}"
    )


def _write_marker(
    queue_dir: str, producer_id: str, batch_id: int, pid: int, digest: str, seg: int
) -> None:
    path = _marker_path(queue_dir, producer_id, batch_id, pid, digest)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:6]}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(seg))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _publish_partition(
    queue_dir: str,
    producer_id: str | None,
    batch_id: int,
    pid: int,
    rows,
) -> None:
    """Executor-side publish of one partition's rows as one segment,
    under the same stage + fsync + os.link slot protocol as
    :func:`publish`. Skips empty partitions; with a ``producer_id``,
    skips publishing when a marker for this (batch, partition, CONTENT
    DIGEST) already exists. The digest is in the key on purpose (review
    finding): a replayed batch can map rows to partitions DIFFERENTLY
    (changed shuffle partitioning, non-deterministic upstream), and a
    marker keyed on partition index alone would then silently DROP the
    rows now landing in an already-marked index — at-most-once. With
    the digest, a repartitioned replay re-publishes (duplicates, the
    documented at-least-once arm) and an identical replay skips exactly
    the segments it already committed; two same-batch partitions with
    identical content stay distinct through the index."""
    import hashlib

    first = next(rows, None)
    if first is None:
        return
    from itertools import chain

    lines = (
        json.dumps({"key": r[0], "value": r[1]}) for r in chain([first], rows)
    )
    stage = _stage_lines(queue_dir, lines)
    if producer_id is None:
        _commit_segment(queue_dir, stage)
        return
    h = hashlib.sha256()
    with open(stage, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()[:16]
    if os.path.exists(_marker_path(queue_dir, producer_id, batch_id, pid, digest)):
        os.unlink(stage)  # this exact content already committed
        return
    seg = _commit_segment(queue_dir, stage)
    _write_marker(queue_dir, producer_id, batch_id, pid, digest, seg)


def queue_sink(
    queue_dir: str,
    key_col: str = "key",
    value_col: str = "value",
    producer_id: str | None = None,
):
    """foreachBatch writer publishing each micro-batch from the
    EXECUTORS — one segment per non-empty partition (round-9 verdict
    task #1: the old form ``collect()``ed the whole micro-batch to the
    driver, the one driver-side materialization left on a data path; at
    100 TB a micro-batch does not fit on the driver). Each partition
    stages, fsyncs, and ``os.link``s its own segment — the identical
    atomic slot protocol as :func:`publish`, and the (seg, row) offset
    model already tolerates many segments per batch. Cross-partition
    segment order within a batch is unspecified (the slot race decides
    it) — matching the reference's no-ordering guarantee
    (reference README.md:15); per-partition order IS preserved inside a
    segment.

    Delivery across the hop: the broker is append-only, so a replayed
    batch id publishes fresh segments (at-least-once), as before. A
    stable ``producer_id`` upgrades this to once-per-(batch, partition):
    each partition commits a ``_producers/<id>/b<batch>-p<part>`` marker
    after its segment, and a task retry or batch replay that finds the
    marker skips the publish. The gap between segment link and marker
    write can still duplicate that one partition on a crash (the
    classic two-phase window) — consumers needing exactly-once dedupe
    downstream, as with a real broker."""

    def write(batch_df, batch_id: int) -> None:
        sel = batch_df.select(key_col, value_col)

        def pub(pid, it):
            _publish_partition(queue_dir, producer_id, batch_id, pid, it)
            return iter(())

        # an action that moves NOTHING to the driver: every partition
        # publishes its own segment and yields zero rows
        sel.rdd.mapPartitionsWithIndex(pub).count()

    return write
