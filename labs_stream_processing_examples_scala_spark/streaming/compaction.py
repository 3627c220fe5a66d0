"""Small-file compaction for batch-id-partitioned streaming outputs.

The idempotent sink (sinks.idempotent_write) lands every micro-batch in
its own ``_batch_id=<n>/`` parquet directory. That is the right write
side — per-epoch overwrite is what makes replay a no-op — but a 100 TB
ingest running for months accumulates one directory (and often one
tiny file) per trigger: listing cost grows linearly, scan planning
slows, and the bucket-join pruning of the dedup indexes degrades into
metadata churn. This module is the maintenance half of that contract:

- :func:`compact_batched_dir` merges all batch directories up to the
  newest into ONE directory keyed by the highest merged id, sized by
  bytes (``target_bytes`` per output file). Readers never see a torn
  state: a JSON marker (written first) names the source ids and the
  staging dir, the merged copy is fully written (parquet ``_SUCCESS``)
  before any source is deleted, and the final step is a single atomic
  rename. Batch-id semantics are preserved — the merged rows carry the
  MAX source id, and every id a future micro-batch compares against
  (``_batch_id < current``) is larger than anything compacted.
- :func:`read_batched_dir` is the marker-aware reader the streaming
  indexes use (incremental_dedup, ingest_pipeline): at every crash
  point of the protocol it returns exactly the full row set —
  committed-but-unswapped compactions are read from staging, and
  uncommitted staging is ignored.

Crash matrix (marker M, staging S with Spark's ``_SUCCESS``, sources):
  before M          → nothing changed
  M, S incomplete   → reader ignores S (sources intact); next compact
                      restarts after deleting the stale staging
  M, S complete,    → reader = S ∪ (dirs ∉ sources); next compact
  sources partially    resumes the deletes and the rename
  deleted
  after rename,     → marker points at a missing staging dir → reader
  M not yet removed    reads the directories as-is (merged dir is in
                      place); next compact removes the stale marker

On a local filesystem the rename is atomic; on an object store this
exact protocol is what table formats implement with manifest files —
the marker IS a one-entry manifest, and swapping these two functions
for a Delta/Iceberg table keeps every caller unchanged (documented
trade-off, same as sources/connectors.py).

Concurrency contract: ONE maintenance writer at a time, and never an
EXTERNAL compaction concurrently with an active stream writer (the
stream's per-batch overwrite and the swap could interleave). The
in-band form — ``compact_every`` on the foreachBatch processors —
runs serially inside the micro-batch and is the safe way to compact a
live stream.
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKER = "_compaction.json"
STAGING = ".compact-staging"


def _marker_path(path: str) -> str:
    return os.path.join(path, MARKER)


def _read_marker(path: str) -> dict | None:
    try:
        with open(_marker_path(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _write_marker(path: str, payload: dict) -> None:
    tmp = _marker_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, _marker_path(path))


def _staging_committed(path: str) -> bool:
    return os.path.exists(os.path.join(path, STAGING, "_SUCCESS"))


def _batch_ids(path: str) -> list[int]:
    return sorted(
        int(d.rsplit("=", 1)[1])
        for d in glob.glob(os.path.join(path, "_batch_id=*"))
        if os.path.isdir(d)
    )


def read_batched_dir(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    before_batch: int | None = None,
) -> DataFrame:
    """Read everything the idempotent sink (plus any number of
    compactions) produced under ``path``, as (rows, ``_batch_id``
    dropped); ``before_batch`` keeps only rows from batches < that id
    (replay determinism — see incremental_dedup).

    With ``schema``, an empty/absent directory yields an empty frame of
    that schema; without it, absence is an error (the caller asserts
    the data exists). Marker-aware per the module crash matrix."""
    marker = _read_marker(path)
    staged: DataFrame | None = None
    exclude: set[int] = set()
    if marker is not None and _staging_committed(path):
        # committed compaction, swap not finished: staging is the truth
        # for its sources (some may already be deleted)
        exclude = set(marker["sources"])
        staged = (
            spark.read.parquet(os.path.join(path, STAGING))
            .withColumn("_batch_id", F.lit(marker["target_id"]))
        )
    ids = [i for i in _batch_ids(path) if i not in exclude]
    parts = []
    if ids:
        df = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, f"_batch_id={i}") for i in ids]
        )
        parts.append(df)
    if staged is not None:
        parts.append(staged)
    if not parts:
        if schema is None:
            raise FileNotFoundError(f"no batch output under {path}")
        return spark.createDataFrame([], schema)
    out = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    if before_batch is not None:
        out = out.filter(F.col("_batch_id") < before_batch)
    return out.drop("_batch_id")


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def compact_batched_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_batches: int = 2,
    keep_latest: bool = True,
    transform=None,
    partition_by: list[str] | None = None,
) -> dict:
    """Merge the ``_batch_id=*`` directories under ``path`` into one,
    keyed by the max merged id, with ~``target_bytes`` output files.
    Returns stats ``{compacted, sources, target_id, files_before,
    files_after}``; a no-op (fewer than ``min_batches`` mergeable dirs)
    returns ``compacted=False``. Safe to re-run at any time — an
    interrupted prior run is resumed or rolled back first (module crash
    matrix).

    ``keep_latest`` (the default) leaves the NEWEST batch directory out
    of the merge: the newest batch is the only one a restarted stream
    can legally replay (older ones are committed in the checkpoint
    WAL), and a replay of batch b reads the index with
    ``_batch_id < b`` — rows merged UNDER id b would vanish from that
    view and the replay's overwrite of ``_batch_id=b`` would destroy
    them. Compacting ``ids[:-1]`` into ``max(ids[:-1])`` keeps every
    legal replay's view byte-identical (pinned by the replay test in
    tests/test_streaming.py). Pass ``keep_latest=False`` only for
    retired directories no stream will ever write again.

    ``transform`` (DataFrame → DataFrame, optional) is applied to the
    merged span before it is written — for outputs whose rows are
    MERGEABLE partials (the incremental aggregate view), compaction can
    collapse rows, not just files. The transform must be a pure
    re-aggregation that any reader's own final aggregation is
    indifferent to (caller's contract, equivalence-tested by the MV)."""

    def _n_files(p: str) -> int:
        return sum(len(fs) for _, _, fs in os.walk(p))

    marker = _read_marker(path)
    if marker is not None:
        if _staging_committed(path):
            # committed: finish the deletes + rename
            for i in marker["sources"]:
                shutil.rmtree(os.path.join(path, f"_batch_id={i}"), ignore_errors=True)
            os.rename(os.path.join(path, STAGING), os.path.join(path, f"_batch_id={marker['target_id']}"))
            os.remove(_marker_path(path))
            # files_before is unknowable here (the crash already
            # deleted an unknown subset of the sources), so report the
            # post-resume count for both — the documented stats keys
            # must exist on EVERY compacted=True return (round-12
            # self-review: the resume path returned without them,
            # KeyError-ing callers exactly in the crash-recovery case)
            n_after = _n_files(path)
            return {
                "compacted": True,
                "resumed": True,
                "sources": marker["sources"],
                "target_id": marker["target_id"],
                "files_before": n_after,
                "files_after": n_after,
            }
        # uncommitted: roll the stale attempt back
        shutil.rmtree(os.path.join(path, STAGING), ignore_errors=True)
        os.remove(_marker_path(path))

    ids = _batch_ids(path)
    if keep_latest:
        ids = ids[:-1]
    if len(ids) < min_batches:
        return {"compacted": False, "sources": ids}
    target_id = max(ids)
    files_before = _n_files(path)
    total = sum(_dir_bytes(os.path.join(path, f"_batch_id={i}")) for i in ids)
    n_out = max(1, math.ceil(total / target_bytes))

    _write_marker(path, {"target_id": target_id, "sources": ids, "staging": STAGING})
    merged = spark.read.option("basePath", path).parquet(
        *[os.path.join(path, f"_batch_id={i}") for i in ids]
    ).drop("_batch_id")
    if transform is not None:
        merged = transform(merged)
    # one round-robin exchange of the compacted span — the whole point
    # is rewriting many small files as n_out well-sized ones. With
    # ``partition_by`` the staging write keeps the hive layout (e.g.
    # the IVF index's cell= dirs), so partition pruning — the reason
    # the layout exists — survives compaction; cluster by the
    # partition columns so each value lands in few output files.
    if partition_by:
        merged.repartition(n_out, *partition_by).write.mode("overwrite").partitionBy(
            *partition_by
        ).parquet(os.path.join(path, STAGING))
    else:
        merged.repartition(n_out).write.mode("overwrite").parquet(os.path.join(path, STAGING))
    for i in ids:
        shutil.rmtree(os.path.join(path, f"_batch_id={i}"))
    os.rename(os.path.join(path, STAGING), os.path.join(path, f"_batch_id={target_id}"))
    os.remove(_marker_path(path))
    return {
        "compacted": True,
        "sources": ids,
        "target_id": target_id,
        "files_before": files_before,
        "files_after": _n_files(path),
    }
