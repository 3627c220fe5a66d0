"""Shared tombstone-delta protocol for the streaming ANN indexes.

Round-8 review: the IVF and NSW tiers each carried a verbatim copy of
the delete_ids allocation (including the stage + rename atomic-slot
loop the round-8 clobber fix introduced) — takedown already treats
them as one ``delete_ids`` contract, so the protocol lives here once.

Contract: each delete lands as one immutable delta dir ``d{n}`` under
the index's tombstone dir. Allocation is ATOMIC — the ids stage into a
unique temp dir and ``os.rename`` into the numbered slot; rename onto
an existing non-empty dir fails, so exactly one concurrent caller wins
each number and the loser retries with the next (two online deletes —
the path takedown presents — can never clobber each other). Readers
union every delta; duplicates across deltas are harmless because every
consumer anti-joins (idempotent by value).
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def allocate_tombstone_delta(spark: SparkSession, tombstone_dir: str, ids) -> dict:
    """Write ``ids`` (iterable of vec_ids or a DataFrame with a
    ``vec_id`` column) as the next atomically-allocated delta."""
    import uuid as _uuid

    df = (
        ids
        if isinstance(ids, DataFrame)
        else spark.createDataFrame([(int(i),) for i in ids], "vec_id long")
    )
    os.makedirs(tombstone_dir, exist_ok=True)
    stage = os.path.join(
        tombstone_dir, f"_stage_{os.getpid()}_{_uuid.uuid4().hex[:8]}"
    )
    df.select("vec_id").distinct().write.mode("overwrite").parquet(stage)
    # next slot = max(existing)+1, NOT the glob count: if a delta dir is
    # ever removed out-of-band (d0,d2 exist → count 2 collides with d2
    # forever), the count-based loop would spin without advancing
    while True:
        existing = [
            int(os.path.basename(p)[1:])
            for p in _glob.glob(os.path.join(tombstone_dir, "d*"))
            if os.path.basename(p)[1:].isdigit()
        ]
        n = max(existing) + 1 if existing else 0
        out = os.path.join(tombstone_dir, f"d{n}")
        try:
            os.rename(stage, out)
            break
        except OSError:
            if not os.path.isdir(out):
                shutil.rmtree(stage, ignore_errors=True)
                raise
            continue  # slot taken by a concurrent delete; re-scan
    return {"tombstone_delta": n, "ids": spark.read.parquet(out).count()}


def read_tombstones(spark: SparkSession, tombstone_dir: str) -> DataFrame | None:
    """Every tombstoned vec_id, or None when the set is empty. No
    distinct: each delta is distinct at write time and every consumer
    anti-joins, so cross-delta duplicates are harmless — a distinct
    here would put a shuffle in every probe."""
    dirs = [
        d
        for d in sorted(_glob.glob(os.path.join(tombstone_dir, "d*")))
        if _glob.glob(os.path.join(d, "*.parquet"))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs).select("vec_id")
