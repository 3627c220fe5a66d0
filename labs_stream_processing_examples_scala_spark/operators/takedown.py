"""Takedown: remove documents from EVERY store that can return them.

The operational request a 100 TB training corpus actually receives —
"delete these documents" (copyright takedown, PII finding, retro
dedup purge) — touches more than one system: the document table keeps
serving the rows until a rewrite, and the ANN index keeps RETURNING
the deleted documents as neighbors until its entries die. Round 7
built the efficient delete primitive for each store; this module is
the one-call orchestration that keeps them consistent:

1. the document table takes a MERGE-ON-READ delete
   (operators/mor_table.mor_delete — a deletion vector ∝ deleted
   rows, base files untouched, committed through the atomic
   generational manifest), and
2. the streaming ANN index takes matching TOMBSTONES
   (streaming/ivf_ingest.delete_ids — probes anti-join the id set
   from the next call on, folded physically at the next rebuild).

Ordering: the INDEX is tombstoned FIRST. Both steps are idempotent
(the vector excludes already-deleted rows; tombstones dedupe by
value), so a crash between them is retried by re-running the call —
and the chosen order fails SAFE: a half-done takedown can leave a
document in the table but never a dangling neighbor pointing at a
document the table already dropped (a retrieval pipeline tolerates a
stale row far better than a vec_id it cannot resolve).

Verification surface: the table's change feed
(mor_table.mor_table_changes) emits exactly the deleted rows — the
audit record a takedown process files — and the probe tests assert
the index stops returning the victims while backfilling next-best
neighbors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from labs_stream_processing_examples_scala_spark.operators import mor_table as MT


def takedown(
    spark: SparkSession,
    docs_path: str,
    doc_id_col: str,
    partition_col: str,
    doc_ids,
    index=None,
    vec_ids=None,
) -> dict:
    """Remove ``doc_ids`` from the MOR document table at ``docs_path``
    and (when ``index`` is given) tombstone the matching vector ids in
    the streaming ANN index — or in EVERY index, when a corpus carries
    several (``index`` accepts a single index or an iterable; anything
    exposing the ``delete_ids(spark, ids)`` tombstone contract —
    IncrementalIvfIndex, IncrementalIvfPqIndex, IncrementalNswIndex —
    participates; all indexes tombstone before the table, preserving
    the fail-safe ordering for each). ``vec_ids`` defaults to
    ``doc_ids`` (the common one-embedding-per-document layout); pass
    the mapped set when the id spaces differ. Returns the per-store
    stats plus the table version whose change feed carries the audit
    rows."""
    # ids pass through AS GIVEN: a takedown list is commonly string/UUID
    # keyed (copyright/PII purge lists), and both downstream contracts
    # (isin predicate, delete_ids tombstones) are type-agnostic — the
    # old int() coercion made such a purge unexecutable (self-review
    # finding, round 11). Mixed-type inputs sort by (type, value).
    def _norm(vals):
        return sorted(set(vals), key=lambda v: (type(v).__name__, str(v)))

    ids = _norm(doc_ids)
    # Coerce ids against the TABLE SCHEMA BEFORE any mutation: a list
    # the isin predicate cannot type-coerce (string UUIDs vs a bigint
    # column, or a mixed list) used to raise AFTER the index tombstone
    # step, leaving the takedown permanently half-applied with no
    # completing retry (round-12 self-review). Schema-driven coercion
    # keeps the round-11 string-purge-list contract: a string column
    # stringifies every id, an integer column demands integer-like ids
    # and fails FAST otherwise.
    from pyspark.sql import functions as F

    dtype = dict(MT.read_mor(spark, docs_path).dtypes).get(doc_id_col)
    if dtype is None:
        raise ValueError(f"column {doc_id_col!r} not in table at {docs_path}")
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        # int(3.7) would silently truncate to 3 and delete a document
        # the caller never named — on a destructive op whose contract is
        # reject-before-mutate (round-12 ADVICE). Accept only exact
        # integers: ints/bools, integral floats, and digit strings.
        def _exact_int(v):
            if isinstance(v, bool) or isinstance(v, int):
                return int(v)
            if isinstance(v, float):
                if v.is_integer():
                    return int(v)
                raise ValueError(v)
            s = str(v).strip()
            if s.lstrip("-").isdigit():
                return int(s)
            raise ValueError(v)

        try:
            ids = sorted({_exact_int(v) for v in ids})
        except (TypeError, ValueError):
            bad = [
                v
                for v in ids
                if not (
                    isinstance(v, (int, bool))
                    or (isinstance(v, float) and v.is_integer())
                    or str(v).strip().lstrip("-").isdigit()
                )
            ]
            raise ValueError(
                f"takedown ids {bad!r} are not coercible to the {dtype} "
                f"column {doc_id_col!r}; nothing was deleted"
            ) from None
    elif dtype == "string":
        ids = sorted({str(v) for v in ids})
    out: dict = {"doc_ids": len(ids)}
    if index is not None:
        vids = ids if vec_ids is None else _norm(vec_ids)
        # a single index is anything exposing the delete_ids contract;
        # everything else is treated as an iterable OF indexes (sets,
        # generators — not just list/tuple, matching the docstring)
        indexes = [index] if hasattr(index, "delete_ids") else list(index)
        stats_list = [ix.delete_ids(spark, vids) for ix in indexes]
        out["index"] = stats_list[0] if len(stats_list) == 1 else stats_list
    stats = MT.mor_delete(
        spark, docs_path, F.col(doc_id_col).isin(ids), partition_col
    )
    out["table"] = stats
    out["audit_feed_versions"] = (stats["version"] - 1, stats["version"])
    return out


def takedown_audit(spark: SparkSession, docs_path: str, versions) -> DataFrame:
    """The audit record: the table's row-level change feed across the
    takedown commit — exactly the removed rows, change_type='delete'
    (pruned to the partitions the vectors touched)."""
    return MT.mor_table_changes(spark, docs_path, versions[0], versions[1])
