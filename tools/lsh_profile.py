"""Per-leg profile of the incremental LSH-dedup micro-batch (r14
verdict task #9: "profile whether banding probe or index append
dominates" before optimizing the slowest ingest tier).

Replays the exact IncrementalLshDedup.process_batch dataflow over a
pre-split corpus OUTSIDE the stream harness, timing each leg with its
own action:

  build   : shingle arrays + banded buckets of the new batch (persist)
  read    : accumulated index scan (arrays + buckets, count only)
  cand    : bucket-collision join (new-vs-old + in-batch) + distinct
  verify  : exact-Jaccard join against the array sides → noop sink
  write   : the three idempotent parquet appends (pairs re-computed —
            the real processor pays cand+verify INSIDE this write, so
            `write` here isolates the append cost via pre-materialized
            pairs)

The legs sum to more than the real batch wall (cand is computed once
for the count and once inside verify) — they are for ATTRIBUTION, not
as a total. A drift guard asserts the final accumulated pair set equals
the real processor's batch-equivalence contract (same count as the
batch operator at the same threshold).

NOTE: this replays the PRE-round-15 dataflow (union-distinct candidates
verified against old∪new arrays joined twice) — it is the attribution
measurement that MOTIVATED the round-15 split-verify rewrite in
incremental_dedup.process_batch (new-vs-old broadcast + single shuffle
of the accumulated arrays). Keep it as the before-shape profiler; the
after-shape is covered by the ingest benches and equivalence tests.

Usage:
  python tools/lsh_profile.py [--sf-dir /tmp/sf1_bench_data] [--splits 7]
                              [--json LSH_PROFILE_r15.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> int:
    args = sys.argv[1:]

    def _opt(flag, default):
        return type(default)(args[args.index(flag) + 1]) if flag in args else default

    sf_dir = _opt("--sf-dir", "/tmp/sf1_bench_data")
    splits = _opt("--splits", 7)
    out_json = _opt("--json", "")
    threshold = 0.5

    from labs_stream_processing_examples_scala_spark import get_spark
    from labs_stream_processing_examples_scala_spark.operators.dedup import (
        banded_of,
        lsh_candidate_pairs,
        minhash_of,
        shingle_arrays_of,
    )
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table
    from labs_stream_processing_examples_scala_spark.streaming.incremental_dedup import (
        IncrementalLshDedup,
        _verified_pairs,
    )
    from labs_stream_processing_examples_scala_spark.streaming.sinks import (
        idempotent_write,
    )

    spark = get_spark(app_name="lsh-profile")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batches = [
        docs.filter(F.pmod(F.col("doc_id"), F.lit(splits)) == i) for i in range(splits)
    ]

    work = tempfile.mkdtemp(prefix="lsh_profile_")
    proc = IncrementalLshDedup(work, threshold=threshold)
    per_batch: list[dict] = []
    try:
        for bid, bdf in enumerate(batches):
            t: dict[str, float] = {}

            def leg(name: str, fn):
                t0 = time.perf_counter()
                out = fn()
                t[name] = round(time.perf_counter() - t0, 2)
                return out

            new_arrs = shingle_arrays_of(bdf).filter(F.col("sz") > 0).persist()
            new_buckets = banded_of(minhash_of(new_arrs)).persist()
            leg("build", lambda: (new_arrs.count(), new_buckets.count()))

            old_arrs = proc._read_or_empty(
                spark, proc.arrays_dir, "doc_id long, shs array<bigint>, sz int",
                before_batch=bid,
            )
            old_buckets = proc._read_or_empty(
                spark, proc.buckets_dir, "doc_id long, band int, bucket bigint",
                before_batch=bid,
            )
            leg("read", lambda: (old_arrs.count(), old_buckets.count()))

            no = (
                new_buckets.select(F.col("doc_id").alias("n"), "band", "bucket")
                .join(
                    old_buckets.select(F.col("doc_id").alias("o"), "band", "bucket"),
                    ["band", "bucket"],
                )
                .filter(F.col("n") != F.col("o"))
                .select(
                    F.least("n", "o").alias("doc_a"), F.greatest("n", "o").alias("doc_b")
                )
            )
            nn = (
                new_buckets.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
                .join(
                    new_buckets.select(F.col("doc_id").alias("doc_b"), "band", "bucket"),
                    ["band", "bucket"],
                )
                .filter(F.col("doc_a") < F.col("doc_b"))
                .select("doc_a", "doc_b")
            )
            cand = no.union(nn).distinct()
            t["cand_n"] = leg("cand", cand.count)

            all_arrs = old_arrs.union(new_arrs)
            pairs = _verified_pairs(cand, all_arrs, all_arrs, threshold).persist()
            leg("verify", lambda: pairs.write.format("noop").mode("overwrite").save())

            def _writes():
                idempotent_write(pairs, proc.pairs_dir, bid)
                idempotent_write(new_arrs, proc.arrays_dir, bid)
                idempotent_write(new_buckets, proc.buckets_dir, bid)

            leg("write", _writes)
            pairs.unpersist()
            new_arrs.unpersist()
            new_buckets.unpersist()
            t["batch_id"] = bid
            per_batch.append(t)
            print(json.dumps(t), flush=True)

        inc_n = proc.pairs(spark).count()
        batch_n = lsh_candidate_pairs(spark, sf_dir, threshold=threshold).count()
        record = {
            "metric": "lsh_ingest_leg_profile",
            "sf_dir": sf_dir,
            "splits": splits,
            "per_batch": per_batch,
            "leg_totals": {
                k: round(sum(b[k] for b in per_batch), 2)
                for k in ("build", "read", "cand", "verify", "write")
            },
            "pairs_incremental": inc_n,
            "pairs_batch_operator": batch_n,
            "pairs_equal": inc_n == batch_n,
        }
        if out_json:
            Path(out_json).write_text(json.dumps(record, indent=1) + "\n")
        print(json.dumps({k: record[k] for k in ("leg_totals", "pairs_equal")}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        try:
            spark.stop()
        except Exception:  # noqa: BLE001
            pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
