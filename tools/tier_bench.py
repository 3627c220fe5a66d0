"""Write-amplification bench: copy-on-write vs merge-on-read MERGE.

Quantifies the trade the two lakehouse tiers make on the SAME change
batch against the SAME target (customer at $SPARK_GRAFT_SF_DIR,
mktsegment-partitioned, SCD2-initialized):

  - operators/merge.scd2_merge_cow   — rewrites every touched partition
  - operators/mor_table.mor_upsert   — writes a deletion vector + the
                                       appended version rows only

"Fresh bytes" per commit = sizes of files in the new generation with
st_nlink == 1 (a hardlinked carry-over has nlink ≥ 2 while the prior
generation is retained — the same inode identity the COW byte-equality
tests rely on, used here as a measurement instrument). Read-back cost
is timed for both tiers afterwards (MOR pays the vector anti-join the
write deferred).

Prints ONE JSON line; run in a quiet window and record in BASELINE.md:

    python tools/tier_bench.py             # default: 100-key batch
    python tools/tier_bench.py --keys 0    # the full q65 change batch
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

from pyspark.sql import functions as F  # noqa: E402

from labs_stream_processing_examples_scala_spark import get_spark  # noqa: E402
from labs_stream_processing_examples_scala_spark.operators import cow_table as CT  # noqa: E402
from labs_stream_processing_examples_scala_spark.operators import merge as MG  # noqa: E402
from labs_stream_processing_examples_scala_spark.operators import mor_table as MT  # noqa: E402
from labs_stream_processing_examples_scala_spark.sources.batch import load_table  # noqa: E402


def _fresh_bytes(gen_dir: str) -> int:
    """Bytes of newly-written (non-hardlink-carried) files in a
    generation, vectors included."""
    total = 0
    for root, _dirs, files in os.walk(gen_dir):
        for f in files:
            full = os.path.join(root, f)
            st = os.stat(full)
            if st.st_nlink == 1 and not f.startswith("."):
                total += st.st_size
    return total


def _table_bytes(gen_dir: str) -> int:
    return sum(
        os.path.getsize(os.path.join(root, f))
        for root, _d, fs in os.walk(gen_dir)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=100,
                    help="change-batch size (0 = full q65 batch)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="tier_bench")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    updates = MG._updates(spark, sf_dir)
    if args.keys:
        updates = updates.orderBy("u_key").limit(args.keys)
    updates = updates.cache()
    batch_rows = updates.count()

    work = tempfile.mkdtemp(prefix="tier_bench_")
    out: dict = {"metric": "merge_fresh_bytes", "batch_rows": batch_rows,
                 "sf_dir": sf_dir, "tiers": {}}
    try:
        for tier in ("cow", "mor"):
            target = os.path.join(work, tier)
            CT.cow_init(MG.scd2_init(cust), target, "c_mktsegment")
            out.setdefault("target_rows", cust.count())
            out.setdefault("target_bytes", _table_bytes(CT._gen_dir(target, 0)))
            t0 = time.monotonic()
            if tier == "cow":
                MG.scd2_merge_cow(
                    spark, target, updates,
                    "c_custkey", "u_key", "c_acctbal", "new_bal", "c_mktsegment",
                )
            else:
                MT.mor_upsert(
                    spark, target, updates,
                    "c_custkey", "u_key", "c_acctbal", "new_bal", "c_mktsegment",
                )
            wall = time.monotonic() - t0
            fresh = _fresh_bytes(CT._gen_dir(target, 1))
            t0 = time.monotonic()
            n = (
                (CT.read_cow if tier == "cow" else MT.read_mor)(spark, target)
                .filter("is_current").count()
            )
            read_wall = time.monotonic() - t0
            out["tiers"][tier] = {
                "fresh_bytes": fresh,
                "merge_sec": round(wall, 3),
                "read_sec": round(read_wall, 3),
                "rows_read": n,
            }
        c, m = out["tiers"]["cow"], out["tiers"]["mor"]
        out["write_amplification_ratio"] = round(
            c["fresh_bytes"] / max(1, m["fresh_bytes"]), 1
        )
        assert c["rows_read"] == m["rows_read"], "tier results diverged"
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
