"""sf1 / sf10 relational spot-bench (VERDICT r4 #9; r6 task #4 added
the second decade) — measured scale anchors beyond sf0.1 for the
headline plans.

Synthesizes an unskewed sf≈1 (×10) or sf≈10 (×100, ~60M lineitem rows
/ 3M vectors) corpus into /tmp by replicating the sf0.1 fixtures with
shifted keys (the same mechanism as tools/aqe_evidence.py, WITHOUT the
injected hot keys — this tool anchors the clean scale trend; the skew
behavior is aqe_evidence.py's job), then times the anchor queries
through the noop sink exactly like bench.py and prints ONE JSON line.

Run in a quiet window and record the numbers in BASELINE.md:

    python tools/sf1_bench.py            # sf1: synthesize + bench
    python tools/sf1_bench.py --sf10     # sf10: the second decade
    python tools/sf1_bench.py --fresh    # force re-synthesis
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_bench_data"
DST10 = "/tmp/sf10_bench_data"
REPLICAS = 10
REPLICAS10 = 100
OFF = 10_000_000  # key stride between replicas, same as aqe_evidence

QUERIES = [
    "q1_scan_project",
    "q4_agg_tpch_q1",
    "q7_join_revenue",
    "q30_tpch_q3",
    "q48_tpch_q7",
    # round-5 batch 2: MERGE upsert (orders⋈customer), heavy hitters +
    # BPE segmentation + LM scoring (documents — replicated ×10 below)
    "q65_merge_scd2",
    # round-7: the same MERGE through the merge-on-read tier — the
    # vector anti-join's cost at 10× target size is the number the
    # "write ∝ batch, read pays the anti-join" trade is priced on
    "q70_merge_mor",
    "x_freq_heavy_hitters",
    "x_bpe_segment",
    "x_text_lm_score",
    # round-6: the linear vector-scan tier over embeddings ×10 — the
    # Arrow PQ encode (train + encode, cold), the int8 SQ scan, and
    # the exact brute-force baseline
    "x_sim_pq_codes",
    "x_sim_sq_topk",
    "x_sim_bruteforce_topk",
]

# the second decade (r6 task #4): top-5 relational + the Arrow heavy
# hitters + the ANN tiers whose 100 TB story is partition pruning
# (IVF probe) vs linear scan (SQ, brute force) — the per-decade factor
# between sf1 and sf10 is the evidence the 100 TB claims extrapolate on
QUERIES10 = [
    "q1_scan_project",
    "q4_agg_tpch_q1",
    "q7_join_revenue",
    "q30_tpch_q3",
    "q48_tpch_q7",
    "x_freq_heavy_hitters",
    "x_sim_ivf_topk",
    "x_sim_sq_topk",
    "x_sim_bruteforce_topk",
    # round-7: the MOR merge at 1.5M customers — the second decade of
    # the vector anti-join + on-disk lifecycle
    "q70_merge_mor",
]


def synthesize(spark, dst: str, replicas: int, emb_replicas: int | None = None) -> None:
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    for t in ("region", "nation", "supplier", "part"):
        load_table(spark, SRC, t).write.parquet(f"{dst}/{t}.parquet")

    def replicate(name: str, key_cols: dict[str, int], n_reps: int) -> None:
        base = load_table(spark, SRC, name)
        reps = spark.range(n_reps).select(F.col("id").alias("__rep"))
        out = base.crossJoin(F.broadcast(reps))
        for col, stride in key_cols.items():
            out = out.withColumn(col, F.col(col) + F.col("__rep") * stride)
        # spread across files so scans parallelize like a real layout
        out.drop("__rep").repartition(32).write.parquet(f"{dst}/{name}.parquet")

    replicate("customer", {"c_custkey": OFF}, replicas)
    replicate("orders", {"o_orderkey": OFF, "o_custkey": OFF}, replicas)
    replicate("lineitem", {"l_orderkey": OFF, "l_partkey": 0, "l_suppkey": 0}, replicas)
    replicate("documents", {"doc_id": OFF}, replicas)
    # the fixture embeddings table is small (2k rows at sf0.1), so the
    # vector tier gets its own multiplier to reach the row counts the
    # ANN scale claims are about (sf10: ×1500 → 3M vectors, r6 task #4)
    replicate("embeddings", {"vec_id": OFF}, emb_replicas or replicas)
    n = spark.read.parquet(f"{dst}/lineitem.parquet").count()
    v = spark.read.parquet(f"{dst}/embeddings.parquet").count()
    print(f"synthesized {dst}: lineitem rows = {n:,}, vectors = {v:,}")


def main() -> None:
    import __spark_entry__ as entrymod
    from labs_stream_processing_examples_scala_spark import get_spark

    sf10 = "--sf10" in sys.argv
    dst, replicas, queries, sf = (
        (DST10, REPLICAS10, QUERIES10, 10.0) if sf10 else (DST, REPLICAS, QUERIES, 1.0)
    )
    spark = get_spark(app_name="sf10-bench" if sf10 else "sf1-bench")
    if "--fresh" in sys.argv or not os.path.isdir(dst):
        synthesize(spark, dst, replicas, emb_replicas=1500 if sf10 else None)
    qs = entrymod.queries()
    # warm-up on the smallest plan so query 1 isn't charged for JVM init
    qs[queries[0]](spark, dst).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in queries:
        t0 = time.perf_counter()
        qs[name](spark, dst).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "metric": f"sf{int(sf)}_relational_spot_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
