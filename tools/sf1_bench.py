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

# Round 8 (verdict task #6): BOTH decades run the whole HEADLINE set —
# per-decade factors per query, not a spot sample. Exclusions are
# documented, not silent:
EXCLUDE = {
    # fixed-cardinality blocking key (p_brand): replicated part makes
    # Σ block² cross the 50M comparison cap, and the operator's
    # DESIGNED behavior at that scale is the fail-fast
    # CandidateExplosionError naming the banded operators (measured:
    # it raises, which the noop-sink timing loop would record as an
    # error, not a time) — the scale trend for the verify stage is
    # carried by the banded dedup queries instead
    "x_dedup_fuzzy_names": "CandidateExplosionError by design at >=sf1",
}


def _headline() -> list[str]:
    import bench

    return [q for q in bench.HEADLINE if q not in EXCLUDE]


QUERIES = _headline()
QUERIES10 = _headline()


def synthesize(spark, dst: str, replicas: int, emb_replicas: int | None = None) -> None:
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    for t in ("region", "nation", "supplier"):
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
    # round 8 (full-HEADLINE anchors): events for the sessionize /
    # funnel / cohort / range-join / drift families — user_id shifts so
    # replicas create NEW users (more groups), not 100× hotter ones;
    # part for the scan families (its fuzzy-join consumer is excluded
    # above by its documented cap)
    replicate("events", {"event_id": OFF, "user_id": OFF}, replicas)
    replicate("part", {"p_partkey": OFF}, replicas)
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
    if "--synth-only" in sys.argv:
        # synthesize-then-bench in one window is a documented
        # anti-pattern (round-8 anchor notes: writeback contaminates the
        # first timed queries) — this flag supports the two-window form
        spark.stop()
        return
    if "--only" in sys.argv:
        # run a comma-separated slice (keeps each timing window short
        # and lets the slices land in separate quiet windows)
        if sys.argv.index("--only") + 1 >= len(sys.argv):
            raise SystemExit("usage: sf1_bench.py [--sf10] --only q1,q2,...")
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
        unknown = [q for q in only if q not in queries]
        if unknown:
            raise SystemExit(f"--only names not in the anchor set: {unknown}")
        queries = only
    import bench as benchmod

    calib_start = benchmod._calibrate()
    qs = entrymod.queries()
    # NEUTRAL warm-up (shared with bench.py): warming on queries[0]
    # pre-warmed that query's session caches, which for a --only slice
    # starting on a CACHE_WARM family made the defended first run warm
    benchmod.warmup(spark, dst)
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    probes: dict[str, float] = {}
    mt_probes: dict[str, float] = {}
    for name in queries:
        t0 = time.perf_counter()
        try:
            qs[name](spark, dst).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        probes[name] = round(benchmod._light_probe_ms(), 1)
        # per-query all-cores probe for the sim family (round-12 task
        # #3: the class that doubled sf10 NSW reads clean on the light
        # probe — this is where it bit, so this is where it's watched)
        if name.startswith(benchmod.MT_PROBE_PREFIXES):
            mt_probes[name] = benchmod._mt_probe_ms()
    # per-query dirty-window retry, shared policy with bench.py
    # (round-10 verdict task #3; cache-warming families keep their
    # first run defended — see bench.CACHE_WARM_PREFIXES)
    retries = benchmod._self_heal(
        lambda name: qs[name](spark, dst)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        queries,
        timings,
        probes,
        errors,
        mt_probes=mt_probes,
        mt_floor_hint=calib_start["calib_mt_ms"],
    )
    calib_end = benchmod._calibrate()
    record = {
        "metric": f"sf{int(sf)}_relational_spot_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calibration": {
            "start_py_ms": calib_start["calib_py_ms"],
            "start_np_ms": calib_start["calib_np_ms"],
            "start_mt_ms": calib_start["calib_mt_ms"],
            "end_py_ms": calib_end["calib_py_ms"],
            "end_np_ms": calib_end["calib_np_ms"],
            "end_mt_ms": calib_end["calib_mt_ms"],
        },
        "probes": probes,
    }
    if mt_probes:
        record["mt_probes"] = mt_probes
    if retries:
        record["retries"] = retries
    if errors:
        record["errors"] = errors
    # Fat record → sidecar; stdout gets a COMPACT line (same policy as
    # bench.py, round-12 verdict task #1: the fat line outgrew tail
    # captures). The per-round BENCH_SF{1,10}_r{N}.json artifact should
    # be COPIED FROM THE SIDECAR, not from stdout.
    # --only slices get their own name so they never clobber the
    # full-run sidecar the BENCH_SF{n}_r{N} round artifacts are copied
    # from (round-12 self-review, same policy as bench.py)
    slice_tag = "_SLICE" if "--only" in sys.argv else "_LAST"
    sidecar = f"BENCH_SF{int(sf)}{slice_tag}.json"
    try:
        (Path(__file__).resolve().parent.parent / sidecar).write_text(
            json.dumps(record) + "\n"
        )
    except OSError:
        sidecar = None
    compact = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "sf": sf,
        "queries_n": len(timings),
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5]),
        "calibration": record["calibration"],
        "retries_n": len(retries),
        "errors_n": len(errors),
        "detail": sidecar,
    }
    if errors:
        compact["errors"] = {k: errors[k][:80] for k in sorted(errors)[:3]}
    # stop (guarded) BEFORE printing — keeps the JSON the final stdout
    # line even when stop emits WARNs, and a stop() exception must not
    # lose a fully-measured run (round-9 verdict task #2 + review)
    try:
        spark.stop()
    except Exception as e:  # noqa: BLE001 — cleanup must not eat the record
        print(f"bench cleanup failed (record intact): {e}", file=sys.stderr)
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
