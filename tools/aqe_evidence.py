"""AQE-at-scale evidence for the no-hint join queries (VERDICT r2 #7).

q30/q33/q34/q42 are written WITHOUT broadcast hints: at fixture scale
AQE broadcasts the small side; the scale claim is that on big, skewed
inputs the same code falls back to shuffle joins and AQE splits skewed
partitions. This tool demonstrates that claim mechanically:

1. Synthesizes a ~sf1 corpus (≈6M lineitem rows) into /tmp by
   replicating the sf0.1 fixtures with shifted keys — full schemas,
   deterministic values — and injecting three hot keys: one l_orderkey
   (~20× replication of its lineitems), one l_partkey, one o_custkey.
2. Re-runs the four registry queries on it with AQE thresholds scaled
   down in proportion to the data (at 100 TB the DEFAULT thresholds
   exceed these sizes by the same margin: a sf100 customer table is
   GBs — far over the 10 MB broadcast default — and a hot key's
   shuffle partition is far over the 256 MB skew default):
     spark.sql.autoBroadcastJoinThreshold      = 1 MB
     ...adaptive.skewJoin.skewedPartitionThresholdInBytes = 16 MB
     ...adaptive.advisoryPartitionSizeInBytes  = 8 MB
3. Executes each query (noop sink) and prints the FINAL adaptive plan's
   join nodes — expect SortMergeJoin/ShuffledHashJoin (not Broadcast)
   on the fact⋈fact edges, with ``skew=true`` on the split joins.

Usage: python tools/aqe_evidence.py [--markdown]  (markdown → stdout
section ready to append to PLANS.md)
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/aqe_skew_sf1"
REPLICAS = 8
# every hot key is inflated to this many rows — vs a ~250k-row median
# shuffle partition that is ~16× median, far over both skew conditions
# (threshold bytes AND factor×median); mirrors a 100 TB corpus where one
# templated key owns percent-scale traffic
HOT_ROWS = 4_000_000

QUERIES = ["q30_tpch_q3", "q33_tpch_q5", "q34_tpch_q10", "q42_tpch_q17"]

SCALED_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": str(1024 * 1024),
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(16 * 1024 * 1024),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024 * 1024),
    # disable in-memory relation pruning noise; keep AQE defaults otherwise
}


def synthesize(spark) -> None:
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    # small dims: copy through unchanged
    for t in ("region", "nation", "supplier", "part"):
        load_table(spark, SRC, t).write.parquet(f"{DST}/{t}.parquet")

    def replicate(name: str, key_cols: dict[str, int]) -> None:
        """Union REPLICAS copies with per-replica key offsets so joins
        keep matching within a replica but keys stay distinct across."""
        base = load_table(spark, SRC, name)
        reps = spark.range(REPLICAS).select(F.col("id").alias("__rep"))
        out = base.crossJoin(F.broadcast(reps))
        for col, stride in key_cols.items():
            out = out.withColumn(col, F.col(col) + F.col("__rep") * stride)
        out.drop("__rep").write.parquet(f"{DST}/{name}.parquet")

    OFF = 10_000_000  # key stride between replicas
    replicate("customer", {"c_custkey": OFF})
    replicate("orders", {"o_orderkey": OFF, "o_custkey": OFF})
    replicate("lineitem", {"l_orderkey": OFF, "l_partkey": 0})  # partkeys shared

    li = load_table(spark, SRC, "lineitem")
    # hot l_orderkey: pick an order whose lineitems survive q30's
    # shipdate filter, then replicate its rows HOT_REPL*REPLICAS times
    hot_ok = (
        li.filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .groupBy("l_orderkey").count().orderBy(F.desc("count"), "l_orderkey")
        .first()[0]
    )
    hot_pk = li.groupBy("l_partkey").count().orderBy(F.desc("count"), "l_partkey").first()[0]

    def inflate(block, target):
        """Replicate a hot block with per-copy jitter on the measure
        columns: identical repeated rows RLE/LZ4-compress to ~nothing in
        the shuffle, hiding the skew from MapOutputStatistics (which is
        what AQE's byte thresholds read); real hot keys carry varied
        payloads, so the jitter is what makes the synthetic honest."""
        reps = spark.range(max(target // max(block.count(), 1), 1)).select(
            F.col("id").alias("__rep")
        )
        out = block.crossJoin(F.broadcast(reps))
        for c, jit in (
            ("l_extendedprice", (F.col("__rep") % 9973) / 100.0),
            ("l_quantity", (F.col("__rep") % 7) / 10.0),
            ("o_totalprice", (F.col("__rep") % 9973) / 100.0),
        ):
            if c in out.columns:
                out = out.withColumn(c, F.col(c) + jit)
        return out.drop("__rep")

    hot_li = li.filter(F.col("l_orderkey") == hot_ok).withColumn(
        "l_returnflag", F.lit("R")  # q34 (TPC-H Q10) filters returnflag='R'
    )
    for block in (hot_li, li.filter(F.col("l_partkey") == hot_pk)):
        # repartition(64): AQE splits a skewed reduce partition by MAP
        # output ranges — a hot block written by one task is one
        # mapper's output and cannot be split. Real hot keys span many
        # input splits; 64 files makes the synthetic match that.
        inflate(block, HOT_ROWS).withColumn(
            "l_linenumber", F.monotonically_increasing_id() % 10_000_000
        ).repartition(64).write.mode("append").parquet(f"{DST}/lineitem.parquet")

    # hot o_custkey: replicate one customer's orders
    o = load_table(spark, SRC, "orders")
    hot_ck = o.groupBy("o_custkey").count().orderBy(F.desc("count"), "o_custkey").first()[0]
    hot_orders = o.filter(F.col("o_custkey") == hot_ck)
    reps_o = spark.range(max(HOT_ROWS // 10 // max(hot_orders.count(), 1), 1)).select(
        F.col("id").alias("__rep")
    )
    hot_o = hot_orders.crossJoin(F.broadcast(reps_o)).withColumn(
        "o_orderkey", F.col("o_orderkey") + (F.col("__rep") + 100) * OFF
    )
    if "o_totalprice" in hot_o.columns:
        hot_o = hot_o.withColumn("o_totalprice", F.col("o_totalprice") + (F.col("__rep") % 9973) / 100.0)
    hot_o.drop("__rep").write.mode("append").parquet(f"{DST}/orders.parquet")

    # events/documents/embeddings not needed by these queries
    print(f"synthesized {DST}: hot l_orderkey={hot_ok}, hot l_partkey={hot_pk}, hot o_custkey={hot_ck}")


def join_lines(plan: str) -> list[str]:
    out = []
    for ln in plan.splitlines():
        if re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoop)", ln):
            out.append(ln.strip()[:160])
        if "skew=true" in ln and ln.strip()[:160] not in out:
            out.append(ln.strip()[:160])
    return out


def _stage_summaries(ui: str, app: str, after_stage: int) -> list[dict]:
    """Per-stage shuffle + task-skew summary from the Spark UI REST API
    (stages completed after `after_stage`): bytes through each
    exchange, task count, and the max/median task-time ratio — the
    straggler detector the round-12 verdict asked for at sf10."""
    import json as _json
    import urllib.request

    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = _json.load(r)
    out = []
    for st in stages:
        sid = st["stageId"]
        if sid <= after_stage:
            continue
        if not (st.get("shuffleReadBytes") or st.get("shuffleWriteBytes")):
            continue
        q = "quantiles=0.0,0.5,1.0"
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/{st['attemptId']}"
                f"/taskSummary?{q}"
            ) as r:
                ts = _json.load(r)
            run_min, run_med, run_max = ts["executorRunTime"]
        except Exception:  # noqa: BLE001 — summary may be evicted; keep the stage row
            run_min = run_med = run_max = None
        out.append(
            {
                "stage": sid,
                "tasks": st["numCompleteTasks"],
                "shuffle_read_mb": round(st.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuffle_write_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 1),
                "task_ms_med": run_med,
                "task_ms_max": run_max,
                "straggler_ratio": (
                    round(run_max / run_med, 2) if run_med else None
                ),
            }
        )
    return out


def anchor_main() -> None:
    """--anchor DIR mode (round-12 verdict task #5): run the two
    fastest-growing sf10 shuffle movers (q48_tpch_q7, q30_tpch_q3) on
    the REAL unskewed anchor corpus with the engine's default AQE
    thresholds, and record (a) the final adaptive join strategy, (b)
    AQE activity (coalesced shuffle reads / skew splits), (c) exchange
    sizes and per-stage task-time skew. Expectation on unskewed data:
    shuffle joins on fact⋈fact edges, AQE coalesce active, skew splits
    unneeded, no straggler (max/median task time well under 4×)."""
    import json as _json

    import __spark_entry__ as entrymod

    from labs_stream_processing_examples_scala_spark import get_spark

    dst = sys.argv[sys.argv.index("--anchor") + 1]
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    import bench as benchmod

    calib_start = benchmod._calibrate()
    spark = get_spark(app_name="aqe-anchor", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    qs = entrymod.queries()
    record: dict = {
        "metric": "aqe_anchor_evidence",
        "sf_dir": dst,
        "conf": {
            k: spark.conf.get(k)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.enabled",
                "spark.sql.adaptive.coalescePartitions.enabled",
                "spark.sql.adaptive.skewJoin.enabled",
                "spark.sql.shuffle.partitions",
            )
        },
        "queries": {},
    }
    last_stage = -1
    for name in ("q48_tpch_q7", "q30_tpch_q3"):
        df = qs[name](spark, dst)
        t0 = time.time()
        df.collect()
        wall = time.time() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        stages = _stage_summaries(ui, app, last_stage)
        if stages:
            last_stage = max(s["stage"] for s in stages)
        record["queries"][name] = {
            "wall_s": round(wall, 1),
            "join_nodes": join_lines(plan),
            "skew_splits": plan.count("skew=true"),
            "coalesced_reads": plan.count("coalesced"),
            "stages": stages,
            "max_straggler_ratio": max(
                (s["straggler_ratio"] for s in stages if s["straggler_ratio"]),
                default=None,
            ),
        }
        print(f"{name}: {wall:.1f}s, skew={record['queries'][name]['skew_splits']}, "
              f"coalesced={record['queries'][name]['coalesced_reads']}, "
              f"straggler={record['queries'][name]['max_straggler_ratio']}")
    calib_end = benchmod._calibrate()
    record["calibration"] = {
        "start_py_ms": calib_start["calib_py_ms"],
        "start_np_ms": calib_start["calib_np_ms"],
        "start_mt_ms": calib_start["calib_mt_ms"],
        "end_py_ms": calib_end["calib_py_ms"],
        "end_np_ms": calib_end["calib_np_ms"],
        "end_mt_ms": calib_end["calib_mt_ms"],
    }
    if out_json:
        Path(out_json).write_text(_json.dumps(record, indent=1))
    print(_json.dumps({k: record["queries"][k]["wall_s"] for k in record["queries"]}))
    spark.stop()


def main() -> None:
    if "--anchor" in sys.argv:
        anchor_main()
        return
    markdown = "--markdown" in sys.argv
    from labs_stream_processing_examples_scala_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="aqe-evidence", extra_conf=SCALED_CONF)
    for k, v in SCALED_CONF.items():
        spark.conf.set(k, v)
    if not os.path.isdir(DST):
        synthesize(spark)
    qs = entrymod.queries()
    sections = []
    # q30's SMJ output partitioning is REUSED by the groupBy(l_orderkey,
    # o_orderdate) right above it (HashPartitioning(l_orderkey) satisfies
    # the agg's distribution) — AQE therefore refuses to skew-split it,
    # because splitting would force an extra exchange. Run it a second
    # time with forceOptimizeSkewedJoin to show the split is available
    # and what it costs (the re-added exchange).
    for name in QUERIES + ["q30_tpch_q3+force"]:
        if name.endswith("+force"):
            name = name[: -len("+force")]
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
            label = f"{name} (forceOptimizeSkewedJoin)"
        else:
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
            label = name
        df = qs[name](spark, DST)
        t0 = time.time()
        # collect() (all four return ≤20 rows) so THIS QueryExecution
        # runs to completion — a .write spawns a separate execution and
        # the final adaptive plan (AQEShuffleRead skew splits) would
        # never appear on df's plan
        df.collect()
        wall = time.time() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        jl = join_lines(plan)
        skew = plan.count("skew=true")
        sections.append((label, wall, jl, skew))
        print(f"\n## {label}  ({wall:.1f}s, skew-split joins: {skew})")
        for ln in jl:
            print("   ", ln)
    if markdown:
        print("\n\n--- PLANS.md section ---\n")
        print("### AQE at scale: shuffle-join fallback + skew split (synthetic sf≈1, hot keys)\n")
        print(
            "Generated by `tools/aqe_evidence.py`: sf0.1 fixtures replicated ×8 with\n"
            "shifted keys (≈13M lineitem) plus ~4M-row hot blocks (jittered payloads,\n"
            "64 files each) on one l_orderkey / l_partkey / o_custkey; AQE thresholds\n"
            "scaled to the data (broadcast 1MB, skew threshold 16MB, advisory 8MB) —\n"
            "the same ratios the DEFAULTS give at 100 TB. Final adaptive plans:\n"
        )
        for name, wall, jl, skew in sections:
            print(f"- **{name}** ({wall:.1f}s; {skew} skew-split join(s)):")
            for ln in jl:
                print(f"  - `{ln}`")
    spark.stop()


if __name__ == "__main__":
    main()
