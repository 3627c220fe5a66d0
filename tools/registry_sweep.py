"""Full-registry timing sweep — every `__spark_entry__.queries()` entry
through the noop sink at one scale factor, ONE JSON line.

bench.py times the curated HEADLINE set; this tool times EVERYTHING,
because the queries nobody benches are where scale bugs hide: the
round-6 sweep found the PQ family compile/interpretation-bound
(x_sim_ivfpq_topk 221 s cold at sf0.1) and two quadratic verifies
serialized onto one core by AQE's fanout-blind coalescing
(x_dedup_fuzzy_names 11.2 s, x_sim_neardup_pairs 110.9 s) — none of
which any curated bench or oracle run would ever surface, since
correctness gates run at sf0.01 where everything is fast.

Run it per round in a quiet window and diff the JSON against the last
committed SWEEP_r*.json; anything that grew super-linearly against its
neighbours is the next plan audit candidate.

Usage: python tools/registry_sweep.py [sf_dir] [--json OUT.json]

Caveats: alphabetical order means shared caches (shingle arrays, LSH
signatures, PQ/k-means models, streaming index workdirs) are built by
the FIRST query that needs them and ride free for the rest — cold
costs land on the alphabetically-first family member, so compare a
query against its own history, not against its siblings.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    out_path = None
    argv = sys.argv[1:]
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("usage: registry_sweep.py [sf_dir] --json <out.json>")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]  # drop flag AND its value
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    import __spark_entry__ as entrymod
    from labs_stream_processing_examples_scala_spark import get_spark

    import bench as benchmod

    calib_start = benchmod._calibrate()  # host self-evidence (round 8)
    spark = get_spark(app_name="registry-sweep")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    probes: dict[str, float] = {}
    names = sorted(qs)
    for name in names:
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        probes[name] = round(benchmod._light_probe_ms(), 1)
    # per-query dirty-window retry, same policy as bench.py / sf1_bench
    # (round-11: the r11 sweep carried a 5x contended-moment outlier on
    # x_sim_neardup_pairs that took manual re-runs to attribute)
    retries = benchmod._self_heal(
        lambda name: qs[name](spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        names,
        timings,
        probes,
        errors,
    )
    calib_end = benchmod._calibrate()
    record = {
        "metric": "registry_sweep_total_wall",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "sf_dir": sf_dir,
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
    if retries:
        record["retries"] = retries
    if errors:
        record["errors"] = errors
    # sidecar first, then stop Spark GUARDED, then the JSON print as
    # the final stdout line (round-9 verdict task #2 + review: a stop()
    # exception must not lose a fully-measured sweep)
    line = json.dumps(record)
    if out_path:
        Path(out_path).write_text(line + "\n")
    try:
        spark.stop()
    except Exception as e:  # noqa: BLE001 — cleanup must not eat the record
        print(f"sweep cleanup failed (record intact): {e}", file=sys.stderr)
    print("slowest 15:", file=sys.stderr)
    for k, v in sorted(timings.items(), key=lambda x: -x[1])[:15]:
        print(f"  {v:8.2f}  {k}", file=sys.stderr)
    sys.stderr.flush()
    print(line, flush=True)
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
