"""Scale A/B for the round-14 similarity Arrow swap (r14 verdict task
#3): the interpreted Catalyst folds (`cosine`, `_assign_cell_expr` —
kept in-tree as parity references) vs the shipped Arrow/pandas UDFs
(`_cos_pair_udf`, `_cos_const_udf`, `_assign_cell`), interleaved
A/B/A/B in ONE session and window so host drift cancels.

The round-14 claim was "the interpreted fold is the dominant term of
the sf10 IVF build" — plausible, plan-verified, but never measured.
This tool measures the three scoring shapes on a ~1M-row × 64-dim
vector frame built IN-FLIGHT from the sf0.1 embeddings (replicated via
a broadcast cross join — nothing written, nothing cached between legs;
each timed leg computes from the same lazy frame through the noop
sink):

  assign : nearest-centroid id over 16 centroids (the IVF build pass)
  const  : cosine vs one constant query vector (the probe scoring pass)
  pair   : cosine between two vector columns (the candidate-pair verify)

Usage:
  python tools/sim_ab.py [--rows 1000000] [--reps 3] [--json AB_SIM_r15.json]

Prints one JSON line; the fat record goes to --json if given.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"


def _vectors(spark, rows: int):
    """~rows 64-dim vectors, replicated in-flight from sf0.1 embeddings
    (2k base rows). vec_id shifted per replica so ids stay distinct."""
    from labs_stream_processing_examples_scala_spark.operators.similarity import _dvec
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    e = load_table(spark, SRC, "embeddings").select(
        "vec_id", _dvec("embedding").alias("vec")
    )
    n_base = e.count()
    reps = max(1, rows // n_base)
    r = spark.range(reps).select(F.col("id").alias("__rep"))
    return (
        e.crossJoin(F.broadcast(r))
        .select((F.col("vec_id") + F.col("__rep") * 10_000_000).alias("vec_id"), "vec")
        .repartition(64)
    ), reps * n_base


def main() -> int:
    args = sys.argv[1:]

    def _opt(flag: str, default):
        if flag in args:
            return type(default)(args[args.index(flag) + 1])
        return default

    rows = _opt("--rows", 1_000_000)
    reps = _opt("--reps", 3)
    out_json = _opt("--json", "")

    import bench as benchmod
    from labs_stream_processing_examples_scala_spark import get_spark
    from labs_stream_processing_examples_scala_spark.operators import similarity as S

    spark = get_spark(app_name="sim-ab")
    calib_start = benchmod._calibrate()
    benchmod.warmup(spark, SRC)

    vecs, n_rows = _vectors(spark, rows)
    cents = S._seed_centroids(spark, SRC, 16)
    qvec = [float(x) for x in cents[0][1]]
    qn = S._norm_py(qvec)

    # pair leg: two vector columns per row (vec paired with the
    # next replica's copy — same bytes profile as a candidate stream)
    pairs = vecs.select(
        "vec_id", F.col("vec").alias("va"), F.reverse("vec").alias("vb")
    )

    legs = {
        "assign": {
            "old": lambda: vecs.select(
                "vec_id", S._assign_cell_expr(cents).alias("cell")
            ),
            "new": lambda: vecs.select(
                "vec_id", S._assign_cell(cents).alias("cell")
            ),
        },
        "const": {
            "old": lambda: vecs.select(
                "vec_id",
                (S.dot(F.col("vec"), F.lit(qvec).cast("array<double>")) /
                 (S.norm(F.col("vec")) * F.lit(qn))).alias("sim"),
            ),
            "new": lambda: vecs.select(
                "vec_id", S._cos_const_udf(qvec)(F.col("vec")).alias("sim")
            ),
        },
        "pair": {
            "old": lambda: pairs.select(
                "vec_id", S.cosine(F.col("va"), F.col("vb")).alias("sim")
            ),
            "new": lambda: pairs.select(
                "vec_id", S._cos_pair_udf()(F.col("va"), F.col("vb")).alias("sim")
            ),
        },
    }

    def _time(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    results: dict[str, dict] = {}
    for leg, forms in legs.items():
        walls = {"old": [], "new": []}
        probes = []
        for i in range(reps):
            order = ["old", "new"] if i % 2 == 0 else ["new", "old"]
            for tag in order:
                spark.sparkContext.setJobDescription(f"sim-ab {leg} {tag} rep{i}")
                walls[tag].append(_time(forms[tag]()))
                probes.append(round(benchmod._light_probe_ms(), 1))
        med = lambda xs: sorted(xs)[len(xs) // 2]
        results[leg] = {
            "old_s": walls["old"],
            "new_s": walls["new"],
            "median_old_s": med(walls["old"]),
            "median_new_s": med(walls["new"]),
            "speedup_old_over_new": round(med(walls["old"]) / med(walls["new"]), 3),
            "probes_ms": probes,
        }

    calib_end = benchmod._calibrate()
    record = {
        "metric": "sim_arrow_swap_ab",
        "rows": n_rows,
        "dims": 64,
        "n_centroids": len(cents),
        "reps_per_form": reps,
        "legs": results,
        "calibration": {
            "start_py_ms": calib_start["calib_py_ms"],
            "start_np_ms": calib_start["calib_np_ms"],
            "start_mt_ms": calib_start["calib_mt_ms"],
            "end_py_ms": calib_end["calib_py_ms"],
            "end_np_ms": calib_end["calib_np_ms"],
            "end_mt_ms": calib_end["calib_mt_ms"],
        },
    }
    if out_json:
        Path(out_json).write_text(json.dumps(record, indent=1) + "\n")
    try:
        spark.stop()
    except Exception as e:  # noqa: BLE001
        print(f"cleanup failed (record intact): {e}", file=sys.stderr)
    print(json.dumps({
        "metric": record["metric"], "rows": n_rows,
        "speedups_old_over_new": {k: v["speedup_old_over_new"] for k, v in results.items()},
        "detail": out_json or None,
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
