"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet (default sf0.01), then
compares row count, column names, and an order-insensitive canonical
value representation (floats rounded to 6 decimals, FIXTURES.md §5).

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

With ``--json`` the per-query verdicts are also written in the driver's
CORRECTNESS_r*.json shape (rows/schema/hash match + row counts + err),
so a full-registry run can be committed as a durable artifact covering
the queries outside the driver's fixed gate.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# --- ANN recall@k (VERDICT r4 next-round #8) -------------------------
# The four ANN registry entries are rows-only (approximate → no exact
# SQL oracle); these specs quantify what that exemption hides by
# computing recall against the EXACT operator at the artifact's own SF
# and recording it next to `err`. The gate fails if recall drops below
# the pinned bound (measured sf0.01 values: lsh_topk 0.10 single-probe —
# the fixture embeddings are near-random, the documented hard case for
# sign-LSH — and 0.80 multiprobe; ivf_topk 1.0; ivf_trained 0.9;
# lsh_neardup at thr=0.3: 0.356 single-probe, near the
# 1-(1-p^bits)^tables theory value ≈ 0.32, and 0.90 multiprobe —
# round 8). All inputs are deterministic (hash planes, seeded
# centroids), so the bounds are tight-but-safe floors, not statistical
# guesses.


def _recall_topk(approx_name: str):
    def compute(spark, sf_dir: str) -> float:
        from labs_stream_processing_examples_scala_spark.operators import graph_ann as GA
        from labs_stream_processing_examples_scala_spark.operators import quantization as QZ
        from labs_stream_processing_examples_scala_spark.operators import similarity as SIM

        fn = (
            getattr(SIM, approx_name, None)
            or getattr(QZ, approx_name, None)
            or getattr(GA, approx_name)
        )
        brute = [r.vec_id for r in SIM.brute_force_topk(spark, sf_dir).collect()]
        ann = {r.vec_id for r in fn(spark, sf_dir).collect()}
        return len(set(brute) & ann) / max(len(brute), 1)

    return compute


def _recall_neardup(n_probes: int):
    # measured at threshold 0.3: the registry default (0.9) has an
    # EMPTY exact pair set on the near-random fixture, which would make
    # recall vacuously 1.0 — 0.3 is where the metric has teeth
    def compute(spark, sf_dir: str) -> float:
        from labs_stream_processing_examples_scala_spark.operators import similarity as SIM

        exact = {(r.vec_a, r.vec_b) for r in SIM.cosine_neardup_pairs(spark, sf_dir, 0.3).collect()}
        if not exact:
            return 1.0
        got = {
            (r.vec_a, r.vec_b)
            for r in SIM.lsh_neardup_pairs(spark, sf_dir, 0.3, n_probes=n_probes).collect()
        }
        return len(got & exact) / len(exact)

    return compute


def _recall_nsw_batch(spark, sf_dir: str) -> float:
    """Mean per-query recall@10 of the BATCHED graph probe vs per-query
    brute force — each batched query must individually clear the tier's
    floor on average, not just query 0."""
    from labs_stream_processing_examples_scala_spark.operators.graph_ann import (
        nsw_batch_topk,
    )
    from labs_stream_processing_examples_scala_spark.operators.similarity import (
        brute_force_topk,
    )

    qids = (0, 1, 2, 3)
    got: dict[int, set] = {q: set() for q in qids}
    for r in nsw_batch_topk(spark, sf_dir, qids).collect():
        got[r.query_id].add(r.vec_id)
    recalls = []
    for q in qids:
        brute = [r.vec_id for r in brute_force_topk(spark, sf_dir, query_id=q).collect()]
        recalls.append(len(set(brute) & got[q]) / max(len(brute), 1))
    return sum(recalls) / len(recalls)


def _recall_nsw_incremental(spark, sf_dir: str) -> float:
    """Streaming NSW segments vs exact brute force: segment graphs
    differ from the batch build's, so the floor is the graph tier's
    0.70, not identity."""
    from labs_stream_processing_examples_scala_spark.operators.similarity import (
        brute_force_topk,
    )
    from labs_stream_processing_examples_scala_spark.streaming.nsw_ingest import (
        nsw_incremental_topk,
    )

    brute = [r.vec_id for r in brute_force_topk(spark, sf_dir).collect()]
    inc = {r.vec_id for r in nsw_incremental_topk(spark, sf_dir).collect()}
    return len(set(brute) & inc) / max(len(brute), 1)


def _recall_ivf_probe(spark, sf_dir: str) -> float:
    """x_sim_ivf_probe (round 12) probes the SAME materialized inverted
    file with the same centroids and scoring as the batch ivf_topk, so
    its floor is identity — 1.0 overlap vs the batch form (stronger
    than the ≥0.8 brute-force recall the verdict asked for: identity
    plus ivf_topk's own 0.50-floor spec pins both)."""
    from labs_stream_processing_examples_scala_spark.operators.similarity import (
        ivf_probe_topk,
        ivf_topk,
    )

    batch = [r.vec_id for r in ivf_topk(spark, sf_dir).collect()]
    probe = {r.vec_id for r in ivf_probe_topk(spark, sf_dir).collect()}
    return len(set(batch) & probe) / max(len(batch), 1)


def _recall_ivf_incremental(spark, sf_dir: str) -> float:
    """The streaming-maintained index is claimed IDENTICAL to the batch
    probe (frozen centroids, same rows, same scoring), so its floor is
    1.0 — overlap vs the batch ivf_topk, not vs brute force."""
    from labs_stream_processing_examples_scala_spark.operators.similarity import ivf_topk
    from labs_stream_processing_examples_scala_spark.streaming.ivf_ingest import (
        ivf_incremental_topk,
    )

    batch = [r.vec_id for r in ivf_topk(spark, sf_dir).collect()]
    inc = {r.vec_id for r in ivf_incremental_topk(spark, sf_dir).collect()}
    return len(set(batch) & inc) / max(len(batch), 1)


# name -> (compute(spark, sf_dir) -> float, floor)
#
# Floor discipline (round-14, closing the round-13 "zero margin" item):
# every STATISTICAL floor must sit ≥1 observed standard deviation below
# its measured value (variance bands measured across query ids 0-9 at
# sf0.01, recorded in COVERAGE.md). Floors of exactly 1.0 are IDENTITY
# assertions, not statistical floors — x_sim_ivf_probe and
# x_sim_ivf_incremental claim the SAME rows as their batch counterpart
# (same centroids, same scoring), so zero margin is their contract and
# any deviation is a bug, not noise (measured sd across 10 query ids:
# 0.0 for both).
RECALL_SPECS = {
    "x_sim_ivf_incremental": (_recall_ivf_incremental, 1.0),  # identity
    # round-7 default swap: x_sim_lsh_topk IS the multiprobe form now
    # (floor 0.50 = the observed 10-query minimum; mean 0.73, sd 0.17)
    "x_sim_lsh_topk": (_recall_topk("lsh_topk_multiprobe"), 0.50),
    "x_sim_ivf_topk": (_recall_topk("ivf_topk"), 0.50),
    "x_sim_ivf_probe": (_recall_ivf_probe, 1.0),  # identity (see above)
    "x_sim_ivf_trained": (_recall_topk("ivf_topk_trained"), 0.50),
    "x_sim_pq_topk": (_recall_topk("pq_topk_rerank"), 0.50),
    "x_sim_ivfpq_topk": (_recall_topk("ivfpq_topk"), 0.50),
    "x_sim_sq_topk": (_recall_topk("sq_topk"), 0.70),
    # round-9 graph tier: blocked exact-prefix build + multi-seed entry
    # (verdict task #5) — floor raised 0.70 → 0.85; measured 1.0 at
    # sf0.01/sf0.1 and 0.97+ on adversarial clustered data
    # (tests/test_round9_fixes.py dominance test)
    "x_sim_nsw_topk": (_recall_topk("nsw_topk"), 0.85),
    "x_sim_nsw_probe": (_recall_topk("nsw_probe_topk"), 0.85),
    "x_sim_nsw_batch": (_recall_nsw_batch, 0.85),
    "x_sim_nsw_incremental": (_recall_nsw_incremental, 0.85),
    # round-8 multiprobe default: measured 0.90 at sf0.01 thr 0.3
    # (single-probe was 0.356); the _sp baseline keeps its honest floor
    "x_sim_lsh_neardup": (_recall_neardup(4), 0.70),
    "x_sim_lsh_neardup_sp": (_recall_neardup(1), 0.20),
}

# NON-GATING contrast records (round-13 verdict task #4): entries whose
# purpose is to DOCUMENT a deliberately-weak baseline next to its
# strong default. Their recall is still computed and recorded in the
# artifact, but it never fails the gate — the measured 10-query band
# for single-probe LSH is mean 0.27, sd 0.155, min 0.10 (the registry
# query), so any gating floor would sit inside its own noise. The REAL
# invariant — multiprobe dominates single-probe on every query — is
# pinned by the referenced pytest, whose existence the gate verifies
# (same no-prose-only-exemptions rule as PYTEST_REFS).
# name -> (compute(spark, sf_dir) -> float, pinning pytest ref)
NON_GATING_RECALL = {
    "x_sim_lsh_topk_sp": (
        _recall_topk("lsh_topk"),
        "tests/test_extensions.py::test_lsh_topk_multiprobe_dominates",
    ),
}


# --- bounds for the NON-ANN rows-only entries (round-7 verdict task
# #5): every rows-only query must carry a MACHINE-CHECKED bound — an
# inline tolerance computed here against the exact answer (DuckDB on
# the same parquet = the third engine), or a named pytest proof whose
# existence the gate verifies. A rows-only entry in none of the spec
# tables FAILS the gate: prose-only exemptions are unrepresentable.


def _tol_hll_distinct(spark, con, sf_dir: str) -> float:
    from labs_stream_processing_examples_scala_spark.operators import sketches as SK

    got = {r["o_orderpriority"]: r["approx_custs"] for r in SK.hll_distinct_per_group(spark, sf_dir).collect()}
    exact = dict(
        con.execute(
            "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    )
    if set(got) != set(exact):
        return 1.0
    return max(abs(got[k] - n) / max(n, 1) for k, n in exact.items())


def _tol_hll_rollup(spark, con, sf_dir: str) -> float:
    from labs_stream_processing_examples_scala_spark.operators import sketches as SK

    got = SK.hll_mergeable_rollup(spark, sf_dir).collect()[0]["approx_total_custs"]
    n = con.execute("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    return abs(got - n) / max(n, 1)


def _tol_approx_percentile(spark, con, sf_dir: str) -> float:
    from labs_stream_processing_examples_scala_spark.operators import sketches as SK

    got = {
        r["o_orderstatus"]: (r["p50_approx"], r["p90_approx"])
        for r in SK.approx_percentiles(spark, sf_dir).collect()
    }
    exact = {
        s: (p50, p90)
        for s, p50, p90 in con.execute(
            "SELECT o_orderstatus, quantile_disc(o_totalprice, 0.5), "
            "quantile_disc(o_totalprice, 0.9) FROM orders GROUP BY 1"
        ).fetchall()
    }
    if set(got) != set(exact):
        return 1.0
    return max(
        abs(g - e) / max(abs(e), 1e-9)
        for s in exact
        for g, e in zip(got[s], exact[s])
    )


def _tol_mv_distinct(spark, con, sf_dir: str) -> float:
    from labs_stream_processing_examples_scala_spark.streaming import materialized_view as MV

    got = {r["event_type"]: r["approx_distinct"] for r in MV.incremental_distinct_users(spark, sf_dir).collect()}
    exact = dict(
        con.execute("SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1").fetchall()
    )
    if set(got) != set(exact):
        return 1.0
    return max(abs(got[k] - n) / max(n, 1) for k, n in exact.items())


# name -> (compute(spark, con, sf_dir) -> relative error, bound)
TOLERANCE_SPECS = {
    "q36_hll_distinct": (_tol_hll_distinct, 0.05),      # HLL lg_k rsd
    "q36_hll_rollup": (_tol_hll_rollup, 0.05),
    "q36_approx_percentile": (_tol_approx_percentile, 0.02),  # GK acc 10k
    "x_mv_distinct_users": (_tol_mv_distinct, 0.02),    # pytest bound
}

# name -> pytest node proving the entry (third-engine/numpy oracles or
# byte-level plumbing checks that need fixtures, not SQL); the gate
# fails if the referenced test function no longer exists.
PYTEST_REFS = {
    "x_mv_heavy_tokens": "tests/test_materialized_view.py::test_streaming_heavy_hitters_error_bounds",
    "x_sim_pq_codes": "tests/test_extensions.py::test_pq_arrow_encode_matches_catalyst_reference",
    "x_bpe_train": "tests/test_bpe_merge_freq.py::test_bpe_train_matches_python_reference",
    "x_bpe_segment": "tests/test_bpe_merge_freq.py::test_bpe_segment_matches_python_reference",
    "x_multimodal_features": "tests/test_extensions.py::test_multimodal_feature_plumbing",
    "x_multimodal_resize": "tests/test_extensions.py::test_multimodal_resize_plumbing",
    "x_multimodal_frames": "tests/test_extensions.py::test_multimodal_frame_sampling",
    "x_multimodal_augment": "tests/test_extensions.py::test_multimodal_augment_matches_numpy_oracle",
}


def _pytest_ref_exists(ref: str) -> bool:
    rel, _, test_name = ref.partition("::")
    path = Path(__file__).resolve().parent.parent / rel
    try:
        return f"def {test_name}(" in path.read_text()
    except OSError:
        return False


def _fmt_float(v: float) -> str:
    """6-dp canonical form with the zero representations folded:
    round-13 fuzz found Spark's NormalizeFloatingNumbers emits +0.0 as
    the DISTINCT/grouping representative where DuckDB keeps -0.0 (e.g.
    `0 * -2` through a UNION) — numerically equal values must not
    canonicalize to '-0.000000' vs '0.000000'. `+ 0.0` maps -0.0 to
    +0.0 and is the identity for every other value."""
    return f"{round(v, 6) + 0.0:.6f}"


def canonical(df: pd.DataFrame) -> tuple[int, list[str], list[tuple]]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append("∅")
            elif isinstance(v, bool):
                out.append(str(bool(v)))
            elif isinstance(v, float):
                out.append(_fmt_float(v))
            elif hasattr(v, "item"):  # numpy scalar
                iv = v.item()
                if isinstance(iv, float):
                    out.append(_fmt_float(iv))
                elif isinstance(iv, bool):
                    out.append(str(bool(iv)))
                else:
                    out.append(str(iv))
            else:
                out.append(str(v))
        rows.append(tuple(out))
    rows.sort()
    return len(rows), sorted(df.columns), rows


def check_one(spark, con, fn, sql, sf_dir: str) -> dict:
    """One query vs its oracle → a driver-shaped verdict record."""
    rec = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        sdf = fn(spark, sf_dir).toPandas()
    except Exception as exc:  # noqa: BLE001
        rec["err"] = f"spark error: {exc}"
        return rec
    rec["spark_rows"] = len(sdf)
    if sql is None:
        # rows-only (non-SQL-expressible): the weaker check the driver
        # also records — query ran and produced a well-formed frame.
        rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = True
        rec["err"] = "rows-only (no oracle SQL)"
        return rec
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as exc:  # noqa: BLE001
        rec["err"] = f"duckdb error: {exc}"
        return rec
    sn, scols, srows = canonical(sdf)
    dn, dcols, drows = canonical(ddf)
    rec["oracle_rows"] = dn
    rec["rows_match"] = sn == dn
    rec["schema_match"] = scols == dcols
    rec["hash_match"] = srows == drows
    if not rec["schema_match"]:
        rec["err"] = f"columns spark={scols} duckdb={dcols}"
    elif not rec["rows_match"]:
        rec["err"] = f"rowcount spark={sn} duckdb={dn}"
    elif not rec["hash_match"]:
        diff = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
        rec["err"] = (
            f"values differ, first at sorted-row {diff}: "
            f"spark={srows[diff]} duckdb={drows[diff]}"
        )
    return rec


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from labs_stream_processing_examples_scala_spark import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    results: dict[str, dict] = {}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = check_one(spark, con, fn, oracles.get(name), sf_dir)
        if rec["err"] == "rows-only (no oracle SQL)":
            if name in NON_GATING_RECALL:
                compute, ref = NON_GATING_RECALL[name]
                rec["pytest_ref"] = ref
                rec["gating"] = False
                try:
                    rec["recall"] = round(compute(spark, sf_dir), 3)
                except Exception as exc:  # noqa: BLE001
                    rec["rows_match"] = False
                    rec["err"] = f"recall computation failed: {exc}"
                if not _pytest_ref_exists(ref):
                    rec["rows_match"] = False
                    rec["err"] = f"referenced pytest proof missing: {ref}"
            elif name in RECALL_SPECS:
                compute, bound = RECALL_SPECS[name]
                try:
                    rec["recall"] = round(compute(spark, sf_dir), 3)
                    rec["recall_bound"] = bound
                    if rec["recall"] < bound:
                        rec["rows_match"] = False
                        rec["err"] = f"recall {rec['recall']} < bound {bound}"
                except Exception as exc:  # noqa: BLE001
                    rec["rows_match"] = False
                    rec["err"] = f"recall computation failed: {exc}"
            elif name in TOLERANCE_SPECS:
                compute, bound = TOLERANCE_SPECS[name]
                try:
                    rec["tol_err"] = round(compute(spark, con, sf_dir), 4)
                    rec["tol_bound"] = bound
                    if rec["tol_err"] > bound:
                        rec["rows_match"] = False
                        rec["err"] = f"tolerance {rec['tol_err']} > bound {bound}"
                except Exception as exc:  # noqa: BLE001
                    rec["rows_match"] = False
                    rec["err"] = f"tolerance computation failed: {exc}"
            elif name in PYTEST_REFS:
                ref = PYTEST_REFS[name]
                rec["pytest_ref"] = ref
                if not _pytest_ref_exists(ref):
                    rec["rows_match"] = False
                    rec["err"] = f"referenced pytest proof missing: {ref}"
            else:
                # round-7 rule: no prose-only rows-only entries
                rec["rows_match"] = False
                rec["err"] = "rows-only entry without a machine-checked bound"
        results[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if not ok:
            failures.append(name)
            print(f"FAIL  {name}: {rec['err']}")
        elif rec["err"] and rec["err"].startswith("rows-only"):
            if "recall" in rec and "recall_bound" in rec:
                extra = f", recall {rec['recall']}≥{rec['recall_bound']}"
            elif "recall" in rec:
                extra = f", recall {rec['recall']} (non-gating contrast)"
            elif "tol_err" in rec:
                extra = f", tol {rec['tol_err']}≤{rec['tol_bound']}"
            elif "pytest_ref" in rec:
                extra = f", proof {rec['pytest_ref']}"
            else:
                extra = ""
            print(f"rows-only  {name}: {rec['spark_rows']} rows{extra}")
        else:
            print(f"OK    {name}: {rec['spark_rows']} rows")
    spark.stop()
    if json_out:
        Path(json_out).write_text(json.dumps(results, indent=2) + "\n")
        print(f"wrote {json_out} ({len(results)} queries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
