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
# the pinned bound (measured sf0.01 values: lsh_topk 0.10 — the fixture
# embeddings are near-random, the documented hard case for sign-LSH;
# ivf_topk 1.0; ivf_trained 0.9; lsh_neardup 0.356 at thr=0.3, near the
# 1-(1-p^bits)^tables theory value ≈ 0.32). All inputs are
# deterministic (hash planes, seeded centroids), so the bounds are
# tight-but-safe floors, not statistical guesses.


def _recall_topk(approx_name: str):
    def compute(spark, sf_dir: str) -> float:
        from labs_stream_processing_examples_scala_spark.operators import quantization as QZ
        from labs_stream_processing_examples_scala_spark.operators import similarity as SIM

        fn = getattr(SIM, approx_name, None) or getattr(QZ, approx_name)
        brute = [r.vec_id for r in SIM.brute_force_topk(spark, sf_dir).collect()]
        ann = {r.vec_id for r in fn(spark, sf_dir).collect()}
        return len(set(brute) & ann) / max(len(brute), 1)

    return compute


def _recall_neardup(spark, sf_dir: str) -> float:
    # measured at threshold 0.3: the registry default (0.9) has an
    # EMPTY exact pair set on the near-random fixture, which would make
    # recall vacuously 1.0 — 0.3 is where the metric has teeth
    from labs_stream_processing_examples_scala_spark.operators import similarity as SIM

    exact = {(r.vec_a, r.vec_b) for r in SIM.cosine_neardup_pairs(spark, sf_dir, 0.3).collect()}
    if not exact:
        return 1.0
    got = {(r.vec_a, r.vec_b) for r in SIM.lsh_neardup_pairs(spark, sf_dir, 0.3).collect()}
    return len(got & exact) / len(exact)


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
RECALL_SPECS = {
    "x_sim_ivf_incremental": (_recall_ivf_incremental, 1.0),
    # round-7 default swap: x_sim_lsh_topk IS the multiprobe form now;
    # the single-probe teaching baseline keeps its honest 0.10 floor
    # under the _sp name (round-6 verdict "What's wrong #2")
    "x_sim_lsh_topk": (_recall_topk("lsh_topk_multiprobe"), 0.50),
    "x_sim_lsh_topk_sp": (_recall_topk("lsh_topk"), 0.10),
    "x_sim_ivf_topk": (_recall_topk("ivf_topk"), 0.50),
    "x_sim_ivf_trained": (_recall_topk("ivf_topk_trained"), 0.50),
    "x_sim_pq_topk": (_recall_topk("pq_topk_rerank"), 0.50),
    "x_sim_ivfpq_topk": (_recall_topk("ivfpq_topk"), 0.50),
    "x_sim_sq_topk": (_recall_topk("sq_topk"), 0.70),
    "x_sim_lsh_neardup": (_recall_neardup, 0.20),
}


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
                out.append(f"{round(v, 6):.6f}")
            elif hasattr(v, "item"):  # numpy scalar
                iv = v.item()
                if isinstance(iv, float):
                    out.append(f"{round(iv, 6):.6f}")
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
        if name in RECALL_SPECS and rec["err"] == "rows-only (no oracle SQL)":
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
        results[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if not ok:
            failures.append(name)
            print(f"FAIL  {name}: {rec['err']}")
        elif rec["err"] and rec["err"].startswith("rows-only"):
            extra = f", recall {rec['recall']}≥{rec['recall_bound']}" if "recall" in rec else ""
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
