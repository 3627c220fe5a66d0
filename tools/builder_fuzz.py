"""Operator-level differential fuzzing — the engine's own DataFrame
BUILDERS under random parameters (round-13 verdict task #1).

tools/query_fuzz.py sweeps generated SQL text through Spark's frontend;
this tool fuzzes the repo's actual product surface: the public Python
builders in operators/{temporal,sampling,dedup,corpus,similarity}.py
and functions/text.py. Each sample draws seeded random parameters for
one family (session gaps, as-of event-type pairs, range-join windows
and bucket grains, split percentages, mixture temperatures, LSH /
Jaccard / Hamming thresholds, span sizes, chunk strides, top-k sizes),
invokes the builder through its PUBLIC signature, renders the
equivalent DuckDB SQL for the SAME parameters (the parameterized
generators in oracles.py, plus the q18/q19/q58/q59 templates
parameterized here), and compares with check_oracle.canonical — the
identical comparator the registry gate uses.

Two invariants per family, both fuzzed:
- parameter correctness: builder(params) ≡ oracle_sql(params) for any
  valid params, not just the registry defaults;
- knob neutrality where declared: range_join's ``bucket`` grain is an
  execution knob — any grain must yield identical rows (checked by
  running the builder at a random grain against grain-free SQL).

Usage:
  python tools/builder_fuzz.py [--seed 14] [--n 120] [--seeds 1,2,...]
                               [--sf-dir /root/testdata/sf0.001]
                               [--json FUZZ_BUILDERS.json]
                               [--repro I] [--family NAME]

Exit 0 iff every sampled invocation matches. A mismatch prints the
family + params repro handle; --repro re-runs one index.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tools.check_oracle import canonical  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

EVENT_TYPES = ["click", "signup", "purchase", "error", "view"]
DOC_LANGS = ["fr", "zh", "de", "en", "es"]


# --- parameterized SQL for the temporal family (the q18/q19/q58/q59
# oracle templates with their constants lifted to parameters) ----------


def _sessionize_sql(gap_minutes: int) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_us(ts)
                             - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                             >= {gap_us}
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ),
        numbered AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               round(sum(value), 6) AS sum_value
        FROM numbered
        GROUP BY user_id, session_id
    """


def _asof_sql(left_type: str, right_type: str) -> str:
    return f"""
        WITH u AS (
            SELECT event_id, user_id, ts, 1 AS side, NULL::BIGINT AS view_id
            FROM events WHERE event_type = '{left_type}'
            UNION ALL
            SELECT NULL, user_id, ts, 0, event_id
            FROM events WHERE event_type = '{right_type}'
        ),
        c AS (
            SELECT *, last_value(view_id IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, side, view_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_id
            FROM u
        )
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts, last_view_id
        FROM c WHERE side = 1
    """


def _range_join_sql(price_cut: int, lo_days: int, hi_days: int) -> str:
    return f"""
        SELECT o_orderkey, count(*) AS n_nearby,
               min(l_orderkey) AS min_lok, max(l_orderkey) AS max_lok
        FROM orders JOIN lineitem
          ON l_shipdate >= o_orderdate + ({lo_days}) * INTERVAL '1 day'
         AND l_shipdate <= o_orderdate + ({hi_days}) * INTERVAL '1 day'
        WHERE o_totalprice > {price_cut}
        GROUP BY o_orderkey
    """


def _rolling_sql(window_hours: int) -> str:
    span_us = window_hours * 3600 * 1_000_000
    return f"""
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               count(*) OVER w AS n_trailing,
               round(sum(value) OVER w, 6) AS sum_trailing
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN {span_us} PRECEDING AND CURRENT ROW)
    """


# --- the builder invocations ------------------------------------------


def _run_sessionize(spark, sf_dir, p):
    from labs_stream_processing_examples_scala_spark.operators import temporal as TP
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    s = TP.sessionize(ev, key="user_id", ts="ts", gap_minutes=p["gap_minutes"])
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def _run_asof(spark, sf_dir, p):
    from labs_stream_processing_examples_scala_spark.operators import temporal as TP
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == p["left_type"]).select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == p["right_type"]).select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    out = TP.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts", right_cols=["view_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("asof_view_id").alias("last_view_id"),
    )


def _run_range_join(spark, sf_dir, p):
    from labs_stream_processing_examples_scala_spark.operators import temporal as TP
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > p["price_cut"]
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    joined = TP.range_join(
        o.select("o_orderkey", "o_orderdate"),
        li,
        left_ts="o_orderdate",
        right_ts="l_shipdate",
        lower=F.expr(f"INTERVAL {p['lo_days']} DAY"),
        upper=F.expr(f"INTERVAL {p['hi_days']} DAY"),
        bucket=p["bucket"],  # execution knob: any grain, same rows
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_nearby"),
        F.min("l_orderkey").alias("min_lok"),
        F.max("l_orderkey").alias("max_lok"),
    )


def _simple(module: str, fn: str):
    def run(spark, sf_dir, p):
        import importlib

        mod = importlib.import_module(
            f"labs_stream_processing_examples_scala_spark.{module}"
        )
        return getattr(mod, fn)(spark, sf_dir, **p)

    return run


def _families():
    from labs_stream_processing_examples_scala_spark import oracles as O

    def pick_fracs(r):
        langs = r.sample(DOC_LANGS, k=r.randint(1, len(DOC_LANGS)))
        return {lang: r.randint(0, 100) for lang in langs}

    # name -> (weight, gen(rng) -> params, run(spark, sf_dir, p), sql(p))
    return {
        "sessionize": (
            8,
            lambda r: {"gap_minutes": r.randint(1, 240)},
            _run_sessionize,
            lambda p: _sessionize_sql(p["gap_minutes"]),
        ),
        "asof_join": (
            6,
            lambda r: dict(
                zip(("left_type", "right_type"), r.sample(EVENT_TYPES, k=2))
            ),
            _run_asof,
            lambda p: _asof_sql(p["left_type"], p["right_type"]),
        ),
        "range_join": (
            6,
            lambda r: {
                "price_cut": r.randrange(100_000, 480_000, 10_000),
                **(lambda lo: {"lo_days": lo, "hi_days": r.randint(lo, 3)})(
                    r.randint(-3, 2)
                ),
                "bucket": r.choice(["12 hours", "1 day", "2 days"]),
            },
            _run_range_join,
            lambda p: _range_join_sql(p["price_cut"], p["lo_days"], p["hi_days"]),
        ),
        "rolling_activity": (
            6,
            lambda r: {"window_hours": r.randint(1, 72)},
            _simple("operators.temporal", "rolling_user_activity"),
            lambda p: _rolling_sql(p["window_hours"]),
        ),
        "hash_split": (
            8,
            lambda r: (lambda t: {"train_pct": t, "valid_pct": r.randint(5, min(40, 95 - t))})(
                r.randint(5, 85)
            ),
            _simple("operators.sampling", "hash_split"),
            lambda p: O.sampling_hash_split(p["train_pct"], p["valid_pct"]),
        ),
        "stratified_sample": (
            8,
            lambda r: {"fractions": pick_fracs(r)},
            _simple("operators.sampling", "stratified_sample"),
            lambda p: O.sampling_stratified(p["fractions"]),
        ),
        "mixture_sample": (
            6,
            lambda r: {
                "temperature": round(r.uniform(0.3, 1.0), 2),
                "budget_pct": r.randint(10, 90),
            },
            _simple("operators.sampling", "mixture_sample"),
            lambda p: O.sampling_mixture(p["temperature"], p["budget_pct"]),
        ),
        "reservoir_sample": (
            8,
            lambda r: {"k": r.randint(1, 25)},
            _simple("operators.sampling", "reservoir_sample"),
            lambda p: O.sampling_reservoir(p["k"]),
        ),
        "pack_stats": (
            5,
            lambda r: {
                "budget": r.randrange(64, 2048, 32),
                "n_shards": r.choice([4, 8, 16, 32]),
            },
            _simple("operators.corpus", "pack_stats"),
            lambda p: O.pack_stats(p["budget"], p["n_shards"]),
        ),
        "chunk_documents": (
            5,
            lambda r: (lambda c: {"chunk": c, "stride": r.randint(max(1, c // 2), c)})(
                r.randint(16, 128)
            ),
            _simple("operators.corpus", "chunk_documents"),
            lambda p: O.corpus_chunks(p["chunk"], p["stride"]),
        ),
        "vocab_topk": (
            6,
            lambda r: {"k": r.randint(5, 300)},
            _simple("functions.text", "vocab_topk"),
            lambda p: O.text_vocab_topk(p["k"]),
        ),
        "tfidf_topk": (
            4,
            lambda r: {"top": r.randint(1, 8)},
            _simple("functions.text", "tfidf_top_terms"),
            lambda p: O.text_tfidf(p["top"]),
        ),
        "lsh_pairs": (
            4,
            lambda r: {"threshold": round(r.uniform(0.25, 0.9), 2)},
            _simple("operators.dedup", "lsh_candidate_pairs"),
            lambda p: O.dedup_lsh_pairs(p["threshold"]),
        ),
        "ngram_pairs": (
            4,
            lambda r: {"threshold": round(r.uniform(0.25, 0.9), 2)},
            _simple("operators.dedup", "ngram_jaccard_pairs"),
            lambda p: O.dedup_ngram_pairs(p["threshold"]),
        ),
        "simhash_pairs": (
            4,
            lambda r: {"max_hamming": r.randint(0, 3)},
            _simple("operators.dedup", "simhash_neardup_pairs"),
            lambda p: O.dedup_simhash_neardup_pairs(p["max_hamming"]),
        ),
        "cc_groups": (
            3,
            lambda r: {"threshold": r.choice([0.3, 0.4, 0.5, 0.6, 0.7])},
            _simple("operators.dedup", "lsh_dedup_groups"),
            lambda p: O.dedup_lsh_components(p["threshold"]),
        ),
        "cc_groups_twostar": (
            3,
            lambda r: {"threshold": r.choice([0.3, 0.4, 0.5, 0.6, 0.7])},
            _simple("operators.dedup", "lsh_dedup_groups_twostar"),
            lambda p: O.dedup_lsh_components(p["threshold"]),
        ),
        "span_stats": (
            3,
            lambda r: {"k": r.randint(4, 16)},
            _simple("operators.dedup", "dup_span_stats"),
            lambda p: O.dedup_span_stats(p["k"]),
        ),
        "span_removal": (
            3,
            lambda r: {"k": r.randint(4, 16)},
            _simple("operators.dedup", "remove_dup_spans"),
            lambda p: O.dedup_span_removal(p["k"]),
        ),
        "contamination": (
            3,
            lambda r: {"n_benchmark": r.randint(5, 60)},
            _simple("operators.corpus", "contamination_report"),
            lambda p: O.contamination_report(p["n_benchmark"]),
        ),
        "decontaminate": (
            3,
            lambda r: {"n_benchmark": r.randint(5, 60)},
            _simple("operators.corpus", "decontaminate"),
            lambda p: O.decontaminate(p["n_benchmark"]),
        ),
        "decontaminate_spans": (
            2,
            lambda r: {"n_benchmark": r.randint(5, 40), "k": r.randint(4, 16)},
            _simple("operators.corpus", "decontaminate_spans"),
            lambda p: O.decontaminate_spans(p["n_benchmark"], p["k"]),
        ),
        "brute_topk": (
            6,
            lambda r: {"query_id": r.randint(0, 499), "k": r.randint(1, 50)},
            _simple("operators.similarity", "brute_force_topk"),
            lambda p: O.sim_bruteforce_topk(p["query_id"], p["k"]),
        ),
        "cosine_pairs": (
            4,
            lambda r: {"threshold": round(r.uniform(0.05, 0.6), 2)},
            _simple("operators.similarity", "cosine_neardup_pairs"),
            lambda p: O.sim_neardup_pairs(p["threshold"]),
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=14)
    ap.add_argument("--seeds", default=None, help="comma list; overrides --seed")
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--json", default=None)
    ap.add_argument("--repro", type=int, default=None)
    ap.add_argument("--family", default=None, help="run only this family")
    args = ap.parse_args()

    import duckdb

    from labs_stream_processing_examples_scala_spark import get_spark
    from labs_stream_processing_examples_scala_spark.sources.batch import load_table

    t0 = time.time()
    spark = get_spark(app_name="builder-fuzz")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")
        load_table(spark, args.sf_dir, t)  # warm the loader path

    seeds = [int(s) for s in args.seeds.split(",")] if args.seeds else [args.seed]
    res = None
    for seed in seeds:
        r = run_builder_fuzz(spark, con, seed, args)
        if res is None:
            res = r
        else:
            res["passed"] += r["passed"]
            res["mismatches"].extend(r["mismatches"])
            res["errors"].extend(r["errors"])
            res["adjudicated"].extend(r["adjudicated"])
            for nm, c in r["families"].items():
                res["families"][nm] = res["families"].get(nm, 0) + c
    record = {
        "metric": "builder_fuzz_differential",
        "seed": seeds[0] if len(seeds) == 1 else seeds,
        "n": args.n * len(seeds),
        "sf_dir": args.sf_dir,
        "passed": res["passed"],
        "mismatches_n": len(res["mismatches"]),
        "errors_n": len(res["errors"]),
        "adjudicated_n": len(res["adjudicated"]),
        "adjudicated": res["adjudicated"][:20],
        "families": dict(sorted(res["families"].items())),
        "families_n": len(res["families"]),
        "mismatches": res["mismatches"][:20],
        "errors": res["errors"][:20],
        "elapsed_s": round(time.time() - t0, 1),
    }
    if args.json:
        Path(args.json).write_text(json.dumps(record, indent=1, default=str))
    for m in res["mismatches"] + res["errors"]:
        print(
            f"FAIL seed={m['seed']} #{m['index']} [{m['family']}] "
            f"params={m['params']}: {m['err']}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                k: record[k]
                for k in (
                    "seed", "n", "passed", "mismatches_n", "errors_n",
                    "adjudicated_n", "families_n", "elapsed_s",
                )
            }
        )
    )
    spark.stop()
    return 0 if not res["mismatches"] and not res["errors"] else 1


def run_builder_fuzz(spark, con, seed, args):
    """One seed's sweep: sample families by weight, draw params, run
    builder vs oracle SQL, canonical-compare."""
    fams = _families()
    names = sorted(fams)
    weights = [fams[nm][0] for nm in names]
    rng = random.Random(seed)
    results = {"passed": 0, "mismatches": [], "errors": [], "adjudicated": [], "families": {}}
    for i in range(args.n):
        nm = rng.choices(names, weights=weights)[0]
        _, gen, run, sql_of = fams[nm]
        params = gen(rng)
        if args.repro is not None and i != args.repro:
            continue
        if args.family is not None and nm != args.family:
            continue
        results["families"][nm] = results["families"].get(nm, 0) + 1
        rec = {"seed": seed, "index": i, "family": nm, "params": params}
        sql = sql_of(params)
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"duckdb error: {exc}"
            results["errors"].append(rec)
            continue
        try:
            sdf = run(spark, args.sf_dir, params).toPandas()
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"builder error: {exc}"
            results["errors"].append(rec)
            continue
        sn, scols, srows = canonical(sdf)
        dn, dcols, drows = canonical(ddf)
        if scols != dcols:
            rec["err"] = f"columns spark={scols} duckdb={dcols}"
        elif sn != dn:
            rec["err"] = f"rowcount spark={sn} duckdb={dn}"
        elif srows != drows:
            # the one standing numeric adjudication, same policy as the
            # SQL-text layer: an explicit ROUND in the oracle whose
            # argument lands on an exact decimal tie rounds HALF_UP in
            # Spark (BigDecimal on the shortest decimal form) but down
            # in DuckDB (float-multiply half-even) — e.g. pack_stats
            # budget=1920: 1923/1920 = 1.0015625 → 1.001563 vs
            # 1.001562 (r14 builder-fuzz find, pinned in
            # tests/test_round14_fixes.py). _round_tie_ok requires the
            # delta be EXACTLY one unit of a paren-balanced ROUND
            # precision from the SQL text on otherwise-identical rows.
            from tools.query_fuzz import _round_tie_ok

            if _round_tie_ok(sql, srows, drows):
                rec["adjudicated"] = "round-tie-convention"
                results["adjudicated"].append(rec)
            else:
                d = next(j for j, (a, b) in enumerate(zip(srows, drows)) if a != b)
                rec["err"] = (
                    f"first diff at sorted-row {d}: spark={srows[d]} duckdb={drows[d]}"
                )
        if "err" in rec:
            results["mismatches"].append(rec)
        elif "adjudicated" in rec:
            pass  # recorded above, not a pass and not a finding
        else:
            results["passed"] += 1
    return results


if __name__ == "__main__":
    sys.exit(main())
