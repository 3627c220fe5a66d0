"""Third-engine and invariant tests for the round-5 additions:
BPE training/segmentation, SCD2 MERGE, Misra-Gries heavy hitters, and
per-group reservoir sampling.

(The exact-oracle registry entries — q65_merge_scd2,
x_sample_reservoir, x_freq_heavy_hitters — are additionally
hash-checked against DuckDB on every pytest run by
test_registry_oracle; these tests cover what the SQL oracle can't:
the iterative BPE loop, the MERGE insert branch on keys absent from
the fixture, and partitioning-invariance of the sketch pass.)
"""

from __future__ import annotations

from collections import Counter

import duckdb
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.operators import bpe as BP
from labs_stream_processing_examples_scala_spark.operators import frequency as FQ
from labs_stream_processing_examples_scala_spark.operators import merge as MG
from labs_stream_processing_examples_scala_spark.operators import sampling as SMP
from tests.conftest import SF_SMOKE

N_MERGES = 8


# --- pure-Python BPE reference (the third engine) --------------------


def _merge_word(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _python_bpe(n_merges: int):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    wf: Counter = Counter()
    for _, t in docs:
        for w in t.split(" "):
            if w:
                wf[w] += 1
    vocab = {w: list(w) for w in wf}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, cnt))
        vocab = {w: _merge_word(s, left, right) for w, s in vocab.items()}
    return docs, merges


def test_bpe_train_matches_python_reference(spark):
    """The Spark training loop reproduces the pure-Python trainer's
    merge list EXACTLY (same pairs, same counts, same tie-breaks)."""
    _, expected = _python_bpe(N_MERGES)
    got = BP.bpe_train_merges(spark, SF_SMOKE, N_MERGES)
    assert got == expected


def test_bpe_segment_matches_python_reference(spark):
    """Applying the learned merges to every document yields the same
    token count and head tokens as the Python reference."""
    docs, merges = _python_bpe(N_MERGES)
    seg = {
        r["doc_id"]: (r["n_bpe_tokens"], r["head_tokens"])
        for r in BP.bpe_segment(spark, SF_SMOKE, N_MERGES).collect()
    }
    for doc_id, t in docs:
        toks = [w for w in t.split(" ") if w]
        syms = [list(w) for w in toks]
        for _, left, right, _ in merges:
            syms = [_merge_word(s, left, right) for s in syms]
        flat = [x for s in syms for x in s]
        assert seg[doc_id] == (len(flat), " ".join(flat[:8])), doc_id


def test_bpe_merges_reduce_token_count(spark):
    """Each merge can only shrink segmentations: n_bpe_tokens after
    training ≤ raw char count, and ≥ whitespace token count."""
    seg = BP.bpe_segment(spark, SF_SMOKE, N_MERGES)
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("n_ws"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_chars_nospace"),
    )
    bad = (
        seg.join(d, "doc_id")
        .filter(
            (F.col("n_bpe_tokens") > F.col("n_chars_nospace"))
            | (F.col("n_bpe_tokens") < F.col("n_ws"))
        )
        .count()
    )
    assert bad == 0


# --- SCD2 MERGE: the insert branch the fixture can't reach -----------


def test_scd2_merge_insert_branch(spark):
    """Update keys absent from the target become INSERT rows (null
    carried attributes, open validity, current)."""
    target = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "k long, name string, bal double"
    )
    updates = spark.createDataFrame(
        [(2, 25.0), (99, 99.0)], "u_key long, new_bal double"
    )
    out = MG.scd2_merge(
        target=target,
        updates=updates,
        key="k",
        update_key="u_key",
        versioned_col="bal",
        new_value_col="new_bal",
        carried_cols=["name"],
    )
    rows = {(r["k"], r["bal"], r["is_current"]): r for r in out.collect()}
    # untouched key 1: one current version
    assert rows[(1, 10.0, True)]["valid_to"] is None
    # matched key 2: closed old + open new
    assert rows[(2, 20.0, False)]["valid_to"] == MG.CHANGE_DATE
    assert rows[(2, 25.0, True)]["valid_from"] == MG.CHANGE_DATE
    # inserted key 99: open version with null carried attribute
    ins = rows[(99, 99.0, True)]
    assert ins["name"] is None and ins["valid_from"] == MG.CHANGE_DATE
    assert len(rows) == 4


def test_scd2_versions_partition_timeline(spark):
    """Every key has exactly one current version, and closed versions
    chain into the current one (valid_to == next valid_from)."""
    out = MG.merge_scd2(spark, SF_SMOKE)
    per_key = out.groupBy("c_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count("*").alias("n_versions"),
    )
    assert per_key.filter(F.col("n_current") != 1).count() == 0
    closed = out.filter(~F.col("is_current"))
    assert closed.filter(F.col("valid_to").isNull()).count() == 0


# --- Misra-Gries heavy hitters ---------------------------------------


def test_heavy_hitters_partitioning_invariant(spark):
    """The two-pass answer is exact, so it cannot depend on how the
    Misra-Gries pass was partitioned. Run the candidate pass over an
    adversarial many-partition layout and compare to the plain run."""
    base = {(r["token"], r["n"]) for r in FQ.heavy_hitters(spark, SF_SMOKE).collect()}

    d = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .repartition(16)
        .select("text")
    )
    summaries = d.mapInArrow(
        FQ._misra_gries_partition, schema="token string, cnt long, kind string"
    ).persist()
    candidates = summaries.filter(F.col("kind") == "tok").select("token").distinct()
    totals = summaries.filter(F.col("kind") == "total").agg(F.sum("cnt").alias("n_total"))
    tokens = d.select(
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("token")
    )
    thr = F.greatest(
        F.lit(FQ.HH_FLOOR).cast("long"),
        F.ceil(F.lit(FQ.HH_FRAC) * F.col("n_total")).cast("long"),
    )
    repartitioned = {
        (r["token"], r["n"])
        for r in tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("n") >= thr)
        .select("token", "n")
        .collect()
    }
    summaries.unpersist()
    assert repartitioned == base and base, "heavy hitters changed under repartitioning"


def test_misra_gries_summary_is_bounded_and_superset(spark):
    """Candidate summaries respect the K_COUNTERS bound per partition,
    and contain every token whose global count exceeds N/K."""
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("text")
    summaries = d.mapInArrow(
        FQ._misra_gries_partition, schema="token string, cnt long, kind string"
    ).collect()
    toks = [r for r in summaries if r["kind"] == "tok"]
    assert 0 < len(toks) <= FQ.K_COUNTERS * d.rdd.getNumPartitions()

    exact = Counter()
    for (t,) in duckdb.sql(
        f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall():
        for w in t.split(" "):
            if w:
                exact[w] += 1
    n_total = sum(exact.values())
    candidates = {r["token"] for r in toks}
    must_have = {t for t, c in exact.items() if c > n_total / FQ.K_COUNTERS}
    assert must_have <= candidates


# --- reservoir sampling ----------------------------------------------


def test_reservoir_sample_invariants(spark):
    """k rows per group, deterministic across runs, and membership is
    subset-stable: dropping other rows never changes which survivors
    rank first (hash rank is a pure row function)."""
    out1 = SMP.reservoir_sample(spark, SF_SMOKE).collect()
    out2 = SMP.reservoir_sample(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))

    by_lang = Counter(r["lang"] for r in out1)
    langs = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in langs.items():
        assert by_lang[lang] == min(SMP.RESERVOIR_K, n)

    # subset stability: restrict the corpus to half the docs — every
    # surviving sampled doc that remains must still be sampled
    kept = {r["doc_id"] for r in out1}
    half = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") % 2 == 0
    )
    half.createOrReplaceTempView("_rsv_half")
    import labs_stream_processing_examples_scala_spark.operators.sampling as S

    h = S.H.rolling_hash(
        F.concat(F.lit(SMP.RESERVOIR_SALT), F.col("doc_id").cast("string"))
    )
    from pyspark.sql import Window

    ranked = half.select("doc_id", "lang", h.alias("rhash")).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.col("rhash").asc(), F.col("doc_id").asc())
        ),
    )
    half_sample = {
        r["doc_id"] for r in ranked.filter(F.col("rn") <= SMP.RESERVOIR_K).collect()
    }
    surviving = {d for d in kept if d % 2 == 0}
    assert surviving <= half_sample


def test_bpe_distributed_loop_matches_driver_loop(spark):
    """The big-vocab distributed training path must produce the exact
    merge list of the driver-side fast path (same tie-breaks) — the
    two are interchangeable implementations of one contract."""
    wf = BP.word_freqs(spark, SF_SMOKE)
    driver = BP._train_driver_side(
        [(r["w"], int(r["wc"])) for r in wf.collect()], 6
    )
    distributed = BP._train_distributed(wf, 6)
    assert distributed == driver and len(driver) == 6


# --- PageRank ---------------------------------------------------------


def test_pagerank_matches_numpy_power_iteration(spark):
    """Third engine: dense numpy power iteration over the same
    symmetrized near-dup graph reproduces every rank to 1e-9."""
    import numpy as np

    from labs_stream_processing_examples_scala_spark.operators import dedup as DD
    from labs_stream_processing_examples_scala_spark.operators import graph as GR

    got = {r["doc_id"]: (r["rank"], r["n_neighbors"]) for r in
           GR.pagerank(spark, SF_SMOKE).collect()}

    pairs = [(r["doc_a"], r["doc_b"]) for r in
             DD.lsh_candidate_pairs(spark, SF_SMOKE).collect()]
    nodes = sorted(got)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(idx[a], []).append(idx[b])
        adj.setdefault(idx[b], []).append(idx[a])
    d = GR.DAMPING
    r = np.full(n, 1.0 / n)
    for _ in range(GR.N_ITER):
        m = sum(r[i] for i in range(n) if i not in adj)
        nxt = np.full(n, (1.0 - d) / n + d * m / n)
        for src, dsts in adj.items():
            for dst in dsts:
                nxt[dst] += d * r[src] / len(dsts)
        r = nxt
    for node, i in idx.items():
        rank, deg = got[node]
        assert abs(rank - round(float(r[i]), 6)) <= 1e-9, node
        assert deg == len(adj.get(i, []))
    # ranks are a distribution
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-3


def test_merge_with_delete_exercises_all_three_branches(spark):
    """The q66 cutoffs must keep all MERGE arms live on the fixture —
    a degenerate all-update dataset would silently stop testing the
    delete/keep branches (the bug this pin caught when the cutoffs
    were first chosen)."""
    ops = {
        r["op"]: r["n"]
        for r in MG.merge_with_delete(spark, SF_SMOKE)
        .groupBy("op")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(ops) == {"keep", "update", "delete"}, ops
    assert all(v > 0 for v in ops.values())
