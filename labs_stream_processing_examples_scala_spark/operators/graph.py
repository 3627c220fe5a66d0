"""Link-graph centrality — PageRank as a corpus-weighting operator.

Quality-weighting documents by the link graph is the original
web-scale data-curation move (the reason PageRank exists), and modern
LLM pipelines reuse it: rank pages by centrality, upweight/filter by
rank. The fixture corpus has no hyperlinks, so the graph here is the
near-duplicate similarity graph the dedup stage already produces
(operators/dedup.py lsh_candidate_pairs, symmetrized) — ranking THAT
graph surfaces the most-connected representative documents, the same
centrality-for-curation shape.

Power iteration, join-form (the textbook distributed plan):
  per iteration: ranks ⋈ out-degrees (contribution = r/outdeg) ⋈ edges
  → groupBy(dst) sum — ONE keyed shuffle per iteration on the edge
  list. Dangling mass is CLOSED-FORM (round-14 optimization): in a
  symmetrized graph a node has in-edges iff it has out-edges, so every
  dangling node's rank is the same scalar v_k = base + d·m_{k-1}/n and
  the dangling mass follows the driver-side recurrence
  m_k = n_dangling · v_k — two counts the build already pays, then a
  Python float per iteration. That removes the second reference each
  generation previously made to its predecessor (the dangling-mass
  aggregate), so the logical plan grows LINEARLY in n_iter instead of
  2^k and the whole loop unrolls into ONE plan and ONE action with no
  per-iteration lineage truncation (was: localCheckpoint every
  iteration = 6 materialization round-trips, 66 Spark jobs at sf0.1;
  measured 50 after — plans/r14/_stats_{before,after}.json, analyzed
  in OPTIMIZATION_r15.md).

A FIXED iteration count (default 5) keeps the operator exactly
SQL-expressible: the DuckDB oracle unrolls the same five update steps
as chained CTEs (oracles-style renderer below), so this iterative
float algorithm still carries an EXACT oracle — both engines compute
the identical IEEE expression tree, and the 6-decimal rounding absorbs
summation-order noise.

Scale: state is one rank per node (∝ corpus, one double); per-iteration
cost is one edge-list join + aggregation — both keyed on node ids, no
broadcast of anything SF-scaled, lineage truncated per generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.operators import dedup as DD
from labs_stream_processing_examples_scala_spark.sources.batch import load_table

N_ITER = 5
DAMPING = 0.85


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The symmetrized near-dup graph: (src, dst) both directions."""
    pairs = DD.lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))


def dangling_mass_schedule(
    n: int, n_dangling: int, n_iter: int, damping: float
) -> list[float]:
    """The per-iteration dangling mass, closed form.

    In the symmetrized graph a node has in-edges iff it has out-edges,
    so a dangling node never receives contributions: its rank after
    update k is exactly v_k = (1-d)/n + d·(0 + m_{k-1}/n), the same
    scalar for every dangling node, giving
    m_k = n_dangling · v_k  (m_0 = n_dangling · (1/n)).

    Every operation is a plain IEEE double op, so DuckDB evaluating the
    same recurrence (pagerank_oracle_sql) produces bit-identical
    scalars; versus the pre-round-14 distributed sum the value differs
    only by summation-order ulps (~1e-16), far inside the 6-decimal
    output rounding — equivalence proven by the exact oracle gate at
    sf0.001/sf0.01/sf0.1 and an old-vs-new exceptAll (see
    tests/test_round14_opt.py and OPTIMIZATION_r15.md)."""
    d = float(damping)
    base = (1.0 - d) / n
    ms = [n_dangling * (1.0 / n)]
    for _ in range(n_iter):
        ms.append(n_dangling * (base + d * (ms[-1] / n)))
    return ms


def pagerank(
    spark: SparkSession,
    sf_dir: str,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
    checkpoint_every: int = N_ITER,
) -> DataFrame:
    """x_graph_pagerank — (doc_id, rank, n_neighbors) after ``n_iter``
    power iterations over the similarity graph.

    ``checkpoint_every`` sets the lineage-truncation cadence. Since the
    round-14 closed-form dangling mass, each update references the
    previous generation ONCE, so the unrolled plan grows linearly and
    the default cadence is n_iter (no intermediate truncation: one
    action runs the whole loop). The knob remains for very large
    n_iter, where truncating every k iterations bounds plan size at the
    cost of one materialization per checkpoint."""
    if checkpoint_every < 1:
        # 0 would ZeroDivisionError mid-iteration and a negative value
        # would silently disable every intermediate truncation — so
        # fail fast with the contract instead (self-review, round 11)
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    nodes = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = _edges(spark, sf_dir).persist()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    n_nondangling = outdeg.count()  # eager: consumed every iteration (and
    # fixes the lazy-persist multi-subtree race, see frequency.heavy_hitters)

    n = nodes.count()  # fixed-size driver scalar (one long)
    d = float(damping)
    base = (1.0 - d) / n
    mass = dangling_mass_schedule(n, n - n_nondangling, n_iter, damping)

    # The dangling mass is a literal per iteration (closed form above),
    # so each generation references its predecessor exactly once via
    # the contribution join: the logical plan grows LINEARLY in n_iter
    # and the loop unrolls into one plan/one action. (Pre-round-14 the
    # mass was a distributed aggregate — a SECOND reference per
    # generation, 2^k tree growth, and a localCheckpoint every
    # iteration to contain it: 6 materialization round-trips per call.)
    ranks = nodes.select("doc_id", F.lit(1.0 / n).alias("rank"))
    for it in range(n_iter):
        contrib = (
            ranks.join(outdeg, ranks.doc_id == outdeg.src)
            .select("src", (F.col("rank") / F.col("outdeg")).alias("c"))
            .join(edges, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(contrib, nodes.doc_id == contrib.dst, "left").select(
            "doc_id",
            (
                F.lit(base)
                + F.lit(d)
                * (
                    F.coalesce(F.col("in_sum"), F.lit(0.0))
                    + F.lit(mass[it]) / F.lit(float(n))
                )
            ).alias("rank"),
        )
        if it != n_iter - 1 and (it + 1) % checkpoint_every == 0:
            # eager: materialize + truncate lineage (opt-in cadence)
            ranks = ranks.localCheckpoint()
    out = (
        ranks.join(outdeg, ranks.doc_id == outdeg.src, "left")
        .select(
            "doc_id",
            F.round("rank", 6).alias("rank"),
            F.coalesce(F.col("outdeg"), F.lit(0)).cast("long").alias("n_neighbors"),
        )
        # eager checkpoint severs the result's lineage from the two
        # persisted frames so they can be RELEASED here: pagerank was
        # the only operator persisting per-call frames it never
        # unpersisted, pinning executor storage across repeated calls
        # (round-12 self-review); the extra materialization is one
        # n-row frame
        .localCheckpoint()
    )
    edges.unpersist()
    outdeg.unpersist()
    return out


def pagerank_oracle_sql(n_iter: int = N_ITER, damping: float = DAMPING) -> str:
    """DuckDB oracle: the SAME ``n_iter`` update steps unrolled as
    chained CTEs over the same pair set (O.dedup_lsh_pairs), with the
    dangling mass as the same closed-form scalar recurrence the engine
    uses (dangling_mass_schedule) — every m_k CTE is the identical IEEE
    expression over (n, nd), so both engines carry bit-equal mass."""
    from labs_stream_processing_examples_scala_spark import oracles as O

    d = float(damping)
    # AS MATERIALIZED everywhere: DuckDB inlines plain CTEs, and each
    # r_k is referenced by the next generation's contribution join —
    # left inlined, the pair computation re-expands n_iter-fold
    ctes = [
        f"pairs AS MATERIALIZED ({O.dedup_lsh_pairs()})",
        "edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs"
        " UNION ALL SELECT doc_b, doc_a FROM pairs)",
        "outdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "n AS MATERIALIZED (SELECT count(*) AS n FROM documents)",
        "nd AS MATERIALIZED (SELECT n.n - (SELECT count(*) FROM outdeg) AS nd FROM n)",
        "m0 AS MATERIALIZED (SELECT nd.nd * (1.0 / n.n) AS m FROM nd, n)",
        "r0 AS MATERIALIZED (SELECT doc_id, 1.0 / n AS rank FROM documents, n)",
    ]
    for k in range(n_iter):
        prev, cur = f"r{k}", f"r{k + 1}"
        ctes.append(
            f"{cur} AS MATERIALIZED ("
            f"SELECT d.doc_id, (1.0 - {d}) / n.n + {d} * (coalesce(s.in_sum, 0.0) + m{k}.m / n.n) AS rank "
            f"FROM documents d CROSS JOIN n CROSS JOIN m{k} "
            f"LEFT JOIN ("
            f"  SELECT e.dst, sum(p.rank / o.outdeg) AS in_sum"
            f"  FROM {prev} p JOIN outdeg o ON p.doc_id = o.src"
            f"  JOIN edges e ON e.src = o.src"
            f"  GROUP BY e.dst"
            f") s ON s.dst = d.doc_id)"
        )
        if k + 1 < n_iter:
            ctes.append(
                f"m{k + 1} AS MATERIALIZED ("
                f"SELECT nd.nd * ((1.0 - {d}) / n.n + {d} * (m{k}.m / n.n)) AS m "
                f"FROM nd, n, m{k})"
            )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT r.doc_id, round(r.rank, 6) AS rank,
               CAST(coalesce(o.outdeg, 0) AS BIGINT) AS n_neighbors
        FROM r{n_iter} r LEFT JOIN outdeg o ON r.doc_id = o.src
    """
    )
