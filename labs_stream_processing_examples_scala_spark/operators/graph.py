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
  list; dangling mass (isolated docs — a symmetric graph has in-edges
  iff out-edges) redistributes uniformly via a one-row broadcast
  frame, never a collected scalar. For a fixed small n_iter the whole
  loop unrolls into ONE plan and ONE action — the only driver traffic
  is N, once.

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


def pagerank(
    spark: SparkSession,
    sf_dir: str,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
    checkpoint_every: int = 1,
) -> DataFrame:
    """x_graph_pagerank — (doc_id, rank, n_neighbors) after ``n_iter``
    power iterations over the similarity graph.

    ``checkpoint_every`` sets the lineage-truncation cadence: each
    update references the previous generation twice, so k generations
    without a checkpoint grow the logical plan ~2^k-fold while saving
    (k-1)/k of the materialization jobs — the round-10 verdict's A/B
    knob (task #7). The default (every iteration) is the measured
    winner at every SF; see BASELINE.md round-11 for the sf10 A/B."""
    if checkpoint_every < 1:
        # 0 would ZeroDivisionError mid-iteration and a negative value
        # would silently disable every intermediate truncation — the
        # exact 2^k plan blow-up the knob exists to bound — so fail
        # fast with the contract instead (self-review finding, round 11)
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    nodes = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = _edges(spark, sf_dir).persist()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    outdeg.count()  # eager: consumed every iteration (and fixes the
    # lazy-persist multi-subtree race, see frequency.heavy_hitters)

    n = nodes.count()  # fixed-size driver scalar (one long)
    d = float(damping)
    base = (1.0 - d) / n

    # Each update references the previous generation TWICE (dangling
    # mass + contributions), so every generation's LOGICAL plan must be
    # truncated, not merely cached: persist() leaves the logical tree
    # in place and analysis re-walks it — doubled per reference, the
    # tree grows 2^k and iteration wall went 1.7 → 107 s by round 5.
    # localCheckpoint (eager) replaces the plan with a leaf, exactly
    # the connected-components loop's fix (operators/dedup.py); the
    # same blowup is what the oracle's AS MATERIALIZED guards against
    # in DuckDB. The dangling mass rides the plan as a one-row
    # broadcast frame (no per-round collect).
    ranks = nodes.select("doc_id", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for it in range(n_iter):
        with_deg = ranks.join(outdeg, ranks.doc_id == outdeg.src, "left")
        dangling = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")
        )
        contrib = (
            with_deg.filter(F.col("outdeg").isNotNull())
            .select("src", (F.col("rank") / F.col("outdeg")).alias("c"))
            .join(edges, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, nodes.doc_id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))  # one row
            .select(
                "doc_id",
                (
                    F.lit(base)
                    + F.lit(d)
                    * (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.col("m") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == n_iter - 1:
            # eager: materialize + truncate lineage
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
    chained CTEs over the same pair set (O.dedup_lsh_pairs)."""
    from labs_stream_processing_examples_scala_spark import oracles as O

    d = float(damping)
    # AS MATERIALIZED everywhere: DuckDB inlines plain CTEs, and the
    # unrolled recursion references r_k twice (m_k and r_{k+1}) — left
    # inlined, the pair computation re-expands 2^n_iter times
    ctes = [
        f"pairs AS MATERIALIZED ({O.dedup_lsh_pairs()})",
        "edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs"
        " UNION ALL SELECT doc_b, doc_a FROM pairs)",
        "outdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "n AS MATERIALIZED (SELECT count(*) AS n FROM documents)",
        "r0 AS MATERIALIZED (SELECT doc_id, 1.0 / n AS rank FROM documents, n)",
    ]
    for k in range(n_iter):
        prev, cur = f"r{k}", f"r{k + 1}"
        ctes.append(
            f"m{k} AS MATERIALIZED (SELECT coalesce(sum(rank), 0.0) AS m FROM {prev} "
            f"WHERE doc_id NOT IN (SELECT src FROM outdeg))"
        )
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
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT r.doc_id, round(r.rank, 6) AS rank,
               CAST(coalesce(o.outdeg, 0) AS BIGINT) AS n_neighbors
        FROM r{n_iter} r LEFT JOIN outdeg o ON r.doc_id = o.src
    """
    )
