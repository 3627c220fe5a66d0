"""Heavy hitters over token streams — bounded-memory frequent items.

Vocabulary-style exact counting (functions/text.py vocab_topk) shuffles
every distinct token; at 100 TB the token shuffle IS the job. The
classic fix is a two-pass frequent-items scheme (Misra-Gries 1982,
merged per Agarwal et al., "Mergeable Summaries", PODS 2012):

  pass 1 (candidates): each input partition folds its tokens through a
      Misra-Gries summary of K_COUNTERS counters — O(K) memory, one
      sequential scan, NO shuffle. Guarantee: a token whose partition
      count exceeds n_p/K survives in that partition's summary, so any
      token with GLOBAL count > N/K survives in ≥1 summary (if it fell
      below n_p/K in every partition, summing gives global ≤ N/K).
      The union of summaries is therefore a guaranteed superset of the
      true heavy hitters for any threshold > N/K, with size ≤ K ×
      n_partitions regardless of vocabulary size.
  pass 2 (exact verify): explode tokens again (narrow), semi-join the
      broadcast candidate set (narrow filter), and exact-count ONLY the
      survivors — the shuffle carries candidates, not the vocabulary.

Because pass 2 is exact and pass 1 is a provable superset, the final
answer equals plain "GROUP BY token HAVING count >= threshold" — so
this approximate-technique operator still carries an EXACT DuckDB
oracle (threshold = max(HH_FLOOR, ceil(HH_FRAC × N)) with HH_FRAC
chosen so threshold > N/K_COUNTERS always holds: N/K ≤ N/8192 <
0.0005·N for any N).

The Misra-Gries fold runs in Python (mapInPandas, Arrow-batched,
accumulating across the partition's batches) — justified because the
summary is inherently sequential per partition and its output is K
rows, not data; tokens never cross the Python boundary row-at-a-time
in the exact pass, which stays pure Catalyst.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.sources.batch import load_table

K_COUNTERS = 8192  # per-partition Misra-Gries capacity
HH_FRAC = 0.0005   # threshold as a fraction of total tokens…
HH_FLOOR = 20      # …but never below this absolute count

# superset guarantee: threshold ≥ HH_FRAC·N > N/K_COUNTERS
assert HH_FRAC > 1.0 / K_COUNTERS


def _misra_gries_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fold one partition's documents through a Misra-Gries summary.

    Emits K candidate rows (kind='tok') plus one kind='total' row
    carrying the partition's exact token count, so the caller can
    compute N without a second scan. Amortized O(1) per token: each
    decrement event removes ≥K token-counts and happens ≤ N/K times.
    """
    counters: dict[str, int] = {}
    n_tokens = 0
    for pdf in batches:
        for text in pdf["text"]:
            for tok in text.split(" "):
                if not tok:
                    continue
                n_tokens += 1
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < K_COUNTERS:
                    counters[tok] = 1
                else:
                    dead = []
                    for t in counters:
                        counters[t] -= 1
                        if counters[t] == 0:
                            dead.append(t)
                    for t in dead:
                        del counters[t]
    yield pd.DataFrame(
        {
            "token": list(counters.keys()) + [""],
            "cnt": list(counters.values()) + [n_tokens],
            "kind": ["tok"] * len(counters) + ["total"],
        }
    )


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x_freq_heavy_hitters — tokens with exact count ≥ the threshold,
    found via the two-pass Misra-Gries scheme above.

    Output: token, n (exact count), threshold used. Exact oracle:
    GROUP BY token HAVING count ≥ greatest(HH_FLOOR, ceil(HH_FRAC·N)).
    """
    d = load_table(spark, sf_dir, "documents").select("text")

    summaries = d.mapInPandas(
        _misra_gries_partition, schema="token string, cnt long, kind string"
    )
    # Both frames are tiny (≤ K×partitions rows); persist + an eager
    # count so the two consumers below (and the threshold subquery)
    # share ONE materialization — lazily, both subtrees of the final
    # job race to compute the cache and the Python fold runs twice
    # (measured 2× at sf1).
    summaries = summaries.persist()
    summaries.count()
    candidates = summaries.filter(F.col("kind") == "tok").select("token").distinct()
    totals = summaries.filter(F.col("kind") == "total").agg(
        F.sum("cnt").alias("n_total")
    )

    tokens = d.select(
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("token")
    )
    exact = (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    thr = F.greatest(
        F.lit(HH_FLOOR).cast("long"),
        F.ceil(F.lit(HH_FRAC) * F.col("n_total")).cast("long"),
    )
    return (
        exact.crossJoin(F.broadcast(totals))
        .withColumn("threshold", thr)
        .filter(F.col("n") >= F.col("threshold"))
        .select("token", "n", "threshold")
    )


def heavy_hitters_oracle_sql() -> str:
    """Exact DuckDB equivalent (valid because pass 2 is exact and pass 1
    is a guaranteed superset — module docstring)."""
    toks = "list_filter(string_split(text, ' '), w -> w <> '')"
    return f"""
        WITH tok AS (SELECT unnest({toks}) AS token FROM documents),
        tot AS (SELECT count(*) AS n_total FROM tok),
        thr AS (
            SELECT CAST(greatest({HH_FLOOR}, ceil({HH_FRAC} * n_total)) AS BIGINT)
                   AS threshold
            FROM tot
        )
        SELECT token, count(*) AS n, threshold
        FROM tok, thr
        GROUP BY token, threshold
        HAVING count(*) >= threshold
    """
