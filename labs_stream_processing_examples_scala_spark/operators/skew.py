"""Skew-handling utilities — the 100 TB posture for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) is the first line of defense; these are the explicit forms
for when the skew is known upfront:

- :func:`salted_agg` — two-phase aggregation: partial by (key, salt),
  final by key. A hot group key stops bottlenecking one reducer; the
  map-side combine still happens per salt bucket.
- :func:`salted_join` — replicate the *small* side across the salt
  domain and salt the large side deterministically, so one hot join key
  spreads over ``n_salts`` reducers.

Salts are derived with ``pmod(hash(...), n)`` over non-key columns —
deterministic (re-runs produce identical partitioning, replay-safe under
the streaming at-least-once contract) yet spreading, unlike rand().

The ``events_by_type_salted`` / ``events_by_segment_salted`` wrappers
run the pattern over the fixture tables; their oracles are the *plain*
(unsalted) SQL forms — salting must be invisible in the result, which
is exactly the property worth checking cross-engine.

Reference parity: the reference (Services.scala:26-121) has no
relational layer; skew handling belongs to the engine surface SURVEY
§2.5 adds for the 100 TB posture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.sources.batch import load_table

SUPPORTED_AGGS = ("sum", "count", "min", "max")


def _salt_col(df: DataFrame, keys: list[str], n_salts: int) -> Column:
    non_keys = [c for c in df.columns if c not in keys]
    # hash of the non-key payload spreads a hot key's rows; fall back to
    # the keys themselves if there is nothing else (degenerate but valid)
    basis = non_keys or list(keys)
    return F.pmod(F.hash(*basis), F.lit(n_salts))


def salted_agg(
    df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]], n_salts: int = 16
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (fn, input column), fn ∈ sum/count/
    min/max (the decomposable ones; avg = sum+count at the call site).
    Phase 1 shuffles on (keys, salt): a key with 10^9 rows lands on
    n_salts reducers instead of one. Phase 2 combines n_salts rows/key.
    """
    for name, (fn, _) in aggs.items():
        if fn not in SUPPORTED_AGGS:
            raise ValueError(f"{name}: {fn} is not decomposable; use sum/count composition")
    salted = df.withColumn("_salt", _salt_col(df, keys, n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    recombine = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*keys).agg(
        *[
            recombine[fn](f"_p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    large: DataFrame, small: DataFrame, on: list[str], n_salts: int = 16, how: str = "inner"
) -> DataFrame:
    """Skew-safe equi-join: salt the large side, replicate the small side
    over the full salt domain, join on (keys, salt). Output ≡ plain
    ``large.join(small, on, how)`` for inner/left joins."""
    l = large.withColumn("_salt", _salt_col(large, on, n_salts))
    r = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return l.join(r, [*on, "_salt"], how).drop("_salt")


# fixture-level query forms (oracle-checked) -----------------------------


def events_by_type_salted(spark: SparkSession, sf_dir: str, n_salts: int = 8) -> DataFrame:
    """Per-event-type totals via the two-phase salted aggregation.

    event_type has only 5 values — exactly the hot-key cardinality
    profile (billions of rows, a handful of groups) where a single
    final reducer per key is the bottleneck without phase 1.
    """
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "event_id"),
            "total_value": ("sum", "value"),
            "max_value": ("max", "value"),
        },
        n_salts=n_salts,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        "max_value",
    ).orderBy("event_type")


def events_by_type_salted_oracle() -> str:
    """Plain GROUP BY — salting must be invisible in the result."""
    return """
        SELECT event_type,
               count(event_id) AS n_events,
               round(sum(value), 4) AS total_value,
               max(value) AS max_value
        FROM events GROUP BY event_type ORDER BY event_type
    """


def events_by_segment_salted(spark: SparkSession, sf_dir: str, n_salts: int = 8) -> DataFrame:
    """events ⋈ customer per market segment via the salted join.

    The dim side (customer) is replicated ``n_salts`` ways — the price
    of admission, paid on the SMALL side only — and each fact row gets
    a deterministic salt, so a hot user's events spread over
    ``n_salts`` reducers. ``hint("merge")`` forces the shuffle join the
    pattern exists for (a broadcastable dim wouldn't need salting).
    """
    ev = load_table(spark, sf_dir, "events")
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
        .hint("merge")
    )
    joined = salted_join(ev, dim, ["user_id"], n_salts=n_salts)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


def events_by_segment_salted_oracle() -> str:
    """Plain join + GROUP BY — the salted join must match exactly."""
    return """
        SELECT c_mktsegment,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """
