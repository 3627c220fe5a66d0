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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
