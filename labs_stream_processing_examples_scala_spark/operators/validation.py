"""Data-quality gates — constraint validation and distribution drift.

Every production pipeline fronts its tables with mechanical quality
checks (the Deequ / Great Expectations shape) and watches feature
distributions for drift between snapshots. Both reduce to single-pass
aggregations — which is exactly how they must run at 100 TB: ONE scan
computing every metric as a conditional aggregate (count_if and
friends), never one pass per check.

- :func:`validate_orders` — a constraint report over ``orders``: one
  row per declared check with measured violation counts/rates. All
  checks fold into a single map-side-combined aggregation; the row-per
  -check shape comes from unpivoting the one aggregate row (narrow).
- :func:`value_drift` — Population Stability Index of the ``value``
  distribution between two deterministic halves of ``events`` over
  fixed buckets: two filtered conditional aggregations in one scan,
  PSI = Σ (p−q)·ln(p/q) over the shared buckets (Laplace-smoothed so
  empty buckets stay finite).

Both carry EXACT DuckDB oracles: every metric is integer counting or
the identical IEEE double expression, rounded to the fixture's 6
decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.sources.batch import load_table

# (check name, SQL boolean expression over orders) — shared verbatim
# with the oracle renderer so both engines evaluate the same predicate
ORDER_CHECKS: tuple[tuple[str, str], ...] = (
    ("orderkey_not_null", "o_orderkey IS NOT NULL"),
    ("custkey_not_null", "o_custkey IS NOT NULL"),
    ("status_in_domain", "o_orderstatus IN ('F', 'O', 'P')"),
    ("price_positive", "o_totalprice > 0"),
    ("price_below_cap", "o_totalprice < 600000"),
    ("date_in_range", "o_orderdate >= TIMESTAMP '1992-01-01'"
                      " AND o_orderdate < TIMESTAMP '1999-01-01'"),
    ("priority_format", "o_orderpriority LIKE '_-%'"),
)


def validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x_validate_orders — (check, n_rows, n_violations, violation_rate)
    per declared constraint, plus a key-uniqueness check, all from ONE
    pass over the table (single aggregate; unpivot is narrow)."""
    o = load_table(spark, sf_dir, "orders")
    # NULL-hostile counting: a NULL column value makes the check
    # predicate NULL, and count_if(~NULL) silently counted the row as
    # PASSING every domain/range check — a quality gate waving through
    # rows with missing prices/dates (round-12 self-review). coalesce
    # pins NULL → violation; the oracle applies the identical wrap.
    aggs = [F.count("*").alias("n_rows")] + [
        F.count_if(~F.coalesce(F.expr(cond), F.lit(False))).alias(name)
        for name, cond in ORDER_CHECKS
    ]
    # uniqueness folds into the same pass: violations = rows − distinct
    aggs.append(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("orderkey_unique")
    )
    one = o.agg(*aggs)
    names = [name for name, _ in ORDER_CHECKS] + ["orderkey_unique"]
    report = one.unpivot(
        "n_rows", names, "check", "n_violations"
    )
    return report.select(
        "check",
        "n_rows",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias("violation_rate"),
    )


def validate_orders_oracle_sql() -> str:
    cols = ",\n".join(
        f"count(*) FILTER (NOT coalesce(({cond}), FALSE)) AS {name}"
        for name, cond in ORDER_CHECKS
    )
    names = [name for name, _ in ORDER_CHECKS] + ["orderkey_unique"]
    arms = " UNION ALL ".join(
        f'SELECT \'{name}\' AS "check", n_rows, {name} AS n_violations FROM one'
        for name in names
    )
    return f"""
        WITH one AS (
            SELECT count(*) AS n_rows,
                   {cols},
                   count(*) - count(DISTINCT o_orderkey) AS orderkey_unique
            FROM orders
        )
        SELECT "check", n_rows, n_violations,
               round(CAST(n_violations AS DOUBLE) / n_rows, 6) AS violation_rate
        FROM ({arms})
    """


# PSI buckets over events.value — fixed edges shared with the oracle
DRIFT_EDGES: tuple[float, ...] = (0.0, 20.0, 40.0, 60.0, 80.0, 100.0, 200.0)
DRIFT_SMOOTH = 0.5  # Laplace smoothing per bucket


def _bucket_expr(col: str) -> str:
    """SQL CASE assigning a value to its bucket index (shared text)."""
    arms = " ".join(
        f"WHEN {col} < {hi} THEN {i}" for i, hi in enumerate(DRIFT_EDGES[1:])
    )
    return f"CASE {arms} ELSE {len(DRIFT_EDGES) - 1} END"


def value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x_drift_events — PSI of the ``value`` distribution between the
    even-id half (baseline) and odd-id half (current) of events.

    One scan: bucket assignment is a narrow CASE, then a single
    groupBy(bucket) with two conditional counts; PSI terms are
    row-local arithmetic over the (fixed, small) bucket table."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(_bucket_expr("value")).alias("bucket"),
        (F.col("event_id") % 2 == 0).alias("is_base"),
    )
    k = len(DRIFT_EDGES)
    per_bucket = ev.groupBy("bucket").agg(
        F.count_if(F.col("is_base")).alias("n_base"),
        F.count_if(~F.col("is_base")).alias("n_cur"),
    )
    tot = per_bucket.agg(
        F.sum("n_base").alias("t_base"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_base") + DRIFT_SMOOTH) / (F.col("t_base") + DRIFT_SMOOTH * k)
    q = (F.col("n_cur") + DRIFT_SMOOTH) / (F.col("t_cur") + DRIFT_SMOOTH * k)
    return (
        per_bucket.crossJoin(F.broadcast(tot))  # one row
        .select(
            "bucket",
            "n_base",
            "n_cur",
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


def value_drift_oracle_sql() -> str:
    k = len(DRIFT_EDGES)
    b = _bucket_expr("value")
    return f"""
        WITH ev AS (
            SELECT {b} AS bucket, event_id % 2 = 0 AS is_base FROM events
        ),
        per_bucket AS (
            SELECT bucket,
                   count(*) FILTER (is_base) AS n_base,
                   count(*) FILTER (NOT is_base) AS n_cur
            FROM ev GROUP BY bucket
        ),
        tot AS (SELECT sum(n_base) AS t_base, sum(n_cur) AS t_cur FROM per_bucket)
        SELECT bucket, n_base, n_cur,
               round(((n_base + {DRIFT_SMOOTH}) / (t_base + {DRIFT_SMOOTH} * {k})
                      - (n_cur + {DRIFT_SMOOTH}) / (t_cur + {DRIFT_SMOOTH} * {k}))
                     * ln(((n_base + {DRIFT_SMOOTH}) / (t_base + {DRIFT_SMOOTH} * {k}))
                          / ((n_cur + {DRIFT_SMOOTH}) / (t_cur + {DRIFT_SMOOTH} * {k}))), 6)
                   AS psi_term
        FROM per_bucket CROSS JOIN tot
    """
