"""Relational operator surface — SURVEY §2.5 and FIXTURES.md Q1-Q13.

The reference has no relational operators (no groupBy/join/sort anywhere
in src/main — SURVEY §2.5); this module declares the engine's standard
set as thin, idiomatic DataFrame builders over the fixture tables. Every
builder is pure Catalyst built-ins — predicate pushdown, column pruning,
partial aggregation, AQE join selection all apply with zero custom code.

Scale notes (the 100 TB posture):
- Dimension joins (nation, region, customer at TPC-H ratios) are
  broadcast explicitly — no shuffle of the fact side.
- Aggregations rely on partial+final (map-side combine); group keys here
  are low-cardinality so the shuffle is tiny regardless of input size.
- Window functions partition by a key (never a global window), so state
  is bounded per partition; top-k uses orderBy+limit which Spark plans
  as TakeOrderedAndProject (per-partition heap, no full sort).

Each function takes (spark, sf_dir) and returns a DataFrame; aliases are
chosen to match the DuckDB oracle SQL in ``__spark_entry__.oracle_sql``
(driver hash-compares by sorted column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.sources.batch import load_table


def q1_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — scan + projection with an arithmetic expression. The scan
    should read only 3 columns (check ReadSchema in explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


def q2_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 — TPC-H Q6-shaped filter; all three predicates push to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        "l_extendedprice",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


def q3_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 — string + JSON scalar functions over events (props is a JSON
    string; ``get_json_object`` stays JVM-side)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.length("props").alias("props_len"),
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


def q4_agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 — TPC-H Q1 shape: hash aggregation, partial+final automatic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q5_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 — exact distinct (oracle-checked); approx_count_distinct is
    smoke-tested engine-side only (tests/test_relational.py)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(F.countDistinct("o_custkey").alias("n_custs"))


def q6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — ROLLUP grouping sets over orders.

    Known Spark-vs-ANSI divergence (round-13 fuzz adjudication): over an
    EMPTY input, Spark's grouping sets (Expand + keyed agg on
    spark_grouping_id) emit 0 rows where ANSI/DuckDB/Postgres emit the
    global-set row (all keys NULL, COUNT(*)=0). Pinned by
    tests/test_round13_fixes.py::test_spark_grouping_sets_empty_divergence;
    tools/query_fuzz.py adjudicates it as 'spark-empty-grouping-sets'."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 6).alias("total"), F.count("*").alias("n"))
    )


def q7_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — orders ⋈ customer ⋈ nation ⋈ region revenue by region name.

    Broadcast policy (applies file-wide): only fixed-cardinality tables
    get a forced ``F.broadcast`` hint — nation (25 rows) and region
    (5 rows) never grow with SF. customer scales linearly with the
    corpus, so it carries NO hint: AQE broadcasts it while its runtime
    size is under ``autoBroadcastJoinThreshold`` and falls back to a
    shuffle join at scale, which is the plan you want at 100×.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 6).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def q8_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — customers LEFT JOIN orders; zero-order customers kept."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q9_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9a — customers with ≥1 order (left semi ≡ EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def q9_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9b — customers with no orders (left anti ≡ NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q10_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 — ranking window functions; partitioned by customer so window
    state is bounded per key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
    )


def q11_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 — analytic window: running sum + lag per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum("o_totalprice")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running_total"),
        F.date_format(F.lag("o_orderdate").over(w), "yyyy-MM-dd").alias("prev_order_date"),
    )


def q12_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 — top 10 orders by price (ties broken by key). orderBy+limit
    plans as TakeOrderedAndProject: per-partition heaps, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q14_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 — pivot: quantity by returnflag × linestatus (wide form).
    Catalyst rewrites pivot into one aggregation with conditional aggs —
    a single shuffle regardless of pivot-value count."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).agg(F.sum("l_quantity"))
    return p.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_filled"),
    )


def q15_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 — unpivot/melt via stack (narrow form; no shuffle at all)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(2, 'qty', l_quantity, 'price', l_extendedprice) AS (metric, val)"
        ),
    )


def q16_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 — exact percentiles (linear interpolation) per group;
    percentile_approx is the at-scale variant (smoke-tested in tests)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
    )


def q17_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 — time-bucket aggregation (batch form of the streaming
    windowed counts, SURVEY §2.9)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.sum("value").alias("total"))


def q20_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 — correlated-style analytics without the correlation: orders
    above their customer's average price. The idiomatic Spark plan is a
    window (one shuffle), not a re-scanning correlated subquery."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", F.round("cust_avg", 6).alias("cust_avg"))
    )


def q21_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 — aggregation + HAVING (post-agg filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 6).alias("total"))
        .filter(F.col("n") >= 15)
    )


def q22_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 — scalar function library breadth: string, math, date,
    conditional — one projection, codegen'd end to end."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("padded_key"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("log_price"),
        (F.col("o_totalprice") % 1000).cast("double").alias("mod_price"),
        F.when(F.col("o_orderstatus") == "F", "filled")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_word"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("?")).alias("status_nz"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floored"),
        F.abs(F.col("o_totalprice") - 250000).alias("dist_from_250k"),
    )


def q23_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q23 — CUBE grouping sets (rollup's big sibling, Q6)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 6).alias("total"), F.count("*").alias("n")
    )


def q24_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q24 — navigation window functions: first/last value, ntile,
    percent_rank, cume_dist, lead."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(wall).alias("first_key"),
        F.last("o_orderkey").over(wall).alias("last_key"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
    )


def q13_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13a — UNION (distinct) of customer vs supplier nation keys."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


def q13_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


def q13_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)  # subtract = SQL EXCEPT (set semantics)


# --- Breadth batch 2: arrays/HOFs, statistics, datetime, grouping sets,
# range frames, TPC-H Q3, subqueries-via-SQL, string library ---------------


def q25_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q25 — array columns + higher-order functions over documents.

    transform/filter/aggregate are Catalyst lambda expressions: they
    evaluate inside codegen with zero Python crossing, so per-row array
    work is as cheap as scalar work at 100 TB. No explode → no row
    blow-up; the array never leaves its row.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.filter(toks, lambda w: F.length(w) > 6)).alias("n_long"),
        F.aggregate(
            toks, F.lit(0), lambda acc, w: acc + F.length(w)
        ).alias("sum_chars"),
        F.concat_ws(" ", F.transform(F.slice(toks, 1, 3), F.upper)).alias("head3_upper"),
    )


def q26_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q26 — statistical aggregates (one pass, partial+final like any
    hash agg: moments combine associatively map-side)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("qty_price_cov"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 6).alias("qty_price_covp"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_bulk"),
        F.max_by("l_orderkey", "l_extendedprice").alias("priciest_order"),
    )


def q27_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q27 — date/time arithmetic library (all Catalyst built-ins;
    dayofweek aliased to Sunday=0 to pin one cross-engine convention)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("1998-06-17").cast("date"), F.col("o_orderdate")).alias(
            "age_days"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sun0"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias(
            "week_start"
        ),
    )


def _register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def q28_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q28 — GROUPING SETS + grouping() flags, via the engine's SQL entry
    point (spark.sql over registered views) rather than the builder API:
    both converge on the same Catalyst plan (SURVEY §3.4)."""
    _register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_prio,
               sum(o_totalprice) AS total, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q29_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q29 — RANGE window frame: per customer, rolling 30-day order total
    (value-based frame over epoch seconds, not row counts — peers with
    equal timestamps aggregate identically, so the result is
    deterministic under ties, unlike a ROWS frame)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 6).alias("rolling_30d"),
    )


def q30_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q30 — TPC-H Q3 (shipping priority): segment-filtered customer
    joined into orders, then lineitem ⋈ orders on l_orderkey,
    aggregated, then top-10 via TakeOrderedAndProject.

    No forced broadcast: both orders and customer scale with SF, so the
    fact⋈fact edge must stay a shuffle join at scale; AQE broadcasts
    the small side at low SF where that is actually cheaper."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o.join(c, o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q31_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q31 — IN / NOT IN subqueries via the SQL entry point (Catalyst
    rewrites them to left-semi / null-aware anti joins — the rewrite is
    the optimizer's, not ours)."""
    _register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
          AND o_totalprice > 300000
        """
    )


def q32_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q32 — string library breadth over part: edit distance, token
    extraction, search, regex, hashing. All JVM-side built-ins."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", F.lit("Brand#33")).alias("brand_dist"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr("p_name", "e").alias("e_pos"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_type"), 256).alias("type_sha"),
        F.ascii("p_name").alias("first_ascii"),
    )


def q33_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q33 — TPC-H Q5 (local supplier volume): revenue per nation where
    the supplier and the customer share the nation.

    Only nation/region (fixed 25/5 rows) are force-broadcast. orders is
    a year of the fact — it scales with SF, so lineitem ⋈ orders is a
    shuffle join on l_orderkey at scale (AQE broadcasts it at low SF);
    supplier/customer carry no hint for the same reason."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == su.s_nationkey))
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


def q34_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q34 — TPC-H Q10 (returned-item reporting): top 20 customers by
    lost revenue on returned items in one quarter.

    orders (a quarter of the fact) and customer both scale with SF —
    no forced broadcast; only nation (25 rows) keeps the hint."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q35_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q35 — TPC-H Q18 (large-volume customers): orders whose total
    quantity exceeds a threshold; the big-order set is a semi-join input
    built by one agg over the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
    )


def q37_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q37 — TPC-H Q14 shape (promotion revenue share): conditional
    aggregate over lineitem ⋈ part.

    part scales with SF (TPC-H sf100 ⇒ 20 M parts) — no forced
    broadcast; AQE broadcasts while small, shuffle-joins on l_partkey
    at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("economy_share_pct"),
            F.round(F.sum(rev), 6).alias("total_revenue"),
        )
    )


def q38_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q38 — supplier account-balance profile per nation (dim⋈dim
    broadcast join + multi-stat agg)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 6).alias("avg_bal"),
            F.round(F.min("s_acctbal"), 6).alias("min_bal"),
            F.round(F.max("s_acctbal"), 6).alias("max_bal"),
            F.count_if(F.col("s_acctbal") < 0).alias("n_negative"),
        )
    )


def q39_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q39 — TPC-H Q4 shape (order priority checking): count orders per
    priority in one quarter having at least one line shipped after the
    order date. EXISTS → left-semi join (no fact duplication), then a
    small agg; Catalyst plans the semi side as the build."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    return (
        o.filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
        )
        .join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q40_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q40 — TPC-H Q6 (forecasting revenue change): the canonical
    filtered single-table aggregate. Every predicate must reach the
    parquet scan as a pushed filter; the agg is partial+final with no
    grouping key (one-row result)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def q41_brand_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q41 — TPC-H Q16 shape (parts/supplier relationship): distinct
    supplier count per (p_brand, p_size) over the lineitem link, small
    sizes only, one brand excluded. Partial distinct runs map-side on
    (brand, size, suppkey). part scales with SF — no forced broadcast
    (AQE broadcasts the filtered slice while it fits)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    dims = p.filter((F.col("p_size") <= 20) & (F.col("p_brand") != "Brand#11"))
    return (
        # join condition references dims, not p: `p.p_partkey` resolved
        # only because filter() preserves attribute ids — any lineage
        # break (alias, checkpoint) would turn it into a cross-plan
        # reference (self-review finding, round 11)
        li.join(dims, li.l_partkey == dims.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q42_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q42 — TPC-H Q17 shape (small-quantity-order revenue): lines with
    quantity below 20% of their part's average quantity. The correlated
    scalar subquery becomes one agg over the fact re-joined to the fact
    — both sides shuffle on l_partkey once (AQE can co-locate). The
    per-part avg has one row per partkey, i.e. it scales with the
    corpus — NO broadcast hint; AQE picks broadcast only while it
    actually fits."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    return (
        li.join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
            F.count("*").alias("n_small_lines"),
        )
    )


def q43_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q43 — full-outer join: per-nation customer and supplier counts,
    keeping nations that have only one side. Aggregate-then-join keeps
    the outer join on two tiny pre-aggregated sides (at scale the aggs
    shuffle on nationkey once; the join itself is broadcast-able)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nk_c")).agg(F.count("*").alias("n_customers"))
    sn = s.groupBy(F.col("s_nationkey").alias("nk_s")).agg(F.count("*").alias("n_suppliers"))
    return cn.join(sn, cn.nk_c == sn.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


def q44_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q44 — generator (LATERAL/UNNEST shape): explode document tokens
    to rows, count occurrences of tokens longer than 5 chars. The
    explode is a narrow Generate node; the only shuffle is the final
    agg on the token key (map-side partial combine first)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    return (
        d.select(F.explode(toks).alias("token"))
        .filter(F.length("token") > 5)
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )


def q45_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q45 — TPC-H Q13 (customer order distribution): histogram of
    orders-per-customer including zero-order customers. Double agg: the
    outer-join count shuffles on custkey, the histogram on the (tiny)
    count value — the second exchange is negligible at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q46_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q46 — TPC-H Q15 (top supplier): supplier(s) whose quarter revenue
    equals the maximum. The max is a scalar subquery → one-row broadcast
    back onto the per-supplier agg (no second scan of the fact). The
    one-row max keeps its hint (cardinality is literally 1); supplier
    scales with SF so it carries none."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("mx"))
        .join(s, rev.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q47_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q47 — sliding event-time window (1 h window, 30 min slide):
    per-window, per-type counts and value sums. Spark's window()
    generator assigns each row to win/slide = 2 buckets (a narrow
    Expand), then one agg shuffle on (window, type) — identical shape
    streaming or batch; the streaming variant only adds a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def q48_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q48 — TPC-H Q7 (volume shipping): bilateral trade volume between
    two nations per ship year. lineitem ⋈ orders and the supplier/
    customer hops are shuffle joins (all SF-scaled, no hints); the two
    nation lookups broadcast (25 rows each). The nation-pair disjunction
    lands after both lookups, where it is a cheap row-local filter."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


def q49_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q49 — TPC-H Q8 (national market share): NATION_2's share of PROMO
    part revenue sold into ASIA customers, per order year. The share is
    a conditional-sum ratio inside one agg — no second pass. part is
    SF-scaled (no hint); nation/region broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("c_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 6).alias("total_volume"),
        )
    )


def q50_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q50 — TPC-H Q12 shape (shipping-delay priority audit): per line
    status, count late-shipped 1996 lines split by order urgency. (The
    fixture has no l_shipmode/commitdate; l_linestatus stands in for the
    mode and ship-lag > 90 days for the late predicate — the shape, a
    fact⋈fact join feeding a two-way conditional count, is Q12's.)"""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count_if(urgent).alias("high_line_count"),
            F.count_if(~urgent).alias("low_line_count"),
        )
    )


def q51_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q51 — TPC-H Q19 (discounted revenue, disjunctive predicates):
    three (brand, size-range, quantity-range) clauses OR-ed across the
    lineitem ⋈ part join. Catalyst extracts the common join key so this
    stays an equi-join (plan must be free of BroadcastNestedLoopJoin);
    the disjunction evaluates row-local post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    clause = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5)) & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(20, 30)))
    )
    return j.filter(clause).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def q52_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q52 — TPC-H Q21 shape (suppliers who kept orders waiting): for
    finalized orders, suppliers whose line shipped >60 days after the
    order date while every other supplier on the order shipped on time
    — EXISTS(another supplier) as a left-semi join, NOT EXISTS(another
    late supplier) as a left-anti join, then count per supplier, top 10.
    All joins key on l_orderkey (one shuffle family, AQE co-locates);
    nation broadcast. (Fixture lacks commit/receipt dates; ship-lag
    stands in for the late predicate, the semi/anti structure is Q21's.)"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    l1 = lines.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    others = lines.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = lines.filter(F.col("late")).select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waiting = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


def q53_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q53 — TPC-H Q22 shape (global sales opportunity): customers in a
    7-nation subset with above-average positive balance and no recent
    orders. The average is a one-row scalar → broadcast back; the
    no-recent-orders test is a left-anti join on custkey. (Fixture has
    no c_phone, so c_nationkey stands in for the country code; every
    fixture customer has *some* order, so "recent" replaces Q22's
    lifetime NOT EXISTS to keep the predicate non-vacuous.)"""
    nations = [1, 3, 5, 7, 11, 13, 17]
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1999-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )


def q54_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q54 — TPC-H Q2 shape (minimum-cost supplier): for each small part,
    the supplier offering the lowest observed unit price in an ASIA
    nation, ties broken by supplier key. The fixture has no partsupp, so
    lineitem stands in as the part⋈supplier price link (unit price =
    l_extendedprice / l_quantity); the correlated min-subquery becomes a
    per-part window min — one shuffle on l_partkey instead of a
    re-scan + re-join of the link table. nation/region broadcast;
    part/supplier/lineitem are SF-scaled and carry no hints."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    offers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(F.asc("unit_price"), F.asc("s_suppkey"))
    return (
        offers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round("unit_price", 6).alias("min_unit_price"),
        )
    )


def q55_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q55 — TPC-H Q9 shape (product-type profit): profit per supplier
    nation per order year for green-named parts. Without partsupp,
    supply cost is modeled as 60% of p_retailprice × quantity — the
    shape (fact ⋈ two SF-scaled dims ⋈ orders, then a two-key agg) is
    Q9's. nation broadcast only."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("g"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 6).alias("sum_profit"))
    )


def q56_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q56 — TPC-H Q11 shape (important stock): parts whose revenue
    exceeds a fixed fraction of total revenue. The global total is a
    one-row scalar → broadcast back onto the per-part agg (no second
    scan: both aggs reuse one shuffle family on l_partkey, and the
    HAVING-against-global-subquery shape is Q11's)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(rev).alias("part_value"))
    total = per_part.agg(F.sum("part_value").alias("tv"))
    return (
        per_part.join(F.broadcast(total), F.col("part_value") > 0.0005 * F.col("tv"))
        .select("l_partkey", F.round("part_value", 6).alias("part_value"))
    )


def q57_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q57 — TPC-H Q20 shape (potential part promotion): suppliers who
    shipped notably more of some 'g' part in 1996 than that part's
    average supplier did — completing the 22-shape TPC-H sweep. Without
    partsupp, per-(supplier, part) shipped quantity stands in for
    availqty and the per-part mean (×1.5) for the half-of-shipped
    threshold; the structure — agg-subquery feeding an IN/semi-join up
    to the supplier dim — is Q20's. Both aggs share one shuffle family
    keyed on l_partkey; the supplier hop is a semi-join (no fact
    duplication)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("g"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("qty") * 1.5).alias("thr")
    )
    big = (
        shipped.join(thr, shipped.l_partkey == thr.t_partkey)
        .filter(F.col("qty") > F.col("thr"))
        .select("l_suppkey")
    )
    return (
        s.join(big, s.s_suppkey == big.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


def q60_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q60 — LATERAL correlated subquery (per-nation top-2 suppliers by
    balance) via the SQL entry point. Catalyst decorrelates the LATERAL
    LIMIT into a join + per-key window — at any SF that is one shuffle
    on the correlation key, never a per-row re-execution (the oracle
    runs the identical SQL, DuckDB plans it its own way)."""
    _register_views(spark, sf_dir, "nation", "supplier")
    return spark.sql(
        """
        SELECT n.n_name, l.s_suppkey, l.s_acctbal
        FROM nation n,
        LATERAL (
            SELECT s_suppkey, s_acctbal
            FROM supplier s
            WHERE s.s_nationkey = n.n_nationkey
            ORDER BY s_acctbal DESC, s_suppkey
            LIMIT 2
        ) l
        """
    )


# spine base + months, matching the FIXTURE order-date span: the
# driver fixtures run 1995-01 .. 2001-08, but the spine used to start
# at 1992-01 for 84 months (ending 1998-12) — dropping ~40% of real
# orders from the gap-fill while reporting 36 phantom zero months
# (self-review finding, round 11; the oracle shares the SQL verbatim,
# so the gate could never see it). 1995-01 + 84 months = 2001-12
# covers the span with margin AND stays under Spark's default WITH
# RECURSIVE level limit of 100 (the dialect-shared SQL cannot carry
# Spark's MAX RECURSION LEVEL clause).
SPINE_BASE_YEAR = 1995
SPINE_MONTHS = 84


def q61_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q61 — recursive CTE (Spark 4.x WITH RECURSIVE): generate a month
    spine and left-join monthly order counts, so empty months surface
    as zeros — the standard time-series gap-fill every reporting
    pipeline needs. Linear recursion (UNION ALL, bounded depth), and
    the SQL is dialect-shared: the DuckDB oracle runs this exact text.
    """
    _register_views(spark, sf_dir, "orders")
    return spark.sql(_DATE_SPINE_SQL)


# written in the common Spark/DuckDB dialect (no div/strftime), shared
# verbatim with the oracle so the two sides cannot drift
_DATE_SPINE_SQL = f"""
    WITH RECURSIVE spine(ym) AS (
        SELECT 0
        UNION ALL
        SELECT ym + 1 FROM spine WHERE ym < {SPINE_MONTHS - 1}
    ),
    monthly AS (
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS mo, count(*) AS n
        FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
    )
    SELECT {SPINE_BASE_YEAR} + CAST(floor(ym / 12) AS INT) AS year,
           1 + ym % 12 AS month,
           coalesce(n, 0) AS n_orders
    FROM spine
    LEFT JOIN monthly
      ON y = {SPINE_BASE_YEAR} + CAST(floor(ym / 12) AS INT) AND mo = 1 + ym % 12
"""
