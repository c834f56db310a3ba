"""Relational core — SURVEY.md §2.2-§2.8 operator inventory.

Each query is the Spark-first expression of one inventory row, paired with
its ANSI-SQL oracle. These are the semantics of the reference's staging
tier ("transform, cleanse" — reference readme:9), QC gates
(dags/pipeline_orchestration_dag.py:149-167), and curation tier
(readme:10), generalized over the driver's TPC-H-ish warehouse.

Scale notes (100 TB posture) are called out per query where the plan
shape matters: which side broadcasts, where the shuffle lands, what
pushes down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query


# ---------------------------------------------------------------------------
# Phase 0 flagship — curation join + grouped agg (J1 + A2 analog).
# The reference's curation layer joins Employee ⋈ Department into
# EmployeeDepartment_cur (dags/config/pipeline_config.yaml:90); here the
# analog is fact ⋈ dims with a rollup the dashboard tier would read.
# ---------------------------------------------------------------------------

@query(
    "curation_revenue_by_nation",
    oracle="""
    SELECT n_name AS nation,
           COUNT(*) AS n_orders,
           FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS total_revenue,
           FLOOR(AVG(o_totalprice) * 100.0 + 0.5) / 100.0 AS avg_order_value
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def curation_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup per nation (flagship; entry() runs this).

    Scale: orders is the big side; customer and nation are broadcast so the
    only shuffle is the final 25-group aggregation (map-side partials
    first). At 100 TB customer may exceed broadcast size — AQE then flips
    that join to SMJ at runtime without a code change.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            roundn(F.sum("o_totalprice")).alias("total_revenue"),
            roundn(F.avg("o_totalprice")).alias("avg_order_value"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates (staging tier, readme:9)
# ---------------------------------------------------------------------------

@query(
    "project_rename",
    oracle="""
    SELECT c_custkey AS customer_id,
           c_name AS customer_name,
           c_mktsegment AS segment
    FROM customer
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — projection + rename (raw→staging column standardization).

    Scale: pure narrow op; ReadSchema must show only the 3 columns.
    """
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
        )
    )


@query(
    "cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_orderkey AS DOUBLE) AS orderkey_d,
           CAST(o_custkey AS VARCHAR) AS custkey_s,
           CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS priority_n
    FROM orders
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — type application, the raw(all-string)→staging(typed) step."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderkey").cast("double").alias("orderkey_d"),
        F.col("o_custkey").cast("string").alias("custkey_s"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority_n"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag = 'R'
      AND l_shipdate >= TIMESTAMP '1998-01-01'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — conjunctive predicate (cleansing filter).

    Scale: all three predicates must appear in PushedFilters on the
    parquet scan — verified by tests/test_plans_physical.py.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").between(10, 20)
            & (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "null_handling",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS discount_filled,
           (NULLIF(l_discount, 0.0) IS NULL) AS was_zero
    FROM lineitem
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — null introduction (nullif), defaulting (coalesce), null tests."""
    li = load_table(spark, sf_dir, "lineitem")
    nulled = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(nulled, F.lit(-1.0)).alias("discount_filled"),
        nulled.isNull().alias("was_zero"),
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations (QC gates + curation rollups)
# ---------------------------------------------------------------------------

@query(
    "qc_count_nonempty",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(*) > 0 AS non_empty
    FROM lineitem
    """,
)
def qc_count_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/C2 — the one SQL statement literally present in the reference:
    `SELECT COUNT(*) > 0` per staging table
    (dags/pipeline_orchestration_dag.py:151-167)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .agg(F.count("*").alias("n_rows"))
        .select("n_rows", (F.col("n_rows") > 0).alias("non_empty"))
    )


@query(
    "agg_grouped",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           FLOOR(SUM(l_quantity) * 100.0 + 0.5) / 100.0 AS sum_qty,
           FLOOR(SUM(l_extendedprice) * 100.0 + 0.5) / 100.0 AS sum_base_price,
           FLOOR(AVG(l_discount) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
           MIN(l_shipdate) AS min_shipdate,
           MAX(l_shipdate) AS max_shipdate,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — grouped sum/avg/min/max/count (TPC-H Q1 shape).

    Scale: hash aggregate with map-side partials; the shuffle carries only
    |groups| × partial-state, not rows.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            roundn(F.sum("l_quantity")).alias("sum_qty"),
            roundn(F.sum("l_extendedprice")).alias("sum_base_price"),
            roundn(F.avg("l_discount"), 4).alias("avg_disc"),
            F.min("l_shipdate").alias("min_shipdate"),
            F.max("l_shipdate").alias("max_shipdate"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — count-distinct (key-uniqueness QC building block)."""
    return load_table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           FLOOR(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END) * 100.0 + 0.5) / 100.0 AS finished_value,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — filtered/conditional aggregates (QC ratio building blocks)."""
    is_f = F.col("o_orderstatus") == "F"
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(is_f, 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("n_large"),
            roundn(F.sum(F.when(is_f, F.col("o_totalprice")).otherwise(0.0))).alias("finished_value"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           FLOOR(SUM(l_quantity) * 100.0 + 0.5) / 100.0 AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — multi-level rollup for the curated reporting tier."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            roundn(F.sum("l_quantity")).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 joins (curation tier, readme:10)
# ---------------------------------------------------------------------------

@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — equi inner join (Employee ⋈ Department analog)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           FLOOR(COALESCE(SUM(o_totalprice), 0.0) * 100.0 + 0.5) / 100.0 AS lifetime_value
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — left outer join keeping customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            roundn(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("lifetime_value"),
        )
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT c_custkey, n_name AS nation, r_name AS region
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — explicit broadcast of the dim snowflake onto the fact.

    Scale: nation(25) ⋈ region(5) resolves driver-side; the big customer
    scan never shuffles. Plan must show BroadcastHashJoin twice.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        c.join(F.broadcast(dims), c.c_nationkey == dims.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@query(
    "join_sortmerge",
    oracle="""
    SELECT l_orderkey AS orderkey,
           COUNT(*) AS n_items,
           FLOOR(SUM(l_extendedprice) * 100.0 + 0.5) / 100.0 AS order_value
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey
    """,
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — large ⋈ large: forced sort-merge (the 100 TB default when
    neither side broadcasts). The merge hint pins SMJ even at test scale;
    at 100 TB both sides shuffle-sort on the join key and AQE handles any
    orderkey skew."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.count("*").alias("n_items"),
            roundn(F.sum("l_extendedprice")).alias("order_value"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — left semi join: existence check without row multiplication."""
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — left anti join: orphan detection (QC generalization of the
    reference's gate stage, dags/pipeline_orchestration_dag.py:149-167)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# §2.5 window functions (SCD2 building blocks, readme:10)
# ---------------------------------------------------------------------------

@query(
    "win_rownum_latest",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    )
    WHERE rn = 1
    """,
)
def win_rownum_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — latest-record-per-key, the SCD2 snapshot-pick primitive."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           LAG(o_orderdate) OVER w AS prev_orderdate,
           LEAD(o_orderdate) OVER w AS next_orderdate,
           CAST(COALESCE(DATE_DIFF('day',
               LAG(o_orderdate) OVER w, o_orderdate), -1) AS INT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — lag/lead: SCD2 change detection / effective-to derivation."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        prev.alias("prev_orderdate"),
        F.lead("o_orderdate").over(w).alias("next_orderdate"),
        F.coalesce(F.datediff(F.col("o_orderdate"), prev), F.lit(-1)).alias("days_since_prev"),
    )


@query(
    "win_rank_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """,
)
def win_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/O3 — top-N per group. At scale Spark pushes a per-partition
    top-N (WindowGroupLimit) below the shuffle, so the full sort never
    materializes."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@query(
    "win_rolling",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           FLOOR(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS running_total,
           FLOOR(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS moving_avg_3
    FROM orders
    """,
)
def win_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — cumulative + moving-window frame aggregates."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        roundn(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .alias("running_total"),
        roundn(F.avg("o_totalprice").over(w.rowsBetween(-2, 0))).alias("moving_avg_3"),
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / top-k
# ---------------------------------------------------------------------------

@query(
    "sort_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — global total order (range-partitioned sort, no single-node
    bottleneck)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — global top-k. Spark plans TakeOrderedAndProject: per-partition
    heaps of k, merged on the driver — no global sort even at 100 TB."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations (SCD2 merge output is union-structured)
# ---------------------------------------------------------------------------

@query(
    "set_union",
    oracle="""
    SELECT c_custkey, 'building' AS cohort FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, 'wealthy' AS cohort FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — union by name (the SCD2 merge-output shape)."""
    c = load_table(spark, sf_dir, "customer")
    building = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", F.lit("building").alias("cohort"))
    )
    wealthy = (
        c.filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", F.lit("wealthy").alias("cohort"))
    )
    return building.unionByName(wealthy)


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — intersect: customers active in both years (tier
    reconciliation shape)."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.intersect(y97)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — except: run-over-run data diff (regression QC shape)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o.distinct()).distinct()


# ---------------------------------------------------------------------------
# §2.8 scalar functions (staging standardization, readme:9)
# ---------------------------------------------------------------------------

@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(TRIM(c_name)) AS name_upper,
           LOWER(c_mktsegment) AS segment_lower,
           CONCAT_WS('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS name_masked
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — string standardization suite."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.trim(F.col("c_name"))).alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias("seg_key"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           STRFTIME(o_orderdate, '%Y-%m') AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_epoch_end
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — date/time suite ({{ ds }} stamping + SCD2 effective dating,
    reference dags/pipeline_orchestration_dag.py:195,204)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_epoch_end"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100.0 + 0.5) / 100.0 AS charge,
           ABS(l_quantity - 25.0) AS qty_dev,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_bucket,
           CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS qty_decade,
           l_orderkey % 7 AS key_mod,
           FLOOR(SQRT(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS price_sqrt
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — arithmetic suite; `charge` is the TPC-H pricing expression
    with parenthesization fixed so both engines evaluate identically."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        roundn(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * (F.lit(1) + F.col("l_tax"))
        ).alias("charge"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_bucket"),
        F.floor(F.col("l_quantity") / 10.0).alias("qty_decade"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        roundn(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
    )


@query(
    "fn_case",
    oracle="""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COUNT(*) AS n_orders,
           FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS band_value
    FROM orders
    GROUP BY 1
    """,
)
def fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — CASE WHEN buckets (SCD2 is_current flag shape)."""
    band = (
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(band.alias("price_band"))
        .agg(
            F.count("*").alias("n_orders"),
            roundn(F.sum("o_totalprice")).alias("band_value"),
        )
    )


@query(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           SHA256(c_name) AS name_sha256,
           MD5(CONCAT_WS('|', c_name, c_mktsegment)) AS row_md5
    FROM customer
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — hash fingerprints, the SCD2 change-detection primitive
    (row_hash in the curation model, readme:10)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.md5(F.concat_ws("|", F.col("c_name"), F.col("c_mktsegment"))).alias("row_md5"),
    )
