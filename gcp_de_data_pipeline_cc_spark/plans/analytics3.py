"""TPC-H completion wave — the remaining classic analytic shapes
(Q2/4/6/8/9/11/12/13/14/15/16/19/20/21/22) adapted to the warehouse
schema; with analytics.py / analytics2.py this covers all 22 query
shapes.

The reference delegates this workload class to BigQuery + dbt
(readme:10); re-expressed here as Catalyst-optimized DataFrame plans.
Schema adaptations: there is no ``partsupp`` table, so part↔supplier
relationships bridge through ``lineitem``; no ``l_shipmode`` /
``l_commitdate`` / ``l_receiptdate``, so lateness predicates use
``l_shipdate`` vs ``o_orderdate``; no ``c_phone``, so Q22's prefix
grouping uses ``c_mktsegment``.

Scale notes (100 TB): every query keys its shuffles on the join column
Catalyst would pick anyway; dimension sides (part subsets, supplier,
nation, region, scalar aggregates) are explicitly broadcast; the Q21
rewrite replaces the correlated EXISTS/NOT EXISTS pair with one
orderkey-partitioned aggregation + window — a single shuffle instead of
two correlated probes per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query


def _disc_price():
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


@query(
    "tpch_q2_min_price_supplier",
    oracle="""
    WITH offers AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS offer_price
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'LARGE' AND p_size < 16
        GROUP BY l_partkey, l_suppkey),
    best AS (
        SELECT *, MIN(offer_price) OVER (PARTITION BY l_partkey) AS best_price
        FROM offers)
    SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
           FLOOR(offer_price * 100.0 + 0.5) / 100.0 AS offer_price
    FROM best
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE offer_price = best_price
    ORDER BY s_acctbal DESC, p_partkey, l_suppkey
    LIMIT 20
    """,
)
def tpch_q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shape: cheapest supplier per part (correlated-MIN subquery as a
    partition-window equality). MIN(l_extendedprice) is order-independent
    and exact, so the min-equality join is engine-stable — no float
    accumulation in the predicate path."""
    li = load_table(spark, sf_dir, "lineitem")
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") < 16))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    offers = (
        li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("offer_price"))
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("best_price", F.min("offer_price").over(w)).filter(
        F.col("offer_price") == F.col("best_price")
    )
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            roundn(F.col("offer_price")).alias("offer_price"),
            "l_suppkey",
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "l_suppkey")
        .limit(20)
        .drop("l_suppkey")
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shape: EXISTS decorrelated to a left-semi join whose extra
    lateness predicate rides the equi-join (commitdate analog:
    shipped > 60 days after order)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT FLOOR(SUM(l_extendedprice * l_discount) * 100.0 + 0.5) / 100.0
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shape: pure scan-filter-aggregate. The whole WHERE clause is
    parquet-pushable (min/max row-group skipping on l_shipdate at scale);
    no shuffle beyond the single-row final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(roundn(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH vol AS (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA')
    SELECT o_year,
           FLOOR(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                 / SUM(volume) * 10000.0 + 0.5) / 10000.0 AS mkt_share
    FROM vol
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shape: national market share within a region per year — the
    conditional-sum-over-sum ratio with nation in two roles."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(F.lit(0))
    ) / F.sum("volume")
    return vol.groupBy("o_year").agg(roundn(share, 4).alias("mkt_share"))


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(YEAR(o_orderdate) AS INT) AS o_year,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity) * 100.0 + 0.5) / 100.0
           AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE 'red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shape: product-line profit by supplier nation and year. With no
    partsupp.ps_supplycost, cost is modeled as 0.5 × p_retailprice per
    unit — same join/aggregate skeleton, deterministic per-row math."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = _disc_price() - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(roundn(F.sum(profit)).alias("sum_profit"))
    )


@query(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_linestatus
    """,
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shape: priority mix of late shipments (shipmode analog:
    l_linestatus; lateness: shipped > 30 days after order date)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shape: order-count histogram over customers, with the filter
    inside the LEFT JOIN condition (kept-nulls semantics) — the classic
    double-aggregation distribution query."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT FLOOR(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5)
           / 10000.0 AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shape: promotion revenue share for one month — conditional
    aggregate ratio over a broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.lit(100.0) * F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0))
    ) / F.sum(_disc_price())
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(roundn(promo, 4).alias("promo_revenue"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(l_extendedprice * (1 - l_discount)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           FLOOR(total_rev * 100.0 + 0.5) / 100.0 AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shape: the view-plus-scalar-MAX pattern. The MAX comparison
    happens within one engine's own sums, so argmax is stable unless two
    suppliers' quarterly revenues collide to the last ulp."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", roundn(F.col("total_rev")).alias("total_revenue")
        )
    )


@query(
    "tpch_q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shape: distinct-supplier counts per part attribute triple,
    excluding a NOT-IN denylist (negative-balance suppliers standing in
    for the complaints filter) — anti join + count-distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    deny = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(deny), li.l_suppkey == deny.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0
           AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#18' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shape: disjunctive mixed-table predicate that can only be
    evaluated post-join — the optimizer still pushes the per-table
    residuals (brand/size union, quantity envelope) below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    def arm(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
    cond = arm("Brand#12", 5, 1, 11) | arm("Brand#15", 10, 10, 20) | arm(
        "Brand#18", 15, 20, 30
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(roundn(F.sum(_disc_price())).alias("revenue"))
    )


@query(
    "tpch_q20_excess_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'red%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > 40)
      AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shape: the nested semi-join chain — suppliers in one region
    who moved excess volume of a part class (availqty analog: >40 units
    of one red part in 1997). Two stacked IN-subqueries become two
    left-semi joins over a pre-aggregated bridge."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    bulky = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    asia_nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == 2
    ).select("n_nationkey")
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(asia_nations), s.s_nationkey == asia_nations.n_nationkey, "left_semi")
        .join(bulky, s.s_suppkey == bulky.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shape: suppliers whose line was the last shipped in a
    multi-supplier finalized order (receiptdate analog: shipdate).

    Scale rewrite: the EXISTS / NOT-EXISTS pair is decorrelated into one
    (orderkey, suppkey) aggregation plus an orderkey window computing,
    per supplier, the max shipdate over the OTHER suppliers' lines
    (top-1 vs top-2 trick: it's the order max unless this supplier alone
    holds the max, in which case it's the runner-up). One shuffle on
    orderkey replaces two correlated probes per lineitem row."""
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey, "left_semi")
    per_os = l1.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max")
    )
    w = Window.partitionBy("l_orderkey")
    ranked = (
        per_os.withColumn("n_supp", F.count("*").over(w))
        .withColumn("m1", F.max("supp_max").over(w))
        .withColumn(
            "cnt_at_m1",
            F.sum(
                F.when(F.col("supp_max") == F.col("m1"), 1).otherwise(0)
            ).over(w),
        )
        .withColumn(
            "m2",
            F.max(
                F.when(F.col("supp_max") < F.col("m1"), F.col("supp_max"))
            ).over(w),
        )
    )
    other_max = F.when(
        (F.col("supp_max") < F.col("m1")) | (F.col("cnt_at_m1") >= 2), F.col("m1")
    ).otherwise(F.col("m2"))
    cand = (
        ranked.filter(F.col("n_supp") > 1)
        .withColumn("other_max", other_max)
        .select("l_orderkey", "l_suppkey", "other_max")
    )
    waiting = l1.join(
        cand,
        ["l_orderkey", "l_suppkey"],
    ).filter(F.col("l_shipdate") >= F.col("other_max"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "tpch_q22_idle_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           FLOOR(SUM(c_acctbal) * 100.0 + 0.5) / 100.0 AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-07-01')
    GROUP BY c_mktsegment
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shape: above-average-balance customers gone idle (no order in
    the trailing ~13 months; phone-prefix analog: c_mktsegment). The
    scalar AVG subquery broadcasts as a single-row cross join; the NOT
    EXISTS is a left-anti join on the filtered orders."""
    c = load_table(spark, sf_dir, "customer")
    pos_avg = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            roundn(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               SUM(l_extendedprice * (1 - l_discount)) AS value_raw
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 2
        GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey,
           FLOOR(value_raw * 100.0 + 0.5) / 100.0 AS part_value
    FROM pv
    WHERE value_raw > (SELECT SUM(value_raw) * 0.001 FROM pv)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shape: parts carrying an outsized share of one region's
    traded value (ps_supplycost·ps_availqty analog: lineitem revenue
    through region-2 suppliers). The HAVING-against-global-fraction is a
    single-row aggregate broadcast back over the grouped set — the
    grouped relation is computed once and reused for both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("value_raw"))
    )
    threshold = pv.agg((F.sum("value_raw") * 0.001).alias("cutoff"))
    return (
        pv.crossJoin(F.broadcast(threshold))
        .filter(F.col("value_raw") > F.col("cutoff"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            roundn(F.col("value_raw")).alias("part_value"),
        )
    )
