"""Recommender wave: item-item collaborative filtering (cosine kNN).

`market_basket` (plans/analytics4.py) mines BASKET-level association
(support/confidence/lift within one order). This wave adds the other
classic recommender primitive — Sarwar et al.'s item-based
collaborative filtering — at CUSTOMER level: two brands are similar
when the same customers buy both, scored by cosine over binary
customer-incidence vectors, and each item reports its top-5 neighbors.

    cos(a, b) = |C_a ∩ C_b| / sqrt(|C_a| · |C_b|)

100 TB scale: the item-pair space is generated through the
per-customer self-join (the standard item-CF bound — fan-out is
Σ_c |items(c)|², bounded by the per-customer distinct-item cap, never
|items|²) and the part dim broadcasts onto the lineitem fact. Top-5
per item is a per-group window limit (WindowGroupLimit below the
shuffle), not a global sort. All counts are exact integers; the single
sqrt/divide is the identical expression both engines round at
projection, and neighbor ranking orders by the UNROUNDED cosine (both
engines compute the same double) with the neighbor id as the exact
tiebreak.

Reference parity: readme:10's "business-ready tables for analytics" —
the curated-tier workload a merchandising/recommendation consumer runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: neighbors reported per item
_TOP_N = 5


@query(
    "recsys_item_knn",
    oracle=f"""
    WITH v AS (
        SELECT DISTINCT o.o_custkey AS c, p.p_brand AS brand
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey),
    item AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_cust
             FROM v GROUP BY 1),
    co AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS co_n
        FROM v a JOIN v b ON a.c = b.c AND a.brand < b.brand
        GROUP BY 1, 2),
    sym AS (
        SELECT brand_a AS item, brand_b AS neighbor, co_n FROM co
        UNION ALL
        SELECT brand_b AS item, brand_a AS neighbor, co_n FROM co),
    scored AS (
        SELECT s.item, s.neighbor, s.co_n,
               s.co_n / SQRT(ia.n_cust * 1.0e0 * ib.n_cust) AS cos_raw
        FROM sym s
        JOIN item ia ON ia.brand = s.item
        JOIN item ib ON ib.brand = s.neighbor),
    ranked AS (
        SELECT item, neighbor, co_n, cos_raw,
               row_number() OVER (PARTITION BY item
                                  ORDER BY cos_raw DESC, neighbor) AS rnk
        FROM scored)
    SELECT item, neighbor, co_n,
           {sql_roundn("cos_raw", 6)} AS cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_TOP_N}
    ORDER BY item, rnk
    """,
)
def recsys_item_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based CF: top-5 cosine neighbors per brand over binary
    customer-incidence vectors; pair counts via the per-customer
    self-join, dims broadcast, per-item window limit."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    v = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("c"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    # consumed by the item counts AND both self-join sides — build once
    v = v.localCheckpoint(eager=False)
    item = v.groupBy("brand").agg(F.count("*").alias("n_cust"))
    a, b = v.alias("a"), v.alias("b")
    co = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count("*").alias("co_n"))
    )
    sym = co.select(
        F.col("brand_a").alias("item"),
        F.col("brand_b").alias("neighbor"),
        "co_n",
    ).unionAll(
        co.select(
            F.col("brand_b").alias("item"),
            F.col("brand_a").alias("neighbor"),
            "co_n",
        )
    )
    ia = item.select(
        F.col("brand").alias("item"), F.col("n_cust").alias("na")
    )
    ib = item.select(
        F.col("brand").alias("neighbor"), F.col("n_cust").alias("nb")
    )
    scored = (
        sym.join(F.broadcast(ia), "item")
        .join(F.broadcast(ib), "neighbor")
        .withColumn(
            "cos_raw",
            F.col("co_n") / F.sqrt(F.col("na") * F.lit(1.0) * F.col("nb")),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cos_raw"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP_N)
        .select(
            "item",
            "neighbor",
            "co_n",
            roundn(F.col("cos_raw"), 6).alias("cosine"),
            "rnk",
        )
        .orderBy("item", "rnk")
    )
