"""Second analytics wave: the TPC-H shapes exercising decorrelated
scalar subqueries (Q17), HAVING over grouped facts (Q18), nation-pair
volume (Q7), plus SCD1 upsert and a dynamic-partition-pruning join."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.scratch import scratch_dir
from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn
from gcp_de_data_pipeline_cc_spark.operators.merge import scd1_upsert
from gcp_de_data_pipeline_cc_spark.plans.curation import _SNAP_SQL, _snapshots
from gcp_de_data_pipeline_cc_spark.plans.registry import query


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           FLOOR(SUM(l_extendedprice) / 7.0 * 100.0 + 0.5) / 100.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pk = l_partkey
    WHERE l_quantity < qty_threshold
    GROUP BY p_brand
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shape: revenue from below-average-quantity line items.

    The correlated scalar subquery (per-part average) is decorrelated
    into an aggregate + join — the plan Catalyst produces for the
    subquery form anyway, written explicitly so the shuffle story is
    visible. Quantities are integral doubles, so the per-part averages
    are bit-identical across engines and the threshold comparison is
    exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .groupBy("p_brand")
        .agg(roundn(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           FLOOR(SUM(l_quantity) * 100.0 + 0.5) / 100.0 AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    HAVING SUM(l_quantity) > 150
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shape: large-volume orders via HAVING over the grouped fact
    (integral quantities → exact threshold)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
        .select(
            "c_custkey", "o_orderkey", "o_orderdate",
            roundn(F.col("_qty")).alias("total_qty"),
        )
    )


@query(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS l_year,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shape: shipping volume between a nation pair per year — the
    double-role dimension pattern (nation joined twice under different
    aliases)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            roundn(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@query(
    "scd1_upsert",
    oracle=f"""
    WITH {_SNAP_SQL}
    SELECT COALESCE(s2.cust_id, s1.cust_id) AS cust_id,
           CASE WHEN s2.cust_id IS NOT NULL THEN s2.name ELSE s1.name END AS name,
           CASE WHEN s2.cust_id IS NOT NULL THEN s2.segment ELSE s1.segment END AS segment,
           CASE WHEN s2.cust_id IS NOT NULL THEN s2.acct_cents ELSE s1.acct_cents END AS acct_cents
    FROM s1 FULL OUTER JOIN s2 ON s1.cust_id = s2.cust_id
    """,
)
def scd1_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 1 upsert (MERGE-INTO semantics, no history): day-2
    snapshot rows replace matching day-1 rows wholesale, arrivals insert,
    unmatched targets survive — the dimension-maintenance mode the
    reference's overwrite-per-run tiers approximate."""
    s1, s2 = _snapshots(spark, sf_dir)
    return scd1_upsert(s1, s2, ["cust_id"])


@query(
    "join_partition_pruned",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_orders,
           FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS year_value
    FROM orders
    WHERE YEAR(o_orderdate) >= 2000
    GROUP BY 1
    """,
)
def join_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact is laid out partitioned by
    year; joining it with a *filtered* dimension prunes partitions at
    runtime (the DPP subquery broadcasts the surviving years to the
    fact's scan). Result equals the plain filtered aggregate — the
    oracle; the `dynamicpruning` plan shape is asserted in tests.

    This is the partition-layout story for the 100 TB fact: ingest-date
    partitioning (op S6) makes every time-bounded query prune at the
    file-listing level.
    """
    o = load_table(spark, sf_dir, "orders")
    tmp = scratch_dir("dpp_orders")
    (
        o.withColumn("order_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(tmp)
    )
    fact = spark.read.parquet(tmp)
    years = (
        o.select(F.year("o_orderdate").alias("y")).distinct()
        .filter(F.col("y") >= 2000)
    )
    return (
        fact.join(years, fact.order_year == years.y)
        .groupBy(F.col("order_year").cast("int").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            roundn(F.sum("o_totalprice")).alias("year_value"),
        )
    )
