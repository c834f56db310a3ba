"""Privacy tier: k-anonymity audit, l-diversity audit, and
hierarchy-based generalization.

A training-data pipeline that exports curated tables (the reference's
curation tier, dags/pipeline_orchestration_dag.py:101-143, feeding
"business-ready tables" per readme:10) owes its consumers a
re-identification audit before release — the pipeline-side counterpart
of the PII scan/mask keys (`pii_scan`, `fn_mask`):

- **privacy_k_anonymity** — Sweeney's k-anonymity over the
  quasi-identifier (nation, market segment): a release is k-anonymous
  iff every QI equivalence class holds ≥ k individuals. Output is the
  per-class census with the k=5 verdict;
- **privacy_l_diversity** — Machanavalli et al.'s refinement: a
  k-anonymous class still leaks if the sensitive attribute (here the
  joined order priority) is near-constant within it. Output counts
  distinct sensitive values per class with the l=3 verdict;
- **privacy_generalize** — the algorithmic step the audits motivate:
  ascend the QI generalization hierarchy (nation → region → '*') until
  each class reaches k, i.e. the bottom rungs of a Samarati/Incognito
  lattice walk, evaluated level-by-level with no per-row iteration.

100 TB scale: each audit is one hash aggregate over the dimension
(map-side partials; QI-class cardinality is bounded by the QI domain,
here ≤ 125 classes, so the shuffle carries class states, not rows).
`privacy_l_diversity` broadcasts the customer dim onto the orders fact
— the fact never shuffles. `privacy_generalize` re-aggregates CLASS
STATES (already ≤ |QI domain| rows) per lattice level, so ascending the
hierarchy costs nothing at data scale; rows are only touched once.

Float discipline: counts are exact integers; no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: k-anonymity threshold — every released QI class must hold ≥ K people
_K = 5

#: l-diversity threshold — ≥ L distinct sensitive values per class
_L = 3


@query(
    "privacy_k_anonymity",
    oracle=f"""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS class_n,
           COUNT(*) >= {_K} AS is_k_anon
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-QI-class census with the k=5 verdict (k-anonymity audit).

    One broadcast dim join (nation is 25 rows) + one hash aggregate;
    the class census is bounded by the QI domain, never by row count.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("class_n"))
        .withColumn("is_k_anon", F.col("class_n") >= _K)
        .orderBy("nation", "segment")
    )


@query(
    "privacy_l_diversity",
    oracle=f"""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l_distinct,
           COUNT(DISTINCT o.o_orderpriority) >= {_L} AS is_l_diverse
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l diversity of the sensitive attribute (order priority)
    within each QI class.

    The fact (orders) takes two BROADCAST dim joins and one aggregate —
    it never shuffles rows, and the distinct-count state per class is
    bounded by the sensitive domain (5 priorities).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("l_distinct"),
        )
        .withColumn("is_l_diverse", F.col("l_distinct") >= _L)
        .orderBy("nation", "segment")
    )


@query(
    "privacy_generalize",
    oracle=f"""
    WITH base AS (
        SELECT n.n_name AS nation, r.r_name AS region,
               c.c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2, 3),
    lvl1 AS (
        SELECT region, segment, CAST(SUM(n) AS BIGINT) AS region_n
        FROM base GROUP BY 1, 2)
    SELECT b.nation, b.segment,
           CASE WHEN b.n >= {_K} THEN 'nation'
                WHEN l.region_n >= {_K} THEN 'region'
                ELSE 'suppressed' END AS level,
           CASE WHEN b.n >= {_K} THEN b.nation
                WHEN l.region_n >= {_K} THEN b.region
                ELSE '*' END AS released_cell,
           CASE WHEN b.n >= {_K} THEN b.n
                WHEN l.region_n >= {_K} THEN l.region_n
                ELSE CAST(0 AS BIGINT) END AS cell_n
    FROM base b JOIN lvl1 l
      ON b.region = l.region AND b.segment = l.segment
    ORDER BY b.nation, b.segment
    """,
)
def privacy_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom rungs of the generalization lattice: each (nation,
    segment) class that fails k=5 is generalized along the geography
    hierarchy to (region, segment); classes still below k are
    suppressed ('*').

    The level-1 walk re-aggregates the LEVEL-0 CLASS STATES (≤ |QI
    domain| rows), not the data — exactly how Incognito prunes the
    lattice — so adding hierarchy levels costs nothing at 100 TB. The
    level-0/level-1 join is class-table × class-table (both tiny,
    broadcast).
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("n"))
    )
    # level-0 class states feed BOTH the level-1 rollup and the final
    # join — materialize the tiny (≤ |QI domain|) table once instead of
    # re-running the dim joins (plan-census diamond rule)
    base = base.localCheckpoint(eager=False)
    lvl1 = base.groupBy("region", "segment").agg(
        F.sum("n").alias("region_n")
    )
    k = F.lit(_K)
    joined = base.join(F.broadcast(lvl1), ["region", "segment"])
    return joined.select(
        "nation",
        "segment",
        F.when(F.col("n") >= k, F.lit("nation"))
        .when(F.col("region_n") >= k, F.lit("region"))
        .otherwise(F.lit("suppressed"))
        .alias("level"),
        F.when(F.col("n") >= k, F.col("nation"))
        .when(F.col("region_n") >= k, F.col("region"))
        .otherwise(F.lit("*"))
        .alias("released_cell"),
        F.when(F.col("n") >= k, F.col("n"))
        .when(F.col("region_n") >= k, F.col("region_n"))
        .otherwise(F.lit(0).cast("long"))
        .alias("cell_n"),
    ).orderBy("nation", "segment")
