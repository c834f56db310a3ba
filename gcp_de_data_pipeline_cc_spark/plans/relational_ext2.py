"""Third relational coverage wave: window-function depth (ntile,
first/last/nth value), conditional and string suites, CUBE with
GROUPING() — rounding out the curated-reporting function surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query


@query(
    "win_ntile",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(NTILE(4) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
           ) AS INT) AS price_quartile
    FROM orders
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — ntile quartiles per priority class (deterministic via the
    full ordering tiebreak)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderdate) OVER w AS last_orderdate,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-extension — first/last/nth value over the full partition frame
    (explicit ROWS frame: the default frame differs per engine and stops
    at CURRENT ROW, which makes last_value useless)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderdate").over(w).alias("last_orderdate"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           GREATEST(l_quantity, l_discount * 100.0) AS qty_or_disc,
           LEAST(l_tax, l_discount) AS min_rate,
           IFNULL(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4-extension — greatest/least/ifnull/nullif conditional suite."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100.0).alias("qty_or_disc"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("min_rate"),
        F.ifnull(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("flag_or_none"),
    )


@query(
    "fn_string2",
    oracle="""
    SELECT c_custkey,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           RPAD(c_mktsegment, 12, '.') AS segment_padded,
           TRANSLATE(c_name, 'aeiou', 'AEIOU') AS name_vowels,
           REVERSE(c_name) AS name_reversed,
           LEFT(c_name, 4) AS name_left,
           RIGHT(c_name, 3) AS name_right,
           REPEAT('-', 4) AS sep
    FROM customer
    """,
)
def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-extension — padding/translate/reverse/left/right/repeat."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("c_mktsegment", 12, ".").alias("segment_padded"),
        F.translate("c_name", "aeiou", "AEIOU").alias("name_vowels"),
        F.reverse("c_name").alias("name_reversed"),
        F.left(F.col("c_name"), F.lit(4)).alias("name_left"),
        F.right(F.col("c_name"), F.lit(3)).alias("name_right"),
        F.repeat(F.lit("-"), 4).alias("sep"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n_rows,
           FLOOR(SUM(l_quantity) * 100.0 + 0.5) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5-extension — full CUBE with GROUPING() markers distinguishing
    genuine NULL group values from subtotal rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n_rows"),
            roundn(F.sum("l_quantity")).alias("sum_qty"),
        )
    )
