"""SQL-surface wave 6: DISTINCT ON dialect mapping, printf/format
functions, and correlated scalar subqueries.

Rounds out the Spark-4 dialect tier (relational_ext3-5: variant,
parameterized SQL, recursive CTE, pipe syntax, SQL UDF, collation,
NOT-IN null semantics) with three surfaces migrating SQL hits
constantly:

- ``DISTINCT ON`` — Postgres/DuckDB's pick-one-row-per-key shorthand,
  absent from Spark SQL; the registered plan IS the mechanical rewrite
  (row_number + filter) a porting guide prescribes;
- C-style ``printf`` formatting — identical format-string semantics on
  both engines for integer conversions (float conversions differ at
  rounding boundaries between Java HALF_UP and C round-to-even, so the
  catalog formats exact integers only);
- correlated scalar subqueries — the per-row aggregate lookup Spark
  plans as a de-correlated aggregate + join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans.registry import query


@query(
    "sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (user_id)
           user_id, event_id, ts, event_type
    FROM events
    ORDER BY user_id, ts DESC, event_id DESC
    """,
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialect mapping — Postgres/DuckDB ``DISTINCT ON (k) ... ORDER BY
    k, o`` (keep the first row per key under the sort) has no Spark SQL
    spelling; this plan is the canonical rewrite: row_number() over
    (partition by k order by o) = 1. Registered so the engines' parity
    is *checked*, not assumed — the oracle runs real DISTINCT ON, the
    Spark side runs the rewrite, and the driver hashes both.

    100 TB: one window shuffle on the key; Spark 3.5+ collapses the
    rank-then-filter into WindowGroupLimit (top-1 per key retained
    during the shuffle, not after), so the rewrite is not just
    equivalent but cheap."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@query(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           printf('%08d', o_orderkey) AS fmt_padded,
           printf('%d cents', CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                                   AS BIGINT)) AS fmt_cents,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '*') AS fmt_lpad,
           upper(to_hex(o_orderkey)) AS fmt_hex
    FROM orders
    WHERE o_orderkey <= 200
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-extension — printf-style output formatting: zero-padded ids,
    exact-integer money rendering (floor-rounded cents, so no float
    conversion ever reaches the formatter), lpad report alignment, and
    hex rendering. Formatting only uses integer conversions because
    that's the cross-engine-exact subset: Java's %f rounds HALF_UP where
    C printf rounds half-to-even, a real divergence the docstring
    records rather than papers over.

    100 TB: pure narrow projections in whole-stage codegen; the filter
    prunes at the parquet scan."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    return orders.filter(F.col("o_orderkey") <= 200).select(
        "o_orderkey",
        F.format_string("%08d", "o_orderkey").alias("fmt_padded"),
        F.format_string("%d cents", cents).alias("fmt_cents"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "*").alias("fmt_lpad"),
        F.upper(F.hex("o_orderkey")).alias("fmt_hex"),
    )


@query(
    "sql_correlated_scalar",
    oracle="""
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_above_nation_avg
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY c.c_nationkey
    """,
)
def sql_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface — correlated scalar subquery in a predicate: count
    customers whose balance beats their own nation's average. Catalyst
    de-correlates this into an aggregate-then-join (RewriteCorrelatedScalarSubquery),
    which is exactly the hand-written plan — registered via the SQL text
    so the de-correlation path itself is what's exercised.

    100 TB: the de-correlated aggregate is |nation|-sized and
    broadcasts; one scan of customer feeds both sides under exchange
    reuse. The predicate compares against an average of doubles —
    exact-equality collisions (where engine summation order could flip
    >) are measure-zero and absent from this fixture."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_corr"
    )
    return spark.sql("""
        SELECT c.c_nationkey,
               COUNT(*) AS n_above_nation_avg
        FROM customer_corr c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer_corr c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c.c_nationkey
    """)
