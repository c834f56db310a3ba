"""Fourth coverage wave: map/JSON-structure functions and regular
expression extraction (completing F1/F7 in SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans.registry import query


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — JSON payload as a MapType column: parse once with from_json,
    then map_keys/size/element_at — the schema-free variant of the typed
    from_json struct path (json_extract). Scalar projections only: map
    iteration order is engine-specific, so keys are sorted+joined."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           regexp_matches(c_name, '[0-9]') AS has_digits,
           CAST(len(regexp_split_to_array(c_name, '[#_-]')) AS INT) AS n_parts
    FROM customer
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — regular-expression suite: capture-group extraction, match
    test, regex split (patterns restricted to the class-based subset
    where Java and RE2 semantics coincide)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.col("c_name").rlike("[0-9]").alias("has_digits"),
        F.size(F.split("c_name", "[#_-]")).alias("n_parts"),
    )


@query(
    "join_nullsafe",
    oracle="""
    WITH y1 AS (
        SELECT NULLIF(o_orderstatus, 'P') AS status_n, COUNT(*) AS n_1997
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1),
    y2 AS (
        SELECT NULLIF(o_orderstatus, 'P') AS status_n, COUNT(*) AS n_1998
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY 1)
    SELECT y1.status_n, n_1997, n_1998
    FROM y1 JOIN y2 ON y1.status_n IS NOT DISTINCT FROM y2.status_n
    """,
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-extension — null-safe equality join (`<=>` / IS NOT DISTINCT
    FROM): year-over-year status counts where the NULL bucket (statuses
    suppressed via NULLIF) must match itself instead of disappearing —
    the behavior plain equi-joins silently get wrong."""
    o = load_table(spark, sf_dir, "orders")

    def per_year(y, out):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .groupBy(F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_n"))
            .agg(F.count("*").alias(out))
        )

    y1, y2 = per_year(1997, "n_1997"), per_year(1998, "n_1998")
    return (
        y1.join(y2, y1["status_n"].eqNullSafe(y2["status_n"]))
        .select(y1["status_n"], "n_1997", "n_1998")
    )
