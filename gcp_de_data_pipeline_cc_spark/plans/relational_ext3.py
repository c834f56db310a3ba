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


@query(
    "skew_profile",
    oracle="""
    WITH k AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
    SELECT l_suppkey, n,
           FLOOR(n * 100.0 / (SELECT CAST(SUM(n) AS BIGINT) FROM k) * 10000.0
                 + 0.5) / 10000.0 AS pct
    FROM k
    ORDER BY n DESC, l_suppkey
    LIMIT 20
    """,
)
def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: per-key row share, heaviest first —
    the measurement that decides between a plain shuffle join, AQE skew
    split, and explicit salting (plans/scale.join_salted). One groupBy +
    a broadcast single-row total; top-k via TakeOrderedAndProject."""
    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_suppkey").agg(F.count("*").alias("n"))
    total = k.agg(F.sum("n").alias("tot"))
    return (
        k.crossJoin(F.broadcast(total))
        .select(
            "l_suppkey",
            "n",
            roundn(F.col("n") * 100.0 / F.col("tot"), 4).alias("pct"),
        )
        .orderBy(F.col("n").desc(), "l_suppkey")
        .limit(20)
    )


@query(
    "win_range_time",
    oracle="""
    SELECT event_id, user_id,
           FLOOR(SUM(value) OVER w * 100.0 + 0.5) / 100.0 AS trailing_sum,
           COUNT(*) OVER w AS trailing_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-extension — RANGE (value-based) window frame: per-user trailing
    1-hour aggregate over event time. The frame is anchored on int64
    epoch-micros on BOTH engines so boundary inclusion is bit-identical;
    range frames bound state by time (the batch twin of a streaming
    sliding window), unlike ROWS frames which bound by count."""
    from pyspark.sql import Window

    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        roundn(F.sum("value").over(w)).alias("trailing_sum"),
        F.count("*").over(w).alias("trailing_n"),
    )


@query(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0
               AS pct_rank,
           FLOOR(CUME_DIST() OVER w * 1000000.0 + 0.5) / 1000000.0
               AS cume_d
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-extension — distribution functions: percent_rank and cume_dist
    of account balance within segment (both are pure functions of the
    ordering key, so ties resolve identically on every engine)."""
    from pyspark.sql import Window

    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        roundn(F.percent_rank().over(w), 6).alias("pct_rank"),
        roundn(F.cume_dist().over(w), 6).alias("cume_d"),
    )


@query(
    "seq_gaps",
    oracle="""
    WITH s AS (
        SELECT o_orderkey AS k,
               LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
        FROM orders
        WHERE o_orderstatus = 'F')
    SELECT k + 1 AS gap_start, nxt - 1 AS gap_end, nxt - k - 1 AS gap_len
    FROM s
    WHERE nxt > k + 1
    """,
)
def seq_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection (completeness QC: missing ids in a dense
    key range): neighbor pairs over the ordered keys, emit
    [prev+1, next-1] intervals.  The global order runs TWO-PHASE
    (operators/scale.global_rank: range exchange + per-partition
    row_number + a shuffle-partition-sized offsets relation) and the
    successor is recovered by a rank self-join (rn ↔ rn+1) — the
    band-boundary stitch the old docstring only described; no stage
    single-reducers the keys (sp_audit r5: the bare Window.orderBy
    carried 493→4933 rows across SFs)."""
    from gcp_de_data_pipeline_cc_spark.operators.scale import global_rank

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    ranked = global_rank(
        o.select(F.col("o_orderkey").alias("k")), [F.col("k")], rank_col="rn"
    )
    nxt = ranked.select(
        (F.col("rn") - 1).alias("rn"), F.col("k").alias("nxt")
    )
    # inner join drops the max key — exactly the LEAD() IS NULL row
    s = ranked.join(nxt, "rn")
    return s.filter(F.col("nxt") > F.col("k") + 1).select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col("k") - 1).alias("gap_len"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           COUNT(*) AS n_orders,
           FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5-extension — explicit GROUPING SETS (neither cube nor rollup):
    two independent one-dimension subtotals plus the grand total, with
    GROUPING() markers. One Expand + one shuffle, NOT one scan per set —
    the reason grouping sets beat UNION ALL of separate GROUP BYs at
    100 TB (the fact table is read once)."""
    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.count("*").alias("n_orders"),
        roundn(F.sum("o_totalprice")).alias("sum_price"),
    )


@query(
    "join_full_outer",
    oracle="""
    WITH y1 AS (SELECT o_custkey AS k, COUNT(*) AS n
                FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
                GROUP BY 1),
         y2 AS (SELECT o_custkey AS k, COUNT(*) AS n
                FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
                GROUP BY 1)
    SELECT COALESCE(y1.k, y2.k) AS custkey,
           COALESCE(y1.n, 0) AS n_1997,
           COALESCE(y2.n, 0) AS n_1998,
           CASE WHEN y1.k IS NULL THEN 'new'
                WHEN y2.k IS NULL THEN 'churned'
                ELSE 'retained' END AS cohort
    FROM y1 FULL OUTER JOIN y2 ON y1.k = y2.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-extension — FULL OUTER join: year-over-year customer activity
    with new/churned/retained cohort tagging. Full outer cannot
    broadcast either side (unmatched rows of BOTH must survive), so the
    plan is a shuffle sort-merge join on both aggregated inputs — the
    aggregation-before-join keeps the shuffled sides small at scale."""
    o = load_table(spark, sf_dir, "orders")

    def per_year(year: int, out: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .groupBy(F.col("o_custkey").alias("k"))
            .agg(F.count("*").alias(out))
        )

    y1, y2 = per_year(1997, "n"), per_year(1998, "n")
    return (
        y1.alias("a")
        .join(y2.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
        .select(
            F.coalesce(F.col("a.k"), F.col("b.k")).alias("custkey"),
            F.coalesce(F.col("a.n"), F.lit(0)).alias("n_1997"),
            F.coalesce(F.col("b.n"), F.lit(0)).alias("n_1998"),
            F.when(F.col("a.k").isNull(), "new")
            .when(F.col("b.k").isNull(), "churned")
            .otherwise("retained")
            .alias("cohort"),
        )
    )


@query(
    "unpivot_metrics",
    oracle="""
    WITH m AS (SELECT c_mktsegment,
                      CAST(COUNT(*) AS DOUBLE) AS n_cust,
                      FLOOR(SUM(c_acctbal) * 100.0 + 0.5) / 100.0 AS bal_sum
               FROM customer GROUP BY 1)
    SELECT c_mktsegment, 'n_cust' AS metric, n_cust AS value FROM m
    UNION ALL
    SELECT c_mktsegment, 'bal_sum' AS metric, bal_sum AS value FROM m
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-extension — unpivot/melt (the inverse of agg_pivot): wide
    per-segment metrics to long (segment, metric, value) triples.
    Narrow-side note for scale: unpivot is a per-row Expand (no shuffle);
    melting BEFORE an aggregation multiplies shuffle volume by the
    metric count — aggregate wide, melt last, as here."""
    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    c = load_table(spark, sf_dir, "customer")
    m = c.groupBy("c_mktsegment").agg(
        F.count("*").cast("double").alias("n_cust"),
        roundn(F.sum("c_acctbal")).alias("bal_sum"),
    )
    return m.unpivot("c_mktsegment", ["n_cust", "bal_sum"], "metric", "value")


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS total_price
    FROM orders
    WHERE o_totalprice > 200000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-extension — parameterized SQL (named-marker binding, Spark
    3.4+): the injection-safe templating surface for the reference's
    config-driven queries (`dags/config/pipeline_config.yaml` thresholds
    are string-formatted into BigQuery SQL,
    `dags/pipeline_orchestration_dag.py:183-199` — the classic quoting
    bug factory). Markers bind as literal expressions BEFORE analysis,
    so constant folding and parquet filter pushdown see the final
    values — zero plan-quality cost vs inlined literals."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_param")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               FLOOR(SUM(o_totalprice) * 100.0e0 + 0.5e0) / 100.0e0 AS total_price
        FROM orders_param
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 200000.0, "status": "O"},
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           json_extract_string(props, '$.missing') AS missing_str,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 = 0 AS k_round
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7-extension — the VARIANT type (Spark 4.0 semi-structured
    binary encoding): `parse_json` once into an open-schema value, then
    typed `variant_get` path extraction — the schema-on-read upgrade
    over per-path `get_json_object` string re-parsing (one parse, typed
    access, pushdown-friendly binary layout; the representation Delta /
    Iceberg v3 adopt for semi-structured columns). A missing path
    returns NULL instead of erroring — the open-schema contract.

    Scale: parse cost is paid once per row regardless of path count;
    with N extracted paths the old string route re-parses N times."""
    from gcp_de_data_pipeline_cc_spark.catalog import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.missing", "string").alias("missing_str"),
        (F.variant_get(v, "$.k", "int") % 10 == 0).alias("k_round"),
    )
