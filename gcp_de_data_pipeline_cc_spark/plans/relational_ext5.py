"""Coverage wave: tolerance-bounded as-of join, outer/positional
explode, struct operations, and NOT-IN null semantics.

Rounds out the join tier (staleness-bounded enrichment — the feature-
store lookup contract), the F8 generator tier (posexplode/explode_outer
— the array-flattening variants the plain explode drops rows on), the
F7 type tier (STRUCT construction / field access / whole-value
equality), and the SQL-semantics tier (three-valued NOT IN — the classic
silent-empty-result bug — beside its NOT EXISTS fix).

Reference parity: the reference's external dbt/Dataflow transforms are
free to use any of this standard warehouse surface
(dags/config/pipeline_config.yaml:64-90); each query is oracle-checked
against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: staleness bound for the tolerance as-of join: 30 minutes, in micros
_TOL_US = 30 * 60 * 1_000_000


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH probes AS (
        SELECT event_id AS probe_id, user_id, ts
        FROM events WHERE event_type = 'purchase'),
    refs AS (
        SELECT event_id AS ref_id, user_id, ts AS ref_ts
        FROM events WHERE event_type = 'error')
    SELECT p.probe_id, p.user_id,
           CASE WHEN r.ref_ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(r.ref_ts) <= {_TOL_US}
                THEN r.ref_id END AS ref_id,
           CASE WHEN r.ref_ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(r.ref_ts) <= {_TOL_US}
                THEN epoch_us(p.ts) - epoch_us(r.ref_ts) END AS gap_us
    FROM probes p
    ASOF LEFT JOIN refs r
      ON p.user_id = r.user_id AND p.ts >= r.ref_ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7-extension — as-of join with a staleness tolerance: each
    purchase enriched with the same user's most recent error at-or-before
    it, but only if that error is ≤ 30 minutes old — older matches null
    out. This is the feature-store lookup contract (pandas
    ``merge_asof(tolerance=...)``): a stale feature is worse than no
    feature.

    Spark-first plan: the same union-window formulation as
    join_asof_event (ONE shuffle on user_id, ``last(ignorenulls)`` over
    the ordered running frame), with the tolerance applied as a
    post-projection null-out — the match search itself stays
    unbounded-preceding, so no extra shuffle or range probe. Oracle:
    DuckDB's native ASOF LEFT JOIN plus the same CASE.

    100 TB: cost identical to the plain as-of join — one sort-shuffle of
    |refs|+|probes|; the tolerance is a codegen branch, not a plan
    change.
    """
    ev = load_table(spark, sf_dir, "events")
    refs = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.struct(
            F.col("event_id").alias("ref_id"), F.col("ts").alias("ref_ts")
        ).alias("ref"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("bigint").alias("probe_id"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None)
        .cast("struct<ref_id:bigint,ref_ts:timestamp>")
        .alias("ref"),
        F.lit(1).alias("is_probe"),
        F.col("event_id").alias("probe_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = refs.unionByName(probes).withColumn(
        "nearest", F.last("ref", ignorenulls=True).over(w)
    )
    gap = F.unix_micros("ts") - F.unix_micros("nearest.ref_ts")
    in_tol = F.col("nearest").isNotNull() & (gap <= F.lit(_TOL_US))
    return tagged.filter(F.col("is_probe") == 1).select(
        "probe_id",
        "user_id",
        F.when(in_tol, F.col("nearest.ref_id")).alias("ref_id"),
        F.when(in_tol, gap).alias("gap_us"),
    )


@query(
    "fn_explode_outer",
    oracle="""
    WITH base AS (
        SELECT vec_id,
               CASE WHEN vec_id % 10 = 0 THEN []
                    ELSE embedding[1:3] END AS arr
        FROM embeddings),
    ex AS (
        SELECT vec_id,
               CAST(generate_subscripts(arr, 1) - 1 AS INT) AS pos,
               UNNEST(arr) AS val
        FROM base WHERE len(arr) > 0),
    empt AS (
        SELECT vec_id, CAST(NULL AS INT) AS pos, CAST(NULL AS FLOAT) AS val
        FROM base WHERE len(arr) = 0)
    SELECT vec_id, pos, val FROM ex
    UNION ALL
    SELECT vec_id, pos, val FROM empt
    """,
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8-completion — positional outer explode: flatten an array with
    its element index (posexplode), KEEPING rows whose array is empty as
    a single null row (outer semantics). Plain explode silently drops
    empty-array documents — the bug class this variant exists to avoid
    when downstream joins expect every parent row back. Every 10th
    vector's array is emptied to exercise the outer branch.

    100 TB: explode multiplies rows before any shuffle — project to the
    minimum columns first (here: id + 3-element slice, never the 64-dim
    vector). The oracle reproduces outer semantics as unnest ∪ empties.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.when(
        F.col("vec_id") % 10 == 0, F.array().cast("array<float>")
    ).otherwise(F.slice("embedding", 1, 3))
    base = emb.select("vec_id", arr.alias("arr"))
    return base.select(
        "vec_id", F.posexplode_outer("arr").alias("pos", "val")
    )


@query(
    "fn_struct",
    oracle="""
    WITH s AS (
        SELECT c_custkey,
               struct_pack(nm := c_name, bal := c_acctbal) AS cur,
               struct_pack(nm := c_name,
                           bal := CASE WHEN c_nationkey < 12
                                       THEN c_acctbal
                                       ELSE c_acctbal + 1.0 END) AS probe
        FROM customer)
    SELECT c_custkey,
           cur.nm AS nm,
           cur.bal AS bal,
           cur = probe AS unchanged
    FROM s
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7-completion — STRUCT operations: construction (named fields),
    dotted field access, and whole-value equality. Struct equality is
    the SCD2 change-detection primitive generalized — one comparison
    covers every tracked column, which is why curation merges compare a
    packed struct (or its hash, fn_hash) instead of N columns.

    100 TB: structs are zero-cost column grouping in Tungsten rows — no
    serialization, field access compiles to the underlying column read;
    equality short-circuits per field in codegen.
    """
    c = load_table(spark, sf_dir, "customer")
    cur = F.struct(
        F.col("c_name").alias("nm"), F.col("c_acctbal").alias("bal")
    )
    probe = F.struct(
        F.col("c_name").alias("nm"),
        F.when(F.col("c_nationkey") < 12, F.col("c_acctbal"))
        .otherwise(F.col("c_acctbal") + 1.0)
        .alias("bal"),
    )
    return c.select(
        "c_custkey",
        cur.getField("nm").alias("nm"),
        cur.getField("bal").alias("bal"),
        (cur == probe).alias("unchanged"),
    )


@query(
    "sql_not_in_nulls",
    oracle="""
    SELECT 'not_in_with_null' AS variant, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderstatus NOT IN (SELECT s FROM (VALUES ('P'), (NULL)) t(s))
    UNION ALL
    SELECT 'not_in_no_null', COUNT(*)
    FROM orders WHERE o_orderstatus NOT IN ('P')
    UNION ALL
    SELECT 'not_exists_rewrite', COUNT(*)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM (VALUES ('P'), (NULL)) t(s)
                      WHERE t.s = o.o_orderstatus)
    """,
)
def sql_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-semantics parity — three-valued NOT IN: when the probe set
    contains a NULL, ``x NOT IN (...)`` can never be TRUE (x <> NULL is
    UNKNOWN), so the with-null variant returns zero rows — the classic
    silently-empty anti-join bug in cleansing SQL. Shown beside the
    null-free variant and the NOT EXISTS rewrite, which treats NULL as
    simply non-matching and is the fix every style guide recommends.

    100 TB: Spark plans NOT IN as a null-aware anti join (the null check
    forces a broadcast of the probe set); NOT EXISTS plans as a plain
    left-anti join — cheaper AND semantically what's usually meant.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_nin"
    )
    return spark.sql("""
        SELECT 'not_in_with_null' AS variant, COUNT(*) AS n_orders
        FROM orders_nin
        WHERE o_orderstatus NOT IN (SELECT s FROM (VALUES ('P'), (NULL)) t(s))
        UNION ALL
        SELECT 'not_in_no_null', COUNT(*)
        FROM orders_nin WHERE o_orderstatus NOT IN ('P')
        UNION ALL
        SELECT 'not_exists_rewrite', COUNT(*)
        FROM orders_nin o
        WHERE NOT EXISTS (SELECT 1 FROM (VALUES ('P'), (NULL)) t(s)
                          WHERE t.s = o.o_orderstatus)
    """)


@query(
    "win_count_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events)
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_distinct_types_so_far
    FROM flagged
    """,
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-extension — running COUNT(DISTINCT) over a window, which no
    engine supports directly: each event carries how many distinct event
    types its user has produced up to that moment (the
    feature-engineering "variety so far" signal). The rewrite: flag each
    row that is the FIRST occurrence of its (user, type) pair, then a
    running SUM of flags over the time-ordered per-user window.

    100 TB: two windows over the same user_id partitioning — Catalyst
    plans one sort-shuffle; per-row state is one counter, vs the naive
    collect_set-over-window whose state grows with the distinct count
    per frame. Ties broken by event_id in both windows so the running
    count is deterministic.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    first_w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = ev.withColumn(
        "first_seen",
        F.when(F.row_number().over(first_w) == 1, 1).otherwise(0),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(run_w).cast("bigint").alias(
            "n_distinct_types_so_far"
        ),
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           FLOOR(SUM(l_quantity) * 100.0e0 + 0.5e0) / 100.0e0 AS sum_qty,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100.0e0 + 0.5e0)
               / 100.0e0 AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-extension — SQL pipe syntax (Spark 4.0, SPARK-49555): the Q1
    pricing-summary shape written as a linear `|>` pipeline — each stage
    reads top-to-bottom in execution order instead of the inside-out
    nesting of classic SELECT. Pure parser surface: the analyzed plan is
    IDENTICAL to the ANSI form (the oracle), so pushdown, codegen, and
    every optimizer rule apply unchanged.

    100 TB: zero runtime delta by construction; the value is
    maintainability of long multi-stage transform SQL (the dbt-model
    audience the reference's curation tier serves).
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe"
    )
    return spark.sql("""
        FROM lineitem_pipe
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> AGGREGATE
             FLOOR(SUM(l_quantity) * 100.0e0 + 0.5e0) / 100.0e0 AS sum_qty,
             FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100.0e0 + 0.5e0)
                 / 100.0e0 AS revenue,
             COUNT(*) AS n_rows
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, revenue, n_rows
    """)


@query(
    "sql_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax))
                 * 100.0e0 + 0.5e0) / 100.0e0 AS charge,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'large' END AS qty_band
    FROM lineitem
    """,
)
def sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11-extension — SQL-defined scalar functions (Spark 4.0 CREATE
    FUNCTION ... RETURN expr): the TPC-H charge expression and a
    quantity-banding rule packaged as named, reusable functions — the
    warehouse's shared business-logic layer (dbt macros) without leaving
    SQL.

    100 TB: SQL UDFs INLINE into the calling plan at analysis time —
    unlike Python UDFs they cost exactly their expression (codegen,
    pushdown-transparent, no serialization boundary). The oracle is the
    hand-inlined equivalent, proving the inlining is semantically exact.
    """
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION li_charge(
            p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE
        RETURN FLOOR((p * (1 - d) * (1 + t)) * 100.0e0 + 0.5e0) / 100.0e0
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN q < 10 THEN 'small'
                    WHEN q < 30 THEN 'mid'
                    ELSE 'large' END
    """)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_sqludf"
    )
    return spark.sql("""
        SELECT l_orderkey, l_linenumber,
               li_charge(l_extendedprice, l_discount, l_tax) AS charge,
               qty_band(l_quantity) AS qty_band
        FROM lineitem_sqludf
    """)


@query(
    "fn_collation",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer)
    SELECT lower(seg) AS segment,
           COUNT(*) AS n_customers,
           CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_variants
    FROM mixed
    GROUP BY lower(seg)
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-extension — string collation (Spark 4.0): case-insensitive
    grouping via ``COLLATE UTF8_LCASE`` on a deliberately case-mixed
    column — the session-standardization step a raw tier needs when
    upstream systems disagree on casing. COUNT(DISTINCT) on the
    UNCOLLATED column inside the collated group counts the case
    variants merged per key.

    100 TB: collation-aware grouping hashes the collation key directly —
    one aggregate, no lower() materialization; unlike wrapping in
    lower(), the collated column keeps its statistics usable for
    pruning. The oracle is the lower()-normalized equivalent.
    """
    c = load_table(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
    ).otherwise(F.lower("c_mktsegment"))
    d = c.select(mixed.alias("seg"))
    return (
        d.groupBy(F.collate("seg", "UTF8_LCASE").alias("k"))
        .agg(
            F.count("*").alias("n_customers"),
            F.countDistinct(F.collate("seg", "UTF8_BINARY")).alias(
                "n_case_variants"
            ),
        )
        .select(
            # the collated key propagates its collation into the output
            # type; cast back to plain UTF8_BINARY string at the boundary
            F.lower("k").cast("string").alias("segment"),
            "n_customers",
            "n_case_variants",
        )
    )


@query(
    "fn_explode_map",
    oracle="""
    SELECT event_id,
           UNNEST(json_keys(props)) AS prop_key,
           CAST(json_extract(props,
                '$.' || UNNEST(json_keys(props))) AS INT) AS prop_value
    FROM events
    """,
)
def fn_explode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8-completion — MapType explode: the JSON payload parsed to a
    map once, then flattened to one (key, value) row per entry — the
    entity-attribute-value normalization of a schemaless property bag
    (how a raw events feed becomes a queryable properties table).

    100 TB: explode multiplies rows by entries-per-map BEFORE any
    shuffle; parse once into a map column (not one from_json per
    accessed key) and project only (id, key, value). Map iteration
    order is engine-specific but the result SET is identical — the
    driver's order-insensitive hash is the right comparator.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.explode(m).alias("prop_key", "prop_value"),
    )


@query(
    "agg_product",
    oracle=f"""
    SELECT l_orderkey,
           COUNT(*) AS n_lines,
           {sql_roundn("product(100 - FLOOR(l_discount * 100.0e0 + 0.5e0))"
                       " / POW(100.0e0, COUNT(*))", 6)}
               AS retained_frac,
           {sql_roundn("1 - product(100 - FLOOR(l_discount * 100.0e0 + 0.5e0))"
                       " / POW(100.0e0, COUNT(*))", 6)}
               AS compound_discount
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension — the PRODUCT aggregate: per-order compounded
    discount retention Π(1 - dᵢ) — the multiplicative fold that shows up
    wherever rates compose (compound interest, survival probabilities,
    independent-event reliability). SUM has first-class SQL support;
    PRODUCT usually gets hand-rolled as exp(sum(ln)) with edge-case bugs
    at zero/negative — both engines here provide it natively.

    Float discipline (the sf0.1 lesson, tests/test_differential_sf01.py):
    multiplying the raw doubles is ORDER-DEPENDENT in the last ulp, and
    decimal-derived discounts make Π land exactly on .xxxxxx5 rounding
    half-points, where that ulp decides the floor — so the product runs
    in exact integer space instead: Π(100 − cents) as integer-valued
    doubles (≤100⁷ < 2⁵³, every partial exact, any order), divided by
    100ⁿ once at the end. Bit-identical across engines by construction.

    100 TB: same partial-aggregation shape as SUM (map-side combinable,
    constant state).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents_kept = F.lit(100) - F.floor(
        F.col("l_discount") * F.lit(100.0) + F.lit(0.5)
    )
    retained = F.product(cents_kept) / F.pow(F.lit(100.0), F.count("*"))
    return li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        roundn(retained, 6).alias("retained_frac"),
        roundn(F.lit(1) - retained, 6).alias("compound_discount"),
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH probes AS (
        SELECT event_id AS probe_id, user_id, ts
        FROM events WHERE event_type = 'signup'),
    refs AS (
        SELECT event_id AS ref_id, user_id, ts AS ref_ts
        FROM events WHERE event_type = 'purchase')
    SELECT p.probe_id, p.user_id,
           r.ref_id AS next_purchase_id,
           CASE WHEN r.ref_ts IS NOT NULL
                THEN epoch_us(r.ref_ts) - epoch_us(p.ts) END AS wait_us
    FROM probes p
    ASOF LEFT JOIN refs r
      ON p.user_id = r.user_id AND p.ts <= r.ref_ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7-extension — FORWARD as-of join: each signup matched to the same
    user's EARLIEST purchase at-or-after it (time-to-convert — the
    mirror of the backward last-touch join). Completes the as-of family:
    backward (join_asof_event), backward + tolerance
    (join_asof_tolerance), forward (this).

    Spark-first plan: the union-window formulation flipped — the window
    frame runs CURRENT ROW → UNBOUNDED FOLLOWING and picks
    ``first(ref, ignorenulls)``; probes sort BEFORE refs on ts ties so
    the inclusive ``<=`` matches DuckDB ASOF. Still one sort-shuffle on
    user_id, no range probe.

    100 TB: identical cost profile to the backward join — direction only
    changes the frame bounds, not the exchange count.
    """
    ev = load_table(spark, sf_dir, "events")
    refs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.struct(
            F.col("event_id").alias("ref_id"), F.col("ts").alias("ref_ts")
        ).alias("ref"),
        F.lit(1).alias("is_ref"),
        F.lit(None).cast("bigint").alias("probe_id"),
    )
    probes = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.lit(None)
        .cast("struct<ref_id:bigint,ref_ts:timestamp>")
        .alias("ref"),
        F.lit(0).alias("is_ref"),
        F.col("event_id").alias("probe_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_ref")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    tagged = refs.unionByName(probes).withColumn(
        "nearest", F.first("ref", ignorenulls=True).over(w)
    )
    wait = F.unix_micros("nearest.ref_ts") - F.unix_micros("ts")
    return tagged.filter(F.col("is_ref") == 0).select(
        "probe_id",
        "user_id",
        F.col("nearest.ref_id").alias("next_purchase_id"),
        F.when(F.col("nearest").isNotNull(), wait).alias("wait_us"),
    )


@query(
    "win_islands",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderkey, o_orderstatus,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                  ORDER BY o_orderdate, o_orderkey) AS rn_s
        FROM orders),
    runs AS (
        SELECT o_custkey, o_orderstatus, rn - rn_s AS island
        FROM seq)
    SELECT o_custkey, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS run_length,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY island, o_orderstatus)
                AS INT) AS run_idx
    FROM runs
    GROUP BY o_custkey, o_orderstatus, island
    """,
)
def win_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-extension — generic gaps-and-islands: consecutive same-status
    runs within each customer's order sequence, via the classic
    row_number difference (global rn − per-status rn is constant within
    a run). The streak/regime-detection primitive behind sessionization
    (stream_session uses the time-gap variant), uptime runs, and
    consecutive-failure alerting.

    100 TB: both row_numbers and the final run aggregation share the
    o_custkey partitioning — one sort-shuffle total; per-run state is a
    counter. The island arithmetic is pure codegen.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w_all = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    w_status = Window.partitionBy("o_custkey", "o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = o.select(
        "o_custkey",
        "o_orderstatus",
        (F.row_number().over(w_all) - F.row_number().over(w_status)).alias(
            "island"
        ),
    )
    runs = seq.groupBy("o_custkey", "o_orderstatus", "island").agg(
        F.count("*").alias("run_length")
    )
    # two runs of different statuses can share an island value;
    # the status tiebreak makes run numbering deterministic
    w_runs = Window.partitionBy("o_custkey").orderBy("island", "o_orderstatus")
    return runs.select(
        "o_custkey",
        "o_orderstatus",
        "run_length",
        F.row_number().over(w_runs).alias("run_idx"),
    )


@query(
    "agg_histogram_log",
    oracle=f"""
    WITH t AS (
        SELECT FLOOR(LOG10(o_totalprice)) AS magnitude
        FROM orders WHERE o_totalprice > 0)
    SELECT CAST(magnitude AS INT) AS magnitude,
           CAST(POW(10.0e0, magnitude) AS DOUBLE) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM t
    GROUP BY magnitude
    """,
)
def agg_histogram_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension — log-scale histogram: order values bucketed by
    decimal magnitude (the heavy-tail profiling view: linear-width
    buckets (histogram_values) waste resolution when values span orders
    of magnitude — payload sizes, token counts, account balances all
    do). Complements skew_profile: that ranks hot KEYS, this shapes the
    VALUE distribution.

    100 TB: floor(log10(x)) is a codegen projection into a ~10-bucket
    groupBy — constant state, map-side combinable, the cheapest possible
    profile of an arbitrarily large fact.
    """
    o = load_table(spark, sf_dir, "orders")
    mag = F.floor(F.log10("o_totalprice"))
    return (
        o.filter(F.col("o_totalprice") > 0)
        .groupBy(mag.cast("int").alias("magnitude"))
        .agg(F.count("*").alias("n_orders"))
        .select(
            "magnitude",
            F.pow(F.lit(10.0), F.col("magnitude")).alias("bucket_lo"),
            "n_orders",
        )
    )


@query(
    "fn_luhn",
    oracle="""
    WITH acct AS (
        SELECT c_custkey,
               lpad(CAST(c_custkey * 37 + 11 AS VARCHAR), 11, '0') AS acct_no
        FROM customer)
    SELECT c_custkey, acct_no,
           list_sum(list_transform(range(1, len(acct_no) + 1),
               i -> CASE WHEN i % 2 = 0
                         THEN CASE WHEN 2 * CAST(acct_no[len(acct_no)-i+1]
                                                 AS INT) > 9
                                   THEN 2 * CAST(acct_no[len(acct_no)-i+1]
                                                 AS INT) - 9
                                   ELSE 2 * CAST(acct_no[len(acct_no)-i+1]
                                                 AS INT) END
                         ELSE CAST(acct_no[len(acct_no)-i+1] AS INT) END))
               % 10 = 0 AS luhn_ok
    FROM acct
    """,
)
def fn_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-extension — Luhn checksum validation (Spark 4.0 luhn_check):
    the card/IMEI/account-number check digit every intake-validation
    tier runs before accepting an identifier — a wrong digit or a
    single transposition fails the mod-10 test. Account numbers are
    synthesized deterministically from customer keys so both engines
    validate the identical strings; the oracle hand-rolls Luhn
    (reversed alternating doubling) since DuckDB has no builtin.

    100 TB: one codegen string pass per row — the same cost class as
    the regex tier (pii_scan); pairs with fn_mask/fn_crypto_roundtrip
    as the validate→redact→encrypt identifier-handling chain.
    """
    c = load_table(spark, sf_dir, "customer")
    acct = F.lpad((F.col("c_custkey") * 37 + 11).cast("string"), 11, "0")
    return c.select(
        "c_custkey",
        acct.alias("acct_no"),
        F.expr("luhn_check(lpad(CAST(c_custkey * 37 + 11 AS STRING), 11, '0'))")
        .alias("luhn_ok"),
    )
