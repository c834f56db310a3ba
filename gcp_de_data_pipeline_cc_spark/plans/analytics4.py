"""Retail-analytics wave 4: market-basket affinity, RFM segmentation,
and new-vs-returning acquisition accounting.

Three classic warehouse workloads the reference's curated tier feeds
(readme:10 "business-ready tables for analytics"; the staging→curation
tier of dags/pipeline_orchestration_dag.py:101-143) that the catalog
didn't yet cover:

- **market_basket** — association mining over order contents: pairwise
  brand co-occurrence with support / confidence / lift. The recommender
  and assortment-planning primitive;
- **rfm_segments** — recency/frequency/monetary quintile scoring per
  customer, the standing CRM segmentation;
- **cohort_new_returning** — per month, orders and volume split by
  whether the customer is in their acquisition month — the growth
  dashboard's topline (cohort_retention's triangle is the drill-down).

Float discipline: supports/confidences/lifts are ratios of exact
integer counts, computed by the identical double expression and rounded
at projection; money aggregates run in integer cents; quintile scores
come from row_number over a total order (metric, custkey) — exact and
engine-portable where ntile/percentile boundaries are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.operators.scale import global_rank
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: a brand pair must co-occur in this many orders to be reported
_MIN_SUP = 10

#: how many top-lift pairs the basket report returns
_TOP_PAIRS = 50


@query(
    "market_basket",
    oracle=f"""
    WITH tx AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM tx),
    item AS (
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM tx GROUP BY 1),
    pair AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS n_pair
        FROM tx a JOIN tx b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_MIN_SUP})
    SELECT brand_a, brand_b, n_pair,
           {sql_roundn("n_pair * 1.0e0 / n.n_orders", 6)} AS support,
           {sql_roundn("n_pair * 1.0e0 / ia.n_item", 6)} AS conf_a_to_b,
           {sql_roundn("n_pair * 1.0e0 / ib.n_item", 6)} AS conf_b_to_a,
           {sql_roundn(
               "n_pair * 1.0e0 * n.n_orders / (ia.n_item * ib.n_item)", 6
           )} AS lift
    FROM pair
    JOIN item ia ON pair.brand_a = ia.p_brand
    JOIN item ib ON pair.brand_b = ib.p_brand
    CROSS JOIN n
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT {_TOP_PAIRS}
    """,
)
def market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension — market-basket association mining: distinct brands
    per order, pairwise co-occurrence with a minimum-support floor, and
    support / directional confidence / lift per surviving pair, top-K
    by lift. Lift > 1 = brands bought together beyond chance — the
    cross-sell signal.

    100 TB: a STRICT one-pass design. One shuffle builds per-order
    baskets (collect_set over orderkey, map-side combined); each basket
    then emits, in a single narrow explode, (a) one sentinel element
    counting the basket, (b) each brand twice — tagged left and right —
    for the item supports, and (c) candidate pairs generated inside the
    sorted array (Σ C(|basket|,2), bounded by basket SIZE, with
    brand_a < brand_b canonical for free). ONE groupBy counts all of
    them together into a ≤(1+2·|brands|+|brands|²)-row relation, and
    the support/total lookups the lift needs become window aggregates
    over that tiny relation — no diamond: a join-based formulation
    re-executes the fact scan once per consumer (measured: 4 scans in
    the executed plan, warm 4.0 s at sf0.1 vs 2.8 s and ONE scan for
    this shape), because Spark reuses identical exchanges, not
    arbitrary shared subtrees. The final top-K is TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
    )
    # pair expansion inside the sorted basket array: bs[i-1] with every
    # later element; '' tags (never a brand value) mark the sentinel
    # and single-brand bookkeeping rows that ride the same aggregation
    mk = lambda a, b: F.struct(a.alias("brand_a"), b.alias("brand_b"))
    empty = F.lit("")
    elements = F.concat(
        F.array(mk(empty, empty)),
        F.transform(F.col("bs"), lambda x: mk(x, empty)),
        F.transform(F.col("bs"), lambda x: mk(empty, x)),
        F.flatten(
            F.transform(
                # sequence(1, 0) DESCENDS for 1-brand baskets — filter
                # to the valid index range instead of a row-level guard
                F.filter(
                    F.sequence(F.lit(1), F.size("bs") - 1),
                    lambda i: (i >= 1) & (i <= F.size("bs") - 1),
                ),
                lambda i: F.transform(
                    F.slice(F.col("bs"), i + 1, F.size("bs") - i),
                    lambda x: mk(F.col("bs")[i - 1], x),
                ),
            )
        ),
    )
    counts = (
        baskets.select(F.explode(elements).alias("p"))
        .groupBy(
            F.col("p.brand_a").alias("brand_a"),
            F.col("p.brand_b").alias("brand_b"),
        )
        .agg(F.count("*").alias("n"))
    )
    is_sentinel = (F.col("brand_a") == "") & (F.col("brand_b") == "")
    is_single_l = (F.col("brand_a") != "") & (F.col("brand_b") == "")
    is_single_r = (F.col("brand_a") == "") & (F.col("brand_b") != "")
    stats = counts.select(
        "brand_a",
        "brand_b",
        "n",
        F.max(F.when(is_sentinel, F.col("n"))).over(
            Window.partitionBy()
        ).alias("n_orders"),
        F.max(F.when(is_single_l, F.col("n"))).over(
            Window.partitionBy("brand_a")
        ).alias("n_a"),
        F.max(F.when(is_single_r, F.col("n"))).over(
            Window.partitionBy("brand_b")
        ).alias("n_b"),
    )
    out = stats.filter(
        (F.col("brand_a") != "")
        & (F.col("brand_b") != "")
        & (F.col("n") >= _MIN_SUP)
    ).select(
        "brand_a",
        "brand_b",
        F.col("n").alias("n_pair"),
        roundn(F.col("n") * F.lit(1.0) / F.col("n_orders"), 6).alias(
            "support"
        ),
        roundn(F.col("n") * F.lit(1.0) / F.col("n_a"), 6).alias(
            "conf_a_to_b"
        ),
        roundn(F.col("n") * F.lit(1.0) / F.col("n_b"), 6).alias(
            "conf_b_to_a"
        ),
        roundn(
            F.col("n")
            * F.lit(1.0)
            * F.col("n_orders")
            / (F.col("n_a") * F.col("n_b")),
            6,
        ).alias("lift"),
    )
    return out.orderBy(
        F.desc("lift"), "brand_a", "brand_b"
    ).limit(_TOP_PAIRS)


def _quintile_sql(metric_order: str) -> str:
    """1..5 score from row_number over a deterministic total order.

    Explicit FLOOR on both engines: DuckDB's ``/`` on integers is float
    division and its double→BIGINT cast rounds half-even, while Spark's
    cast truncates — FLOOR of the (exact-in-double) ratio is identical
    everywhere.
    """
    return (
        "CAST(1 + FLOOR((ROW_NUMBER() OVER (ORDER BY "
        + metric_order
        + ") - 1) * 5.0e0 / COUNT(*) OVER ()) AS BIGINT)"
    )


@query(
    "rfm_segments",
    oracle=f"""
    WITH anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    per_cust AS (
        SELECT o_custkey AS c_custkey,
               CAST(DATE_DIFF('day', MAX(o_orderdate),
                              (SELECT mx FROM anchor)) AS BIGINT)
                   AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                             AS BIGINT)) AS BIGINT) AS monetary_cents
        FROM orders GROUP BY 1),
    scored AS (
        SELECT c_custkey, recency_days, frequency, monetary_cents,
               {_quintile_sql("recency_days ASC, c_custkey ASC")} AS r_score,
               {_quintile_sql("frequency DESC, c_custkey ASC")} AS f_score,
               {_quintile_sql("monetary_cents DESC, c_custkey ASC")} AS m_score
        FROM per_cust)
    SELECT c_custkey, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
               AS rfm_code
    FROM scored
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension — RFM customer segmentation: days since last order
    (vs the warehouse's anchor date), order count, and lifetime value in
    exact cents, each scored into balanced quintiles (5 = best), and
    the three digits packed into the classic RFM code.

    Quintiles come from ``row_number`` over (metric, custkey) — a total
    order, so the cut is exact and identical on any engine; ntile or
    interpolated-percentile thresholds can flip a score across engines
    when a value sits on a boundary.

    100 TB: the per-customer rollup reduces orders to customer
    cardinality first (map-side combined); each scoring rank uses
    operators/scale.global_rank — two-phase distributed ranking (range
    exchange + per-partition window + broadcast offsets), so the
    customer-cardinality relation is never sorted in one reducer. The
    anchor is a one-row broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(cents).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "c_custkey",
            F.datediff(F.col("mx"), F.col("last_order"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )

    per_cust = per_cust.localCheckpoint(eager=False)  # 3 rank passes + n
    n_total = per_cust.agg(F.count("*").alias("n"))

    def quintile_ranked(df, order_cols, score_name):
        ranked = global_rank(df, order_cols, rank_col="__grn")
        return ranked.withColumn(
            score_name,
            (
                1
                + F.floor(
                    (F.col("__grn") - 1) * F.lit(5.0) / F.col("__n")
                )
            ).cast("long"),
        ).drop("__grn")

    scored = per_cust.crossJoin(
        F.broadcast(n_total.select(F.col("n").alias("__n")))
    )
    scored = quintile_ranked(
        scored, [F.asc("recency_days"), F.asc("c_custkey")], "r_score"
    )
    scored = quintile_ranked(
        scored, [F.desc("frequency"), F.asc("c_custkey")], "f_score"
    )
    scored = quintile_ranked(
        scored, [F.desc("monetary_cents"), F.asc("c_custkey")], "m_score"
    )
    scored = scored.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
    )
    return scored.withColumn(
        "rfm_code",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("long"),
    )


@query(
    "cohort_new_returning",
    oracle="""
    WITH first_m AS (
        SELECT o_custkey,
               MIN(DATE_TRUNC('month', o_orderdate)) AS m0
        FROM orders GROUP BY 1),
    tagged AS (
        SELECT CAST(DATE_TRUNC('month', o.o_orderdate) AS TIMESTAMP)
                   AS month,
               (DATE_TRUNC('month', o.o_orderdate) = f.m0) AS is_new,
               o.o_custkey,
               CAST(FLOOR(o.o_totalprice * 100.0e0 + 0.5e0) AS BIGINT)
                   AS cents
        FROM orders o JOIN first_m f USING (o_custkey))
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new_orders,
           CAST(COUNT(DISTINCT CASE WHEN is_new THEN o_custkey END)
                AS BIGINT) AS n_new_customers,
           CAST(SUM(CASE WHEN is_new THEN cents ELSE 0 END) AS BIGINT)
               AS new_revenue_cents,
           CAST(SUM(CASE WHEN is_new THEN 0 ELSE cents END) AS BIGINT)
               AS returning_revenue_cents
    FROM tagged
    GROUP BY month
    """,
)
def cohort_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension — acquisition split: per order month, how many
    orders (and how much revenue, in exact cents) came from customers
    in their FIRST month vs returning customers, plus the count of
    newly acquired customers. The growth topline; cohort_retention's
    triangle is the same first-month key drilled by age.

    100 TB: the first-month relation is a per-customer MIN — customer
    cardinality, map-side combined, broadcast back into the order scan
    (dimension-vs-fact asymmetry); the month rollup then map-side
    combines to a few hundred rows. Revenue stays in int64 cents so
    every sum is order-independent.
    """
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    first_m = orders.groupBy("o_custkey").agg(
        F.min(month).alias("m0")
    )
    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    tagged = (
        orders.join(F.broadcast(first_m), "o_custkey")
        .select(
            month.cast("timestamp").alias("month"),
            (month == F.col("m0")).alias("is_new"),
            "o_custkey",
            cents.alias("cents"),
        )
    )
    is_new = F.col("is_new")
    return tagged.groupBy("month").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(is_new, 1).otherwise(0)).alias("n_new_orders"),
        F.countDistinct(
            F.when(is_new, F.col("o_custkey"))
        ).alias("n_new_customers"),
        F.sum(F.when(is_new, F.col("cents")).otherwise(0)).alias(
            "new_revenue_cents"
        ),
        F.sum(F.when(is_new, 0).otherwise(F.col("cents"))).alias(
            "returning_revenue_cents"
        ),
    )

# ---------------------------------------------------------------------------
# 2D skyline / Pareto front (r3o wave)
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = f"""
WITH p AS (
    SELECT p_brand, p_partkey,
           CAST(FLOOR(p_retailprice * 100.0e0 + 0.5e0) AS BIGINT)
               AS price_cents,
           CAST(p_size AS BIGINT) AS size
    FROM part),
w AS (
    SELECT p_brand, p_partkey, price_cents, size,
           MAX(size) OVER (
               PARTITION BY p_brand ORDER BY price_cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS m_strict,
           MAX(size) OVER (
               PARTITION BY p_brand ORDER BY price_cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS m_all
    FROM p)
SELECT p_brand, p_partkey, price_cents, size
FROM w
WHERE COALESCE(m_strict, -1) < size AND m_all <= size
ORDER BY p_brand, price_cents, p_partkey
"""


@query("skyline_pareto_front", oracle=_SKYLINE_ORACLE)
def skyline_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand 2D skyline (Pareto front) over parts: keep every part
    for which no same-brand part is both cheaper-or-equal AND
    larger-or-equal with at least one strict — the classic
    multi-criteria "best tradeoffs" operator (cheapest price vs
    largest size). The assortment/value-engineering primitive next to
    rfm_segments and market_basket.

    Spark-first: NOT the textbook O(n²) dominance self-join — after
    sorting by price, a part is dominated iff a strictly-cheaper row
    reaches its size (RANGE-frame running max through 1 PRECEDING) or
    a tied-price row strictly exceeds it (running max through CURRENT
    ROW, which in RANGE frames spans the full tie group). Two
    value-RANGE windows over one sort = O(n log n), and RANGE frames
    make the result independent of intra-tie row order —
    engine-exact. All arithmetic is integer (floor-form cents, BIGINT
    size); equal (price, size) pairs do not dominate each other, so
    both survive — the window form preserves that law.

    100 TB: the windows are PARTITIONED by brand, so the sort is a
    hash-distributed partial sort, never a single-partition global
    window. For an unpartitioned skyline at scale, run this same
    window per hash partition (local skyline), then once over the
    ≤front-sized survivors — the standard two-phase merge; the
    per-group form here IS that building block."""
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_brand",
        "p_partkey",
        F.floor(F.col("p_retailprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    w_strict = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        p.withColumn("m_strict", F.max("size").over(w_strict))
        .withColumn("m_all", F.max("size").over(w_all))
        .filter(
            (F.coalesce(F.col("m_strict"), F.lit(-1)) < F.col("size"))
            & (F.col("m_all") <= F.col("size"))
        )
        .select("p_brand", "p_partkey", "price_cents", "size")
        .orderBy("p_brand", "price_cents", "p_partkey")
    )

# ---------------------------------------------------------------------------
# global skyline, two-phase (r3v wave)
# ---------------------------------------------------------------------------

_SKY2_ORACLE = f"""
WITH p AS (
    SELECT p_partkey,
           CAST(FLOOR(p_retailprice * 100.0e0 + 0.5e0) AS BIGINT)
               AS price_cents,
           CAST(p_size AS BIGINT) AS size
    FROM part),
w AS (
    SELECT p_partkey, price_cents, size,
           MAX(size) OVER (ORDER BY price_cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS m_strict,
           MAX(size) OVER (ORDER BY price_cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS m_all
    FROM p)
SELECT p_partkey, price_cents, size
FROM w
WHERE COALESCE(m_strict, -1) < size AND m_all <= size
ORDER BY price_cents, p_partkey
"""


@query("skyline_global_twophase", oracle=_SKY2_ORACLE)
def skyline_global_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL 2D skyline computed the way a 1000-executor cluster must:
    phase 1 runs the value-RANGE skyline window PARTITIONED by brand
    (hash-distributed — skyline_pareto_front's plan), phase 2 re-runs
    the same window UNPARTITIONED over only the per-group survivors.
    Correct because a globally non-dominated point is necessarily
    non-dominated within its group, so global-front ⊆ union of local
    fronts — the standard divide-and-conquer skyline law. The oracle
    computes the DIRECT global skyline in one pass, so the differential
    check proves two-phase == direct, not just engine parity.

    The phase-2 window is single-partition BY DESIGN: its input is
    front-sized (Σ per-group fronts — hundreds of rows when the raw
    table has billions), which is the entire point of the pattern; the
    raw data only ever sees the distributed phase-1 window.

    Exactness: same all-integer dominance arithmetic as
    skyline_pareto_front; equal (price, size) pairs co-survive."""
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_brand",
        "p_partkey",
        F.floor(F.col("p_retailprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )

    def front(df, partition_cols):
        base = Window.partitionBy(*partition_cols) if partition_cols \
            else Window.partitionBy()
        ws = base.orderBy("price_cents").rangeBetween(
            Window.unboundedPreceding, -1
        )
        wa = base.orderBy("price_cents").rangeBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            df.withColumn("m_strict", F.max("size").over(ws))
            .withColumn("m_all", F.max("size").over(wa))
            .filter(
                (F.coalesce(F.col("m_strict"), F.lit(-1)) < F.col("size"))
                & (F.col("m_all") <= F.col("size"))
            )
            .drop("m_strict", "m_all")
        )

    local = front(p, ["p_brand"])     # distributed phase over raw rows
    global_front = front(local, [])   # front-sized single-partition pass
    return global_front.select(
        "p_partkey", "price_cents", "size"
    ).orderBy("price_cents", "p_partkey")

# ---------------------------------------------------------------------------
# share-of-parent rollup (r3y wave)
# ---------------------------------------------------------------------------

_SOP_ORACLE = f"""
WITH rev AS (
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0e0 + 0.5e0)
                         AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2),
reg AS (
    SELECT region, CAST(SUM(cents) AS BIGINT) AS cents
    FROM rev GROUP BY 1),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS cents FROM reg)
SELECT CAST(0 AS BIGINT) AS lvl, 'TOTAL' AS region, 'ALL' AS nation,
       tot.cents AS rev_cents,
       {sql_roundn("1.0e0", 6)} AS share_of_parent
FROM tot
UNION ALL
SELECT 1, reg.region, 'ALL', reg.cents,
       {sql_roundn("reg.cents * 1.0e0 / tot.cents", 6)}
FROM reg, tot
UNION ALL
SELECT 2, rev.region, rev.nation, rev.cents,
       {sql_roundn("rev.cents * 1.0e0 / reg.cents", 6)}
FROM rev JOIN reg ON reg.region = rev.region
ORDER BY lvl, region, nation
"""


@query("rollup_share_of_parent", oracle=_SOP_ORACLE)
def rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARE-OF-PARENT rollup — the BI hierarchy readout agg_rollup's
    raw subtotals stop short of: revenue at each level of the
    region → nation hierarchy with every row's share of its PARENT
    level (nation/region, region/total, total/itself ≡ 1). What a
    drill-down dashboard renders as "% of parent" per row — the
    contribution question the flat rollup makes the reader compute.

    Exactness: revenue aggregates in exact integer cents; shares are
    single identical-tree divisions of exact ints; per-level
    conservation (children sum to 1 within every parent) is the tested
    law.

    100 TB: one fact scan with broadcast dims builds the finest level
    (map-side combined); the two coarser levels REUSE it (25-row and
    5-row aggregates — never a second fact scan); parent joins are
    broadcast. The tall union-of-levels shape is a deliberate
    alternative to GROUPING SETS (agg_grouping_sets): it lets each
    level carry the parent-ratio column, which grouping-set rows
    cannot see without a second window pass."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    cents = F.floor(
        F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    rev = (
        li.join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(cents).alias("cents"))
    )
    rev = rev.localCheckpoint(eager=False)  # finest level feeds all three
    reg = rev.groupBy("region").agg(F.sum("cents").alias("cents"))
    reg = reg.localCheckpoint(eager=False)  # level rows + parent join
    tot = reg.agg(F.sum("cents").alias("cents"))
    one = F.lit(1.0)
    l0 = tot.select(
        F.lit(0).cast("long").alias("lvl"),
        F.lit("TOTAL").alias("region"),
        F.lit("ALL").alias("nation"),
        F.col("cents").alias("rev_cents"),
        roundn(one, 6).alias("share_of_parent"),
    )
    l1 = reg.crossJoin(
        F.broadcast(tot.select(F.col("cents").alias("tot_cents")))
    ).select(
        F.lit(1).cast("long").alias("lvl"),
        "region",
        F.lit("ALL").alias("nation"),
        F.col("cents").alias("rev_cents"),
        roundn(F.col("cents") * one / F.col("tot_cents"), 6).alias(
            "share_of_parent"
        ),
    )
    l2 = rev.join(
        F.broadcast(
            reg.select("region", F.col("cents").alias("reg_cents"))
        ),
        "region",
    ).select(
        F.lit(2).cast("long").alias("lvl"),
        "region",
        "nation",
        F.col("cents").alias("rev_cents"),
        roundn(F.col("cents") * one / F.col("reg_cents"), 6).alias(
            "share_of_parent"
        ),
    )
    return l0.unionAll(l1).unionAll(l2).orderBy("lvl", "region", "nation")

# ---------------------------------------------------------------------------
# frequent triple itemsets (r3z wave)
# ---------------------------------------------------------------------------

_MB3_MIN_SUPPORT = 5
_MB3_TOP = 15

_MB3_ORACLE = f"""
WITH tx AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM tx),
sup AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS c FROM tx GROUP BY 1),
tri AS (
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, c.p_brand AS brand_c,
           CAST(COUNT(*) AS BIGINT) AS n_abc
    FROM tx a
    JOIN tx b ON b.l_orderkey = a.l_orderkey AND a.p_brand < b.p_brand
    JOIN tx c ON c.l_orderkey = a.l_orderkey AND b.p_brand < c.p_brand
    GROUP BY 1, 2, 3
    HAVING COUNT(*) >= {_MB3_MIN_SUPPORT}),
scored AS (
    SELECT tri.brand_a, tri.brand_b, tri.brand_c, tri.n_abc,
           nb.n,
           tri.n_abc * 1.0e0 * nb.n * nb.n
               / (sa.c * 1.0e0 * sb.c * sc.c) AS lift3
    FROM tri
    JOIN sup sa ON sa.p_brand = tri.brand_a
    JOIN sup sb ON sb.p_brand = tri.brand_b
    JOIN sup sc ON sc.p_brand = tri.brand_c, nb)
SELECT brand_a, brand_b, brand_c, n_abc,
       FLOOR(n_abc * 1.0e0 / n * 1000000.0e0 + 0.5e0) / 1000000.0e0
           AS support,
       FLOOR(lift3 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS lift3
FROM scored
ORDER BY lift3 DESC, brand_a, brand_b, brand_c
LIMIT {_MB3_TOP}
"""


@query("market_basket_triples", oracle=_MB3_ORACLE)
def market_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension — frequent 3-ITEMSETS: the a-priori level above
    market_basket's pairs. Candidate triples are generated INSIDE each
    sorted basket array (ΣC(|basket|,3), bounded by basket width ≤
    brand count — never the |brands|³ cross space), floored at support
    ≥{m}, and scored with the 3-way lift n_abc·N²/(c_a·c_b·c_c) —
    lift > 1 = the triple co-occurs beyond independence, the
    bundle-recommendation signal a pair analysis can't see (three
    pairwise-lifted brands can still be a random triple).

    The oracle deliberately takes the OTHER algorithm — a three-way
    distinct-transaction self-join — so the differential proves the
    in-array generation enumerates exactly the canonical a<b<c triples,
    not merely that two copies of one plan agree.

    Exactness: counts are ints, support/lift are identical-tree
    divisions (N² and c-products lifted to doubles before multiplying
    — c_a·c_b·c_c overflows int64 at warehouse scale), 6-dp
    floor-rounded; ordering ties break lexicographically.

    100 TB: one shuffle builds baskets (map-side combined collect_set);
    the triple explode is narrow; item supports ride the SAME basket
    relation (no second fact scan); the final heap is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    tx = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    tx = tx.localCheckpoint(eager=False)  # baskets + supports + total
    baskets = tx.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("p_brand")).alias("bs")
    )
    n = F.size("bs")
    triples = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.flatten(
                F.transform(
                    F.sequence(i + 1, n - 1),
                    lambda j: F.transform(
                        F.sequence(j + 1, n),
                        lambda k: F.struct(
                            F.col("bs")[i - 1].alias("brand_a"),
                            F.col("bs")[j - 1].alias("brand_b"),
                            F.col("bs")[k - 1].alias("brand_c"),
                        ),
                    ),
                )
            ),
        )
    )
    tri = (
        baskets.filter(n >= 3)
        .select(F.explode(triples).alias("t"))
        .groupBy("t.brand_a", "t.brand_b", "t.brand_c")
        .agg(F.count("*").alias("n_abc"))
        .filter(F.col("n_abc") >= _MB3_MIN_SUPPORT)
    )
    sup = tx.groupBy("p_brand").agg(F.count("*").alias("c"))
    nb = tx.agg(F.countDistinct("l_orderkey").alias("n"))
    one = F.lit(1.0)
    scored = (
        tri.join(
            F.broadcast(sup.select(F.col("p_brand").alias("brand_a"),
                                   F.col("c").alias("ca"))),
            "brand_a",
        )
        .join(
            F.broadcast(sup.select(F.col("p_brand").alias("brand_b"),
                                   F.col("c").alias("cb"))),
            "brand_b",
        )
        .join(
            F.broadcast(sup.select(F.col("p_brand").alias("brand_c"),
                                   F.col("c").alias("cc"))),
            "brand_c",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "brand_a",
            "brand_b",
            "brand_c",
            "n_abc",
            "n",
            (
                F.col("n_abc") * one * F.col("n") * F.col("n")
                / (F.col("ca") * one * F.col("cb") * F.col("cc"))
            ).alias("lift_raw"),
        )
    )
    return (
        scored.orderBy(
            F.desc("lift_raw"), "brand_a", "brand_b", "brand_c"
        )
        .limit(_MB3_TOP)
        .select(
            "brand_a",
            "brand_b",
            "brand_c",
            "n_abc",
            roundn(F.col("n_abc") * one / F.col("n"), 6).alias("support"),
            roundn(F.col("lift_raw"), 6).alias("lift3"),
        )
    )


market_basket_triples.__doc__ = market_basket_triples.__doc__.format(
    m=_MB3_MIN_SUPPORT
)

# ---------------------------------------------------------------------------
# Lorenz concentration curve (r4e wave)
# ---------------------------------------------------------------------------

_LORENZ_ORACLE = f"""
WITH pc AS (
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS tot FROM pc),
r AS (
    SELECT cents,
           ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rn,
           SUM(cents) OVER (ORDER BY cents, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM pc),
b AS (
    SELECT (10 * rn + t.n - 1) // t.n AS decile, rn, cum
    FROM r, t),
agg AS (
    SELECT decile, MAX(rn) AS cum_cust, MAX(cum) AS cum_cents
    FROM b GROUP BY decile)
SELECT CAST(agg.decile AS BIGINT) AS decile,
       CAST(agg.cum_cust AS BIGINT) AS cum_customers,
       CAST(agg.cum_cents AS BIGINT) AS cum_cents,
       {sql_roundn("agg.cum_cust * 1.0e0 / t.n", 6)} AS pop_share,
       {sql_roundn("agg.cum_cents * 1.0e0 / t.tot", 6)} AS revenue_share
FROM agg, t
ORDER BY decile
"""


@query("agg_lorenz_curve", oracle=_LORENZ_ORACLE)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ concentration curve of customer lifetime spend — the
    drill-down behind agg_gini's single coefficient and
    pareto_concentration's one 80/20 point: customers sorted poorest
    to richest, cumulative revenue share at each population decile.
    Reading row 9 says "the bottom 90% of customers carry X% of
    revenue"; the gap to the diagonal is the inequality a dashboard
    actually shows.

    Exactness: spend in integer cents; the decile of rank rn is the
    exact integer ceil(10·rn/n) = (10·rn + n − 1)//n; cumulative sums
    ride a total-order window (cents, custkey); shares are final
    identical-tree divisions. Monotonicity and the Lorenz-below-
    diagonal law are tested.

    100 TB: per-customer rollup is map-side combined; the global rank
    and running sum use operators/scale.global_rank — two-phase
    distributed ranking (range exchange + per-partition window +
    broadcast offsets), so NO single-reducer sort touches the
    entity-sized relation at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    pc = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
                "long"
            )
        ).alias("cents")
    )
    pc = pc.localCheckpoint(eager=False)  # totals + ranked consumers
    t = pc.agg(F.count("*").alias("n"), F.sum("cents").alias("tot"))
    r = global_rank(
        pc,
        [F.asc("cents"), F.asc("o_custkey")],
        rank_col="rn",
        cumsum_col="cum",
        value_col="cents",
    ).select("cents", "rn", "cum")
    one = F.lit(1.0)
    return (
        r.crossJoin(F.broadcast(t))
        .select(
            ((10 * F.col("rn") + F.col("n") - 1) / F.col("n"))
            .cast("long")
            .alias("decile"),
            "rn",
            "cum",
            "n",
            "tot",
        )
        .groupBy("decile", "n", "tot")
        .agg(
            F.max("rn").cast("long").alias("cum_customers"),
            F.max("cum").alias("cum_cents"),
        )
        .select(
            "decile",
            "cum_customers",
            "cum_cents",
            roundn(F.col("cum_customers") * one / F.col("n"), 6).alias(
                "pop_share"
            ),
            roundn(F.col("cum_cents") * one / F.col("tot"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("decile")
    )

# ---------------------------------------------------------------------------
# top-N + OTHER rollup (r4h wave)
# ---------------------------------------------------------------------------

_TNO_N = 5

_TNO_ORACLE = f"""
WITH rev AS (
    SELECT p.p_brand AS brand,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0e0 + 0.5e0)
                         AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot FROM rev),
r AS (
    SELECT brand, cents,
           ROW_NUMBER() OVER (ORDER BY cents DESC, brand) AS rnk
    FROM rev),
top_ AS (
    SELECT CAST(rnk AS BIGINT) AS rnk, brand, cents FROM r
    WHERE rnk <= {_TNO_N}),
oth AS (
    SELECT CAST({_TNO_N + 1} AS BIGINT) AS rnk, 'OTHER' AS brand,
           CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS cents
    FROM r WHERE rnk > {_TNO_N}),
u AS (SELECT * FROM top_ UNION ALL SELECT * FROM oth)
SELECT u.rnk, u.brand, u.cents,
       {sql_roundn("u.cents * 1.0e0 / t.tot", 6)} AS revenue_share
FROM u, t
ORDER BY u.rnk
"""


@query("agg_topn_other", oracle=_TNO_ORACLE)
def agg_topn_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-N + OTHER rollup — the chart-ready readout every BI surface
    wants and plain top-k silently gets wrong: the top {n} brands by
    revenue PLUS an 'OTHER' row absorbing the remainder, so the rows
    CONSERVE the total (Σ shares = 1 exactly — the tested law) instead
    of dropping the long tail. topk_global truncates; this one
    accounts.

    Exactness: revenue in integer cents; ranks break ties on brand;
    the OTHER row is an exact integer complement (COALESCE'd to 0 when
    N covers everything); shares divide once, identical-tree.

    100 TB: one fact scan with a broadcast dim; the rank window runs
    over the brand-cardinality table (group-sized, not fact-sized);
    OTHER is one filtered aggregate of the same tiny table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)
                ).cast("long")
            ).alias("cents")
        )
    )
    rev = rev.localCheckpoint(eager=False)  # rank + total consumers
    t = rev.agg(F.sum("cents").alias("tot"))
    r = rev.select(
        "brand",
        "cents",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("brand")))
        .alias("rnk"),
    )
    r = r.localCheckpoint(eager=False)  # top + other consumers
    top = r.filter(F.col("rnk") <= _TNO_N).select(
        F.col("rnk").cast("long").alias("rnk"), "brand", "cents"
    )
    oth = r.filter(F.col("rnk") > _TNO_N).agg(
        F.lit(_TNO_N + 1).cast("long").alias("rnk"),
        F.lit("OTHER").alias("brand"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"),
    )
    one = F.lit(1.0)
    return (
        top.unionAll(oth)
        .crossJoin(F.broadcast(t))
        .select(
            "rnk",
            "brand",
            "cents",
            roundn(F.col("cents") * one / F.col("tot"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("rnk")
    )


agg_topn_other.__doc__ = agg_topn_other.__doc__.format(n=_TNO_N)


# --------------------------------------------------------------------------
# agg_hhi — Herfindahl-Hirschman market concentration
# --------------------------------------------------------------------------


@query(
    "agg_hhi",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nationkey, o.o_custkey,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0e0 + 0.5e0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
    shares AS (
        SELECT nationkey, o_custkey,
               (cents * 1000000)
                   // CAST(SUM(cents) OVER (PARTITION BY nationkey)
                           AS BIGINT) AS s_ppm
        FROM rev),
    h AS (
        SELECT nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_firms,
               CAST(SUM(s_ppm * s_ppm) AS BIGINT) AS hhi_q
        FROM shares GROUP BY 1)
    SELECT n.n_name AS nation, h.n_firms,
           CAST(h.hhi_q AS DOUBLE) / 1000000000000.0e0 AS hhi,
           CASE WHEN h.n_firms = 1 THEN 1.0e0
                ELSE FLOOR((CAST(h.hhi_q AS DOUBLE) / 1000000000000.0e0
                            - 1.0e0 / CAST(h.n_firms AS DOUBLE))
                           / (1.0e0 - 1.0e0 / CAST(h.n_firms AS DOUBLE))
                           * 1000000.0e0 + 0.5e0) / 1000000.0e0
           END AS hhi_normalized,
           FLOOR(1000000000000.0e0 / CAST(h.hhi_q AS DOUBLE)
                 * 10000.0e0 + 0.5e0) / 10000.0e0 AS effective_n,
           CASE WHEN CAST(h.hhi_q AS DOUBLE) / 1000000000000.0e0
                     < 0.15e0 THEN 'competitive'
                WHEN CAST(h.hhi_q AS DOUBLE) / 1000000000000.0e0
                     < 0.25e0 THEN 'moderate'
                ELSE 'concentrated' END AS doj_band
    FROM h JOIN nation n ON n.n_nationkey = h.nationkey
    ORDER BY nation
    """,
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration tier — HERFINDAHL-HIRSCHMAN INDEX of order revenue
    per nation (how concentrated is each market across its customers),
    with the DOJ merger-guideline bands, the normalized HHI
    ((H − 1/N)/(1 − 1/N) — comparable across different firm counts),
    and the effective competitor count 1/H.  Completes the inequality
    suite: `agg_gini`/`agg_lorenz_curve` measure the DISTRIBUTION'S
    skew, `pareto_concentration` its top-heavy mass; HHI is the
    antitrust-standard sum-of-squared-shares.

    Exactness: per-customer shares floor-quantize to integer ppm
    BEFORE squaring (s·s ≤ 1e12 and Σs_ppm ≤ 1e6 bound the squared sum
    by 1e12 — no overflow at ANY firm count); HHI_q is an exact int64
    sum; the normalized/effective readouts are fixed scalar trees on
    it, quantized at final projection.

    100 TB: one (nation, customer) rollup off the fact join, one
    nation-partitioned window for totals, then nation-grain algebra
    with the broadcast nation dim.

    Reference parity: the reference's curated tier aggregates revenue
    per dimension (`dags/pipeline_orchestration_dag.py:178-208`);
    concentration is the follow-on question every market rollup gets.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"), F.col("o_custkey")
        )
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    shares = rev.select(
        "nationkey",
        F.expr(
            "CAST((cents * 1000000) DIV SUM(cents)"
            " OVER (PARTITION BY nationkey) AS BIGINT)"
        ).alias("s_ppm"),
    )
    h = shares.groupBy("nationkey").agg(
        F.count("*").cast("long").alias("n_firms"),
        F.sum(F.col("s_ppm") * F.col("s_ppm")).cast("long").alias("hhi_q"),
    )
    hd = F.col("hhi_q").cast("double") / F.lit(1.0e12)
    nf = F.col("n_firms").cast("double")
    return (
        h.join(F.broadcast(nation), h.nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "n_firms",
            hd.alias("hhi"),
            F.when(F.col("n_firms") == 1, F.lit(1.0))
            .otherwise(
                roundn((hd - 1 / nf) / (F.lit(1.0) - 1 / nf), 6)
            )
            .alias("hhi_normalized"),
            roundn(F.lit(1.0e12) / F.col("hhi_q").cast("double"), 4).alias(
                "effective_n"
            ),
            F.when(hd < 0.15, "competitive")
            .when(hd < 0.25, "moderate")
            .otherwise("concentrated")
            .alias("doj_band"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# agg_decay_weighted — dyadic time-decay weighted revenue
# --------------------------------------------------------------------------

#: half-life in days: weight halves every week of age (dyadic, so the
#: weighted terms are exact integer halvings — no libm pow anywhere)
_DECAY_HALF_DAYS = 7


@query(
    "agg_decay_weighted",
    oracle=f"""
    WITH mx AS (
        SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
    aged AS (
        SELECT c.c_nationkey AS nationkey,
               CAST(datediff('day', CAST(o.o_orderdate AS DATE), mx.dmax)
                    // {_DECAY_HALF_DAYS} AS BIGINT) AS k,
               CAST(FLOOR(o.o_totalprice * 100.0e0 + 0.5e0) AS BIGINT)
                   AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey, mx),
    perk AS (
        SELECT nationkey, k,
               CAST(SUM(cents) AS BIGINT) AS sub
        FROM aged GROUP BY 1, 2),
    terms AS (
        SELECT nationkey, sub,
               CASE WHEN k >= 57 THEN CAST(0 AS BIGINT)
                    ELSE (sub * 100) // (CAST(1 AS BIGINT) << k)
               END AS term_q
        FROM perk),
    agg AS (
        SELECT nationkey,
               CAST(SUM(sub) AS BIGINT) AS total_cents,
               CAST(SUM(term_q) AS BIGINT) AS decayed_q
        FROM terms GROUP BY nationkey)
    SELECT n.n_name AS nation,
           a.total_cents,
           CAST(a.decayed_q AS DOUBLE) / 100.0e0 AS decayed_cents,
           FLOOR(CAST(a.decayed_q AS DOUBLE) / 100.0e0
                 / CAST(a.total_cents AS DOUBLE) * 1000000.0e0 + 0.5e0)
               / 1000000.0e0 AS recency_share
    FROM agg a JOIN nation n ON n.n_nationkey = a.nationkey
    ORDER BY nation
    """,
)
def agg_decay_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoring tier — TIME-DECAY WEIGHTED AGGREGATION: revenue per
    nation where each order's contribution HALVES per {h}-day week of
    age (exponential decay, the standard recency weighting behind
    trending/popularity scores and churn features) — beside the
    undecayed total, plus ``recency_share`` = decayed/total, the
    "how current is this market's revenue" verdict `rfm_segments`
    reads per customer.

    Exactness — NO libm pow: the half-life is dyadic, so weight 2^−k
    is applied as one integer division by a SHIFTED constant
    ((sub·100) DIV (1<<k)), per (nation, age-bucket) subtotal, floor
    at centi-cent precision; ages ≥ 57 half-lives zero exactly
    (2⁵⁷·100 > int64 — the guard is itself the overflow proof).  The
    cross-bucket sum is an exact int64 sum of quantized terms —
    summation order cannot drift it.

    100 TB: the decisive move is aggregating to (nation, k) SUBTOTALS
    map-side BEFORE weighting — the weighted combine runs on
    |nations|·|age buckets| rows, not the fact table; one broadcast
    dim join; the max-date scalar is a one-row broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    mx = orders.agg(F.max(F.to_date("o_orderdate")).alias("dmax"))
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    aged = (
        orders.crossJoin(F.broadcast(mx))
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.expr(
                "CAST(datediff(dmax, to_date(o_orderdate))"
                f" DIV {_DECAY_HALF_DAYS} AS BIGINT)"
            ).alias("k"),
            cents.alias("cents"),
        )
    )
    perk = aged.groupBy("nationkey", "k").agg(
        F.sum("cents").cast("long").alias("sub")
    )
    term = F.when(F.col("k") >= 57, F.lit(0).cast("long")).otherwise(
        F.expr("(sub * 100) DIV SHIFTLEFT(CAST(1 AS BIGINT), CAST(k AS INT))")
    )
    agg = perk.select("nationkey", "sub", term.alias("term_q")).groupBy(
        "nationkey"
    ).agg(
        F.sum("sub").cast("long").alias("total_cents"),
        F.sum("term_q").cast("long").alias("decayed_q"),
    )
    return (
        agg.join(
            F.broadcast(nation),
            agg.nationkey == nation.n_nationkey,
        )
        .select(
            F.col("n_name").alias("nation"),
            "total_cents",
            (F.col("decayed_q").cast("double") / F.lit(100.0)).alias(
                "decayed_cents"
            ),
            roundn(
                F.col("decayed_q").cast("double")
                / F.lit(100.0)
                / F.col("total_cents").cast("double"),
                6,
            ).alias("recency_share"),
        )
        .orderBy("nation")
    )


agg_decay_weighted.__doc__ = agg_decay_weighted.__doc__.format(
    h=_DECAY_HALF_DAYS
)
