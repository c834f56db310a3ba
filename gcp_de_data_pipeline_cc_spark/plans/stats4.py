"""Round-7 wave: entity-grain rank statistics.

``hypothesis_kendall_knight`` delivers the swap hypothesis_kendall's
docstring only documented: Kendall's τ-b at ENTITY grain (customers,
not the 25-nation profile) via Knight's merge-sort inversion counting
(Knight 1966, "A computer method for calculating Kendall's tau with
ungrouped data") decomposed for a distributed engine — the O(n²) pair
join this replaces is 112M pairs at sf0.1 and impossible at 100 TB.

Reference parity: the reference repo (AdepuAdithya/gcp-de-data-pipeline-cc,
Airflow DAG orchestration — dags/*.py) has no statistics engine; this
derives from the driver's mandate on public algorithms only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.operators.scale import global_rank
from gcp_de_data_pipeline_cc_spark.plans.registry import query

# ---------------------------------------------------------------------------
# hypothesis_kendall_knight
# ---------------------------------------------------------------------------

#: chunk/bucket width of the single-level decomposition (hard size via
#: rank-chunking).  Work: within-chunk merge-sort O(n log C), the
#: cross-chunk same-bucket join O(n·C), and an (n/C)² grid of
#: chunk×bucket prefix sums — C trades the last two (√n optimum →
#: O(n^1.5) total, vs the O(n²) pair join; a production multi-level
#: variant recurses the grid, this single level is the honest
#: demonstration grain)
_KK_C = 512


def _merge_count(a: np.ndarray) -> int:
    """Exact strict-inversion count of ``a`` (#pairs i<j with
    a[i] > a[j]) by bottom-up merge sort — Knight's core step."""
    a = a.astype(np.int64).copy()
    n = len(a)
    inv = 0
    width = 1
    while width < n:
        for lo in range(0, n, 2 * width):
            mid = min(lo + width, n)
            hi = min(lo + 2 * width, n)
            if mid >= hi:
                continue
            left, right = a[lo:mid], a[mid:hi]
            # for each right element: how many left elements exceed it
            pos = np.searchsorted(left, right, side="right")
            inv += int((len(left) - pos).sum())
            a[lo:hi] = np.sort(a[lo:hi], kind="mergesort")
        width *= 2
    return inv


_KENDALL_KNIGHT_ORACLE = """
WITH cust AS (
    SELECT c.c_custkey AS cid,
           CAST(FLOOR(c.c_acctbal * 100.0e0 + 0.5e0) AS BIGINT) AS x,
           CAST(COALESCE(o.spend, 0) AS BIGINT) AS y
    FROM customer c LEFT JOIN (
        SELECT o_custkey,
               SUM(CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT))
                   AS spend
        FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey),
pairs AS (
    SELECT CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                           OR (a.x > b.x AND a.y > b.y)
                         THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                           OR (a.x > b.x AND a.y < b.y)
                         THEN 1 ELSE 0 END) AS BIGINT) AS d,
           CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
                         THEN 1 ELSE 0 END) AS BIGINT) AS tx,
           CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
                         THEN 1 ELSE 0 END) AS BIGINT) AS ty,
           CAST(SUM(CASE WHEN a.x = b.x AND a.y = b.y
                         THEN 1 ELSE 0 END) AS BIGINT) AS txy,
           CAST(COUNT(*) AS BIGINT) AS n0
    FROM cust a JOIN cust b ON a.cid < b.cid)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cust) AS n,
       c AS concordant, d AS discordant, tx AS ties_x, ty AS ties_y,
       FLOOR((c - d) * 1.0e0
             / sqrt(CAST((n0 - tx - txy) AS DOUBLE) * (n0 - ty - txy))
             * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS tau_b
FROM pairs
"""


@query("hypothesis_kendall_knight", oracle=_KENDALL_KNIGHT_ORACLE)
def hypothesis_kendall_knight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier — KENDALL'S τ-b at ENTITY GRAIN via KNIGHT'S
    merge-sort inversion counting, the documented swap of
    hypothesis_kendall delivered as code: (account balance, lifetime
    spend) per CUSTOMER — a relation where the O(n²) pair join
    actually hurts (1.1M pairs at sf0.01, 112M at sf0.1, 5e17 at
    100 TB) — with the discordant count Q computed as STRICT
    INVERSIONS, never pairs.

    The distributed decomposition (the derivation the docstring
    carries because each piece must be exactly disjoint):
    with p = row_number over (x, y, cid) and ry = row_number over
    (y, p), rank dominance ry_i > ry_j for p_i < p_j holds IFF
    y_i > y_j strictly (the p tie-break sends equal-y pairs the other
    way), and x-tied pairs are never inversions (p sorts y ascending
    within an x block).  So Q splits exactly three ways on the
    rank-chunk grid (chunk = ⌈p/C⌉, bucket = ⌈ry/C⌉, C = {c}):
    (1) WITHIN-CHUNK: Knight's merge-sort count per chunk
    (applyInPandas, O(C log C) each); (2) CROSS-CHUNK DIFFERENT-
    BUCKET: bucket_i > bucket_j forces ry_i > ry_j, so the count is a
    pure grid sum — suffix-over-bucket then prefix-over-chunk window
    sums on the (chunk × bucket) count matrix, ≤ (n/C)² tiny rows;
    (3) CROSS-CHUNK SAME-BUCKET: an equi-join on bucket (hard size
    ≤ C by rank-chunking → n·C candidate pairs, never n²).  Ties and
    concordance follow in closed form: P = n0 − Q − tx − ty − txy.

    Exactness: every count is an exact integer (cents-quantized x/y,
    distinct ranks); τ-b is the single identical sqrt expression of
    hypothesis_kendall, floor-rounded 6 dp.  The DuckDB oracle runs
    the O(n²) pair formula — a DIFFERENT algorithm agreeing on the
    same integers is the strongest differential this harness has.

    100 TB: both ranks are two-phase global_rank (no single-reducer
    sort); the merge-sort chunks are Arrow-batched; the same-bucket
    join is rank-bounded; only the (n/C)² grid is single-level — the
    production variant recurses it (O(n log n)); at C = √n the whole
    key is O(n^1.5) vs the pair join's O(n²)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("cid")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
        ).alias("spend")
    )
    cust = (
        c.select(
            F.col("c_custkey").alias("cid"),
            F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("x"),
        )
        .join(spend, "cid", "left")
        .select(
            "cid", "x", F.coalesce("spend", F.lit(0)).cast("long").alias("y")
        )
    )
    ranked = global_rank(cust, [F.asc("x"), F.asc("y"), F.asc("cid")],
                         rank_col="p")
    ranked = global_rank(ranked, [F.asc("y"), F.asc("p")], rank_col="ry")
    els = ranked.select(
        "cid",
        "x",
        "y",
        "ry",
        F.floor((F.col("p") - 1) / F.lit(_KK_C)).cast("long").alias("chunk"),
        F.floor((F.col("ry") - 1) / F.lit(_KK_C)).cast("long").alias("yb"),
        "p",
    )
    els = els.localCheckpoint(eager=False)  # 4 consumers below

    # (1) within-chunk inversions — Knight's merge sort per chunk
    def _chunk_inv(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["p"].to_numpy(), kind="stable")
        seq = pdf["ry"].to_numpy()[order]
        return pd.DataFrame(
            {"chunk": [int(pdf["chunk"].iloc[0])],
             "inv": [_merge_count(seq)]}
        )

    qw = (
        els.select("chunk", "p", "ry")
        .groupBy("chunk")
        .applyInPandas(_chunk_inv, "chunk long, inv long")
        .agg(F.sum("inv").cast("long").alias("qw"))
    )

    # (2) cross-chunk, different bucket: grid suffix/prefix sums
    mg = els.groupBy("chunk", "yb").agg(
        F.count("*").cast("long").alias("m")
    )
    mg = mg.localCheckpoint(eager=False)  # grid + element weights
    grid = (
        mg.select("chunk").distinct()
        .crossJoin(F.broadcast(mg.select("yb").distinct()))
        .join(mg, ["chunk", "yb"], "left")
        .select(
            "chunk", "yb", F.coalesce("m", F.lit(0)).cast("long").alias("m")
        )
    )
    ws = (
        Window.partitionBy("chunk")
        .orderBy(F.desc("yb"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wp = (
        Window.partitionBy("yb")
        .orderBy(F.asc("chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wgrid = (
        grid.withColumn("s", F.coalesce(F.sum("m").over(ws), F.lit(0)))
        .withColumn("w", F.coalesce(F.sum("s").over(wp), F.lit(0)))
        .select("chunk", "yb", "w")
    )
    qd = (
        mg.join(wgrid, ["chunk", "yb"])
        .agg(F.sum(F.col("m") * F.col("w")).cast("long").alias("qd"))
    )

    # (3) cross-chunk, same bucket: rank-bounded equi-join (≤ C rows
    # per bucket side — n·C candidates, never n²)
    a, b = els.alias("a"), els.alias("b")
    qs = (
        a.join(
            b,
            (F.col("a.yb") == F.col("b.yb"))
            & (F.col("a.chunk") < F.col("b.chunk"))
            & (F.col("a.ry") > F.col("b.ry")),
        )
        .agg(F.count("*").cast("long").alias("qs"))
    )

    # ties in closed form (exact integer aggregates, no pair joins)
    def _tie_pairs(cols: list[str], alias: str) -> DataFrame:
        return (
            els.groupBy(*cols)
            .agg(F.count("*").cast("long").alias("t"))
            .agg(
                F.sum(F.col("t") * (F.col("t") - 1) / 2)
                .cast("long")
                .alias(alias)
            )
        )

    tpx = _tie_pairs(["x"], "tpx")
    tpy = _tie_pairs(["y"], "tpy")
    tpxy = _tie_pairs(["x", "y"], "txy")
    nrow = els.agg(F.count("*").cast("long").alias("n"))

    out = (
        qw.crossJoin(F.broadcast(qd))
        .crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(tpx))
        .crossJoin(F.broadcast(tpy))
        .crossJoin(F.broadcast(tpxy))
        .crossJoin(F.broadcast(nrow))
    )
    q = F.col("qw") + F.col("qd") + F.col("qs")
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    tx = (F.col("tpx") - F.col("txy")).cast("long")
    ty = (F.col("tpy") - F.col("txy")).cast("long")
    p_conc = (n0 - q - tx - ty - F.col("txy")).cast("long")
    tau = F.floor(
        (p_conc - q)
        * F.lit(1.0)
        / F.sqrt(
            (n0 - tx - F.col("txy")).cast("double")
            * (n0 - ty - F.col("txy"))
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    return out.select(
        "n",
        p_conc.alias("concordant"),
        q.cast("long").alias("discordant"),
        tx.alias("ties_x"),
        ty.alias("ties_y"),
        tau.alias("tau_b"),
    )


hypothesis_kendall_knight.__doc__ = hypothesis_kendall_knight.__doc__.format(
    c=_KK_C
)


# ---------------------------------------------------------------------------
# stats_wilcoxon_signed_rank — the paired nonparametric location test
# ---------------------------------------------------------------------------

#: two-sided 5% normal critical value (shared with the z-test tier)
_Z_CRIT = 1.959963984540054

_WILCOXON_ORACLE = f"""
WITH sp AS (
    SELECT o_custkey AS cid,
           CAST(SUM(CASE WHEN year(o_orderdate) <= 1997
                         THEN CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                                   AS BIGINT) ELSE 0 END) AS BIGINT)
               AS early,
           CAST(SUM(CASE WHEN year(o_orderdate) >= 1998
                         THEN CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                                   AS BIGINT) ELSE 0 END) AS BIGINT)
               AS late,
           CAST(SUM(CASE WHEN year(o_orderdate) <= 1997
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
           CAST(SUM(CASE WHEN year(o_orderdate) >= 1998
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM orders GROUP BY 1),
d AS (
    SELECT cid, late - early AS d, ABS(late - early) AS ad
    FROM sp WHERE n_early > 0 AND n_late > 0 AND late <> early),
rn AS (
    SELECT cid, d, ad,
           ROW_NUMBER() OVER (ORDER BY ad, cid) AS r
    FROM d),
grp AS (
    SELECT ad, (MIN(r) + MAX(r)) / 2.0e0 AS r_avg,
           CAST(COUNT(*) AS BIGINT) AS t
    FROM rn GROUP BY ad),
ranked AS (
    SELECT rn.cid, rn.d, grp.r_avg FROM rn JOIN grp USING (ad)),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CASE WHEN d > 0 THEN r_avg ELSE 0 END) AS w_plus,
           SUM(CASE WHEN d < 0 THEN r_avg ELSE 0 END) AS w_minus
    FROM ranked),
ties AS (
    SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie3 FROM grp)
SELECT agg.n AS n_pairs, agg.w_plus, agg.w_minus,
       {{z}} AS z_stat,
       ABS({{zraw}}) > {_Z_CRIT} AS reject_05
FROM agg CROSS JOIN ties
""".format(
    z="FLOOR(((agg.w_plus - agg.n * (agg.n + 1) / 4.0e0)"
      " / sqrt(agg.n * (agg.n + 1) * (2 * agg.n + 1) / 24.0e0"
      "        - ties.tie3 / 48.0e0)) * 10000.0e0 + 0.5e0) / 10000.0e0",
    zraw="(agg.w_plus - agg.n * (agg.n + 1) / 4.0e0)"
         " / sqrt(agg.n * (agg.n + 1) * (2 * agg.n + 1) / 24.0e0"
         "        - ties.tie3 / 48.0e0)",
)


@query("stats_wilcoxon_signed_rank", oracle=_WILCOXON_ORACLE)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier — WILCOXON SIGNED-RANK test (the paired
    nonparametric complement to the paired t and the one-sample twin
    of hypothesis_mannwhitney): did per-customer spend SHIFT between
    the early (≤1997) and late (≥1998) halves of the order history?
    Signed ranks absorb the heavy right tail of spend where a paired
    t-test is dominated by whales.  Average ranks handle |d| ties; the
    normal approximation carries the standard Σ(t³−t)/48 tie
    correction.

    Exactness: cents-quantized integer spends, ranks via the two-phase
    global row_number with (min+max)/2 tie averaging — every rank is a
    dyadic half-integer, so the W⁺/W⁻ sums are EXACT doubles in any
    summation order; z is one identical expression rounded 4 dp.

    100 TB: the pair relation is one orders aggregate (map-side
    combine); ranking is global_rank's two-phase exchange; everything
    after is a 2-row reduce."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    yr = F.year("o_orderdate")
    sp = o.groupBy(F.col("o_custkey").alias("cid")).agg(
        F.sum(F.when(yr <= 1997, cents).otherwise(0)).cast("long")
        .alias("early"),
        F.sum(F.when(yr >= 1998, cents).otherwise(0)).cast("long")
        .alias("late"),
        F.sum(F.when(yr <= 1997, 1).otherwise(0)).cast("long")
        .alias("n_early"),
        F.sum(F.when(yr >= 1998, 1).otherwise(0)).cast("long")
        .alias("n_late"),
    )
    d = (
        sp.filter(
            (F.col("n_early") > 0)
            & (F.col("n_late") > 0)
            & (F.col("late") != F.col("early"))
        )
        .select(
            "cid",
            (F.col("late") - F.col("early")).alias("d"),
            F.abs(F.col("late") - F.col("early")).alias("ad"),
        )
    )
    rn = global_rank(d, [F.asc("ad"), F.asc("cid")], rank_col="r")
    grp = rn.groupBy("ad").agg(
        ((F.min("r") + F.max("r")) / F.lit(2.0)).alias("r_avg"),
        F.count("*").cast("long").alias("t"),
    )
    ranked = rn.join(grp, "ad")
    agg = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("r_avg")).otherwise(0.0))
        .alias("w_plus"),
        F.sum(F.when(F.col("d") < 0, F.col("r_avg")).otherwise(0.0))
        .alias("w_minus"),
    )
    ties = grp.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie3")
    )
    n = F.col("n")
    zraw = (F.col("w_plus") - n * (n + 1) / F.lit(4.0)) / F.sqrt(
        n * (n + 1) * (2 * n + 1) / F.lit(24.0)
        - F.col("tie3") / F.lit(48.0)
    )
    return agg.crossJoin(F.broadcast(ties)).select(
        F.col("n").alias("n_pairs"),
        "w_plus",
        "w_minus",
        (F.floor(zraw * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0))
        .alias("z_stat"),
        (F.abs(zraw) > F.lit(_Z_CRIT)).alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# stats_runs_test — Wald–Wolfowitz randomness check on the revenue series
# ---------------------------------------------------------------------------

_RUNS_ORACLE = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT))
                AS BIGINT) AS rev
    FROM orders GROUP BY 1),
med AS (
    SELECT rev AS m FROM (
        SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, day) AS r,
               COUNT(*) OVER () AS n
        FROM daily)
    WHERE r = (n + 1) // 2),
signs AS (
    SELECT day, CASE WHEN rev > m THEN 1 ELSE 0 END AS s
    FROM daily CROSS JOIN med WHERE rev <> m),
runs AS (
    SELECT CAST(1 + SUM(CASE WHEN s <> prev THEN 1 ELSE 0 END) AS BIGINT)
               AS r,
           CAST(SUM(s) AS BIGINT) AS n1,
           CAST(SUM(1 - s) AS BIGINT) AS n2
    FROM (SELECT s, LAG(s) OVER (ORDER BY day) AS prev FROM signs)
    WHERE prev IS NOT NULL OR TRUE)
SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
       {{z}} AS z_stat,
       ABS({{zraw}}) > {_Z_CRIT} AS reject_05
FROM runs
""".format(
    z="FLOOR((r - (2.0e0 * n1 * n2 / (n1 + n2) + 1))"
      " / sqrt(2.0e0 * n1 * n2 * (2.0e0 * n1 * n2 - n1 - n2)"
      "        / ((n1 + n2) * (n1 + n2) * 1.0e0 * (n1 + n2 - 1)))"
      " * 10000.0e0 + 0.5e0) / 10000.0e0",
    zraw="(r - (2.0e0 * n1 * n2 / (n1 + n2) + 1))"
         " / sqrt(2.0e0 * n1 * n2 * (2.0e0 * n1 * n2 - n1 - n2)"
         "        / ((n1 + n2) * (n1 + n2) * 1.0e0 * (n1 + n2 - 1)))",
)


@query("stats_runs_test", oracle=_RUNS_ORACLE)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier — WALD–WOLFOWITZ RUNS TEST for randomness of
    the daily-revenue sequence around its median: too FEW runs means
    positive serial dependence (trends/regimes — the thing that
    invalidates the i.i.d. assumption every A/B readout upstream makes),
    too MANY means negative dependence (oscillation).  The median cut
    (strict, equal-to-median days dropped — the standard treatment)
    makes the test distribution-free.

    Exactness: integer cents sums; the lower median is an exact rank
    pick (no averaging); the run count is an integer lag-compare; z is
    one identical expression rounded 4 dp.

    100 TB: the daily rollup is one map-side-combined aggregate to a
    CALENDAR-BOUNDED relation (~2.4k rows/TPC-H decade) — the lag
    window and median rank run on that bounded relation, never on raw
    orders."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents).cast("long").alias("rev")
    )
    daily = daily.localCheckpoint(eager=False)  # median + signs
    wmed = Window.orderBy(F.asc("rev"), F.asc("day"))
    med = (
        daily.withColumn("r", F.row_number().over(wmed))
        .withColumn("n", F.count("*").over(Window.partitionBy()))
        .filter(F.col("r") == F.floor((F.col("n") + 1) / 2).cast("long"))
        .select(F.col("rev").alias("m"))
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("rev") != F.col("m"))
        .select(
            "day",
            F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("s"),
        )
    )
    wd = Window.orderBy("day")
    runs = (
        signs.withColumn("prev", F.lag("s").over(wd))
        .agg(
            (
                F.lit(1)
                + F.sum(
                    F.when(F.col("s") != F.col("prev"), 1).otherwise(0)
                )
            )
            .cast("long")
            .alias("r"),
            F.sum("s").cast("long").alias("n1"),
            F.sum(F.lit(1) - F.col("s")).cast("long").alias("n2"),
        )
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mean = F.lit(2.0) * n1 * n2 / (n1 + n2) + 1
    var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * F.lit(1.0) * (n1 + n2 - 1))
    )
    zraw = (r - mean) / F.sqrt(var)
    return runs.select(
        r.alias("n_runs"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        (F.floor(zraw * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0))
        .alias("z_stat"),
        (F.abs(zraw) > F.lit(_Z_CRIT)).alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# stats_friedman — blocked rank test across treatments
# ---------------------------------------------------------------------------

#: chi-square 5% critical value at df = k-1 = 4 (five order priorities)
_CHI2_CRIT_DF4 = 9.487729036781154


_FRIEDMAN_ORACLE = f"""
WITH cell AS (
    SELECT c.c_nationkey AS block, o.o_orderpriority AS trt,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0e0 + 0.5e0)
                         AS BIGINT)) AS BIGINT) AS v
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2),
complete AS (
    SELECT block FROM cell GROUP BY block HAVING COUNT(*) = 5),
rn AS (
    SELECT block, trt, v,
           ROW_NUMBER() OVER (PARTITION BY block ORDER BY v, trt) AS r
    FROM cell WHERE block IN (SELECT block FROM complete)),
grp AS (
    SELECT block, v, (MIN(r) + MAX(r)) / 2.0e0 AS r_avg
    FROM rn GROUP BY block, v),
ranked AS (
    SELECT rn.block, rn.trt, grp.r_avg
    FROM rn JOIN grp ON grp.block = rn.block AND grp.v = rn.v),
rsum AS (
    SELECT trt, SUM(r_avg) AS rj FROM ranked GROUP BY trt),
agg AS (
    SELECT CAST((SELECT COUNT(*) FROM complete) AS BIGINT) AS b,
           SUM(rj * rj) AS s
    FROM rsum)
SELECT b AS n_blocks, CAST(5 AS INT) AS k,
       FLOOR((12.0e0 / (b * 5 * 6) * s - 3.0e0 * b * 6)
             * 10000.0e0 + 0.5e0) / 10000.0e0 AS q_stat,
       (12.0e0 / (b * 5 * 6) * s - 3.0e0 * b * 6) > {_CHI2_CRIT_DF4}
           AS reject_05
FROM agg
"""


@query("stats_friedman", oracle=_FRIEDMAN_ORACLE)
def stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier — FRIEDMAN TEST (blocked rank ANOVA, the
    nonparametric twin of the repeated-measures F): do the five order
    priorities differ in revenue once NATION-level scale is blocked
    out?  Each complete block (nation with all 5 priorities) ranks its
    own cells 1..5, so a nation 100× larger contributes exactly the
    same rank mass — the blocking that a raw Kruskal-Wallis would
    throw away.

    Exactness: integer cents cells; within-block ranks via bounded
    (k=5) windows with (min+max)/2 tie averaging (dyadic — exact
    double sums); Q is one identical expression rounded 4 dp against
    the χ²(4) critical constant.

    100 TB: the cell relation is one fact aggregate to |nations|×5
    rows — dimension-bounded state forever after."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    cell = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("block"),
            F.col("o_orderpriority").alias("trt"),
        )
        .agg(F.sum(cents).cast("long").alias("v"))
    )
    cell = cell.localCheckpoint(eager=False)  # complete + ranks
    complete = cell.groupBy("block").count().filter(F.col("count") == 5)
    wb = Window.partitionBy("block").orderBy(F.asc("v"), F.asc("trt"))
    rn = cell.join(F.broadcast(complete.select("block")), "block").withColumn(
        "r", F.row_number().over(wb)
    )
    grp = rn.groupBy("block", "v").agg(
        ((F.min("r") + F.max("r")) / F.lit(2.0)).alias("r_avg")
    )
    ranked = rn.join(grp, ["block", "v"])
    rsum = ranked.groupBy("trt").agg(F.sum("r_avg").alias("rj"))
    nb = complete.agg(F.count("*").cast("long").alias("b"))
    agg = rsum.agg(F.sum(F.col("rj") * F.col("rj")).alias("s")).crossJoin(
        F.broadcast(nb)
    )
    q = F.lit(12.0) / (F.col("b") * 5 * 6) * F.col("s") - F.lit(3.0) * F.col(
        "b"
    ) * 6
    return agg.select(
        F.col("b").alias("n_blocks"),
        F.lit(5).cast("int").alias("k"),
        (F.floor(q * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "q_stat"
        ),
        (q > F.lit(_CHI2_CRIT_DF4)).alias("reject_05"),
    )
