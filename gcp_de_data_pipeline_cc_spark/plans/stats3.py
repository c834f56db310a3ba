"""Multiple-testing and battery-level statistics.

Round-4 continuation of the hypothesis tier (chisq / t / Mann-Whitney /
KS / Spearman / ANOVA test ONE hypothesis each): what a real pipeline
runs is a BATTERY — one test per segment — and then needs a
multiple-comparisons discipline so 25 tests at alpha=0.05 don't hand
back ~1.25 false discoveries by construction.  Benjamini-Hochberg is
the public standard (FDR control at q).

Reference parity: the reference's QC tier gates per-table checks
(`dags/pipeline_orchestration_dag.py:121-141` runs row-count gates per
table); a per-segment test battery with FDR control is that pattern
done statistically.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

# --------------------------------------------------------------------------
# stats_fdr_bh — Benjamini-Hochberg over a 25-nation chi-square battery
# --------------------------------------------------------------------------

#: FDR level and battery size (m = |nation| — a FIXED dim, so the
#: critical-value ladder is a compile-time literal table)
_BH_Q_NUM, _BH_Q_DEN = 1, 20  # q = 0.05
_BH_M = 25


def _chi2_1_isf(p: float) -> float:
    """Inverse survival of chi-square(1 df) by bisection on
    sf(x) = erfc(sqrt(x/2)) — pure stdlib, evaluated once at import;
    the RESULTS are embedded as double literals in both engines."""
    lo, hi = 0.0, 200.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if math.erfc(math.sqrt(mid / 2.0)) > p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


#: BH step-up ladder: rank i (1 = largest statistic = smallest p) may
#: reject when p_(i) <= i*q/m, i.e. when chi2_(i) >= isf(i*q/m)
_BH_CRIT = tuple(
    round(_chi2_1_isf(_BH_Q_NUM * i / (_BH_Q_DEN * _BH_M)), 6)
    for i in range(1, _BH_M + 1)
)


def _fdr_oracle() -> str:
    crit_values = ", ".join(
        f"({i + 1}, CAST({c!r} AS DOUBLE))" for i, c in enumerate(_BH_CRIT)
    )
    return f"""
    WITH seg AS (
        SELECT n.n_name,
               CAST(COUNT(CASE WHEN o.o_orderpriority = '1-URGENT'
                           THEN 1 END) AS BIGINT) AS n_urgent,
               CAST(COUNT(CASE WHEN o.o_orderpriority <> '1-URGENT'
                           THEN 1 END) AS BIGINT) AS n_other
        FROM nation n
        LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_name),
    tot AS (
        SELECT CAST(SUM(n_urgent) AS BIGINT) AS tu,
               CAST(SUM(n_other) AS BIGINT) AS to_,
               CAST(SUM(n_urgent + n_other) AS BIGINT) AS n
        FROM seg),
    x AS (
        SELECT s.n_name, s.n_urgent, s.n_other,
               FLOOR(CAST(t.n AS DOUBLE)
                     * CAST(s.n_urgent * (t.to_ - s.n_other)
                            - s.n_other * (t.tu - s.n_urgent) AS DOUBLE)
                     * CAST(s.n_urgent * (t.to_ - s.n_other)
                            - s.n_other * (t.tu - s.n_urgent) AS DOUBLE)
                     / (CAST(NULLIF(s.n_urgent + s.n_other, 0) AS DOUBLE)
                        * CAST(NULLIF((t.tu - s.n_urgent)
                                      + (t.to_ - s.n_other), 0) AS DOUBLE)
                        * CAST(NULLIF(t.tu, 0) AS DOUBLE)
                        * CAST(NULLIF(t.to_, 0) AS DOUBLE))
                     * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS chi2
        FROM seg s CROSS JOIN tot t),
    rk AS (
        SELECT n_name, n_urgent, n_other, chi2,
               CAST(ROW_NUMBER() OVER
                    (ORDER BY chi2 DESC NULLS LAST, n_name) AS INT) AS rnk
        FROM x),
    crit(rnk, crit_bh) AS (VALUES {crit_values}),
    flagged AS (
        SELECT rk.*, crit.crit_bh,
               COALESCE(rk.chi2 >= crit.crit_bh, FALSE) AS passes
        FROM rk JOIN crit ON crit.rnk = rk.rnk),
    kmax AS (
        SELECT CAST(COALESCE(MAX(CASE WHEN passes THEN rnk END), 0)
                    AS INT) AS k_max
        FROM flagged)
    SELECT f.n_name, f.n_urgent, f.n_other, f.chi2, f.rnk, f.crit_bh,
           f.passes, k.k_max, f.rnk <= k.k_max AS rejected
    FROM flagged f CROSS JOIN kmax k
    ORDER BY f.rnk
    """


@query("stats_fdr_bh", oracle=_fdr_oracle())
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier, battery rung — BENJAMINI-HOCHBERG false-
    discovery-rate control (q = 0.05) over a 25-segment test battery:
    per nation, the 2x2 Pearson chi-square of "is this nation's
    1-URGENT order share different from the rest of the market".
    25 naive alpha=0.05 tests expect ~1.25 false positives; BH's
    step-up ladder (reject ranks 1..k_max where k_max = max{{i :
    p_(i) <= i*q/m}}) caps the EXPECTED false-discovery fraction at q
    — the public multiple-comparisons standard for screening reports.

    p-values never materialize: p_(i) <= i*q/m  <=>  chi2_(i) >=
    isf_chi2_1(i*q/m), and because the battery size m = |nation| = 25
    is a FIXED dimension, the 25 critical values are compile-time
    literals (stdlib-erfc bisection at import), identical text in both
    engines.  The statistic is N*(ad-bc)^2/(r1*r0*c1*c0) from exact
    int64 cell counts — (ad-bc) stays integer, the wide products are
    cast to double in an identical tree — floor-quantized at 6 dp
    BEFORE ranking and comparison, so tie order and threshold
    decisions are bit-identical.  Nations with no orders get NULL
    chi2 -> passes FALSE (p = 1), rank at the bottom.

    100 TB: the battery collapses to one map-side fact aggregate over
    orders x customer (dim-broadcast joins); ranking, the literal
    ladder join, and the k_max scalar all act on the 25-row dim.  The
    step-up scan is ONE bounded window + a one-row broadcast."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    seg = (
        nation.join(
            customer, customer.c_nationkey == nation.n_nationkey, "left"
        )
        .join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("n_name")
        .agg(
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1))
            .cast("long")
            .alias("n_urgent"),
            F.count(F.when(F.col("o_orderpriority") != "1-URGENT", 1))
            .cast("long")
            .alias("n_other"),
        )
    )
    tot = seg.agg(
        F.sum("n_urgent").cast("long").alias("tu"),
        F.sum("n_other").cast("long").alias("to_"),
        F.sum(F.col("n_urgent") + F.col("n_other")).cast("long").alias("n"),
    )
    diff = (
        F.col("n_urgent") * (F.col("to_") - F.col("n_other"))
        - F.col("n_other") * (F.col("tu") - F.col("n_urgent"))
    ).cast("double")
    chi2 = roundn(
        F.col("n").cast("double")
        * diff
        * diff
        / (
            F.nullif(
                F.col("n_urgent") + F.col("n_other"), F.lit(0)
            ).cast("double")
            * F.nullif(
                (F.col("tu") - F.col("n_urgent"))
                + (F.col("to_") - F.col("n_other")),
                F.lit(0),
            ).cast("double")
            * F.nullif(F.col("tu"), F.lit(0)).cast("double")
            * F.nullif(F.col("to_"), F.lit(0)).cast("double")
        ),
        6,
    )
    x = seg.crossJoin(F.broadcast(tot)).select(
        "n_name", "n_urgent", "n_other", chi2.alias("chi2")
    )
    # nation-dim-bounded window (25 rows)
    w = Window.orderBy(F.desc_nulls_last("chi2"), F.asc("n_name"))
    rk = x.withColumn("rnk", F.row_number().over(w).cast("int"))
    crit = spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(_BH_CRIT)],
        "rnk INT, crit_bh DOUBLE",
    )
    flagged = rk.join(F.broadcast(crit), "rnk").withColumn(
        "passes", F.coalesce(F.col("chi2") >= F.col("crit_bh"), F.lit(False))
    )
    kmax = flagged.agg(
        F.coalesce(
            F.max(F.when(F.col("passes"), F.col("rnk"))), F.lit(0)
        )
        .cast("int")
        .alias("k_max")
    )
    return (
        flagged.crossJoin(F.broadcast(kmax))
        .select(
            "n_name",
            "n_urgent",
            "n_other",
            "chi2",
            "rnk",
            "crit_bh",
            "passes",
            "k_max",
            (F.col("rnk") <= F.col("k_max")).alias("rejected"),
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# stats_jackknife — leave-one-group-out SE of a ratio metric
# --------------------------------------------------------------------------

#: micro-unit quantization for leave-one-out ratio estimates
_JK_U = 1_000_000


def _jk_oracle() -> str:
    u = _JK_U
    return f"""
    WITH g AS (
        SELECT s.s_nationkey AS grp,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0e0 - l.l_discount)
                                   * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS num_c,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS den_q
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS gn,
               CAST(SUM(num_c) AS BIGINT) AS sn,
               CAST(SUM(den_q) AS BIGINT) AS sd
        FROM g),
    loo AS (
        SELECT g.grp, t.gn, t.sn, t.sd,
               CAST(FLOOR(CAST(t.sn - g.num_c AS DOUBLE)
                          / CAST(t.sd - g.den_q AS DOUBLE) / 100.0e0
                          * {u}.0e0 + 0.5e0) AS BIGINT) AS r_loo_u
        FROM g CROSS JOIN tot t),
    s AS (
        SELECT gn, sn, sd,
               CAST(SUM(r_loo_u) AS BIGINT) AS sru,
               CAST(COUNT(*) AS BIGINT) AS n_chk
        FROM loo GROUP BY gn, sn, sd),
    dev AS (
        SELECT l.grp, l.r_loo_u, s.gn, s.sn, s.sd, s.sru,
               CAST(FLOOR(CAST(s.gn * l.r_loo_u - s.sru AS DOUBLE)
                          * CAST(s.gn * l.r_loo_u - s.sru AS DOUBLE)
                          + 0.5e0) AS BIGINT) AS c2
        FROM loo l CROSS JOIN s)
    SELECT d.grp AS nationkey,
           FLOOR(CAST(d.r_loo_u AS DOUBLE) / {u}.0e0 * 1000000.0e0 + 0.5e0)
               / 1000000.0e0 AS r_loo,
           d.gn AS n_groups,
           FLOOR(CAST(d.sn AS DOUBLE) / CAST(d.sd AS DOUBLE) / 100.0e0
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS r_full,
           FLOOR(CAST(d.sru AS DOUBLE) / CAST(d.gn AS DOUBLE) / {u}.0e0
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS r_bar,
           FLOOR(SQRT(CAST(d.gn - 1 AS DOUBLE)
                      * CAST((SELECT SUM(c2) FROM dev) AS DOUBLE)
                      / (CAST(d.gn AS DOUBLE) * CAST(d.gn AS DOUBLE)
                         * CAST(d.gn AS DOUBLE) * {u}.0e0 * {u}.0e0))
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS se_jack
    FROM dev d
    ORDER BY d.grp
    """


@query("stats_jackknife", oracle=_jk_oracle())
def stats_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics tier — LEAVE-ONE-GROUP-OUT jackknife standard error
    of a ratio metric (net revenue per unit shipped), deleting one
    supplier NATION at a time: ratios have no closed-form SE, and the
    delete-a-group jackknife is the classic design-respecting answer
    when rows within a group are correlated (delete-one-ROW would
    understate the error).  Per-nation leave-one-out estimates ship
    beside the full-sample ratio, the jackknife mean, and
    SE = sqrt((G-1)/G * sum (R_(g) - R_bar)^2) — the error bar a
    metrics review quotes.

    Exactness: group numerators are exact cents, denominators exact
    unit counts; each leave-one-out ratio is ONE division immediately
    quantized to integer micro-units, so the cross-group moment sums
    are order-free int64 (deviation via the G*R_g - sum(R) identity —
    no float mean subtraction); the squared deviation is one identical
    double tree floor-quantized per group before summation; one final
    sqrt.

    100 TB: one fact pass collapses to the 25-row group table;
    everything after is dim-sized with one-row broadcasts."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    u = _JK_U
    g = (
        lineitem.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            lineitem.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("s_nationkey").alias("grp"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * 100.0
                    + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("num_c"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("den_q"),
        )
    )
    g = g.localCheckpoint(eager=False)  # totals + loo consumers
    tot = g.agg(
        F.count("*").cast("long").alias("gn"),
        F.sum("num_c").cast("long").alias("sn"),
        F.sum("den_q").cast("long").alias("sd"),
    )
    loo = g.crossJoin(F.broadcast(tot)).select(
        "grp",
        "gn",
        "sn",
        "sd",
        F.floor(
            (F.col("sn") - F.col("num_c")).cast("double")
            / (F.col("sd") - F.col("den_q")).cast("double")
            / F.lit(100.0)
            * F.lit(float(u))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r_loo_u"),
    )
    loo = loo.localCheckpoint(eager=False)  # sum + dev consumers
    s = loo.agg(F.sum("r_loo_u").cast("long").alias("sru"))
    dev = loo.crossJoin(F.broadcast(s)).select(
        "grp",
        "r_loo_u",
        "gn",
        "sn",
        "sd",
        "sru",
        F.floor(
            (F.col("gn") * F.col("r_loo_u") - F.col("sru")).cast("double")
            * (F.col("gn") * F.col("r_loo_u") - F.col("sru")).cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("c2"),
    )
    sc2 = dev.agg(F.sum("c2").cast("long").alias("sc2"))
    return (
        dev.crossJoin(F.broadcast(sc2))
        .select(
            F.col("grp").alias("nationkey"),
            roundn(F.col("r_loo_u").cast("double") / F.lit(float(u)), 6).alias(
                "r_loo"
            ),
            F.col("gn").alias("n_groups"),
            roundn(
                F.col("sn").cast("double") / F.col("sd").cast("double")
                / F.lit(100.0),
                6,
            ).alias("r_full"),
            roundn(
                F.col("sru").cast("double") / F.col("gn").cast("double")
                / F.lit(float(u)),
                6,
            ).alias("r_bar"),
            roundn(
                F.sqrt(
                    (F.col("gn") - 1).cast("double")
                    * F.col("sc2").cast("double")
                    / (
                        F.col("gn").cast("double")
                        * F.col("gn").cast("double")
                        * F.col("gn").cast("double")
                        * F.lit(float(u))
                        * F.lit(float(u))
                    )
                ),
                6,
            ).alias("se_jack"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# stats_eb_shrinkage — empirical-Bayes rate shrinkage
# --------------------------------------------------------------------------

#: pseudo-observation strength of the global prior
_EB_M = 200


def _eb_oracle() -> str:
    m = _EB_M
    return f"""
    WITH seg AS (
        SELECT n.n_name,
               CAST(COUNT(CASE WHEN o.o_orderpriority = '1-URGENT'
                           THEN 1 END) AS BIGINT) AS k,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n
        FROM nation n
        LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_name),
    g AS (
        SELECT CAST(SUM(k) AS BIGINT) AS gk, CAST(SUM(n) AS BIGINT) AS gn
        FROM seg)
    SELECT s.n_name, s.k, s.n,
           FLOOR(CAST(s.k AS DOUBLE) / CAST(NULLIF(s.n, 0) AS DOUBLE)
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS raw_rate,
           FLOOR(CAST(g.gk AS DOUBLE) / CAST(g.gn AS DOUBLE)
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS global_rate,
           FLOOR((CAST(s.k AS DOUBLE)
                  + {m}.0e0 * CAST(g.gk AS DOUBLE) / CAST(g.gn AS DOUBLE))
                 / (CAST(s.n AS DOUBLE) + {m}.0e0)
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS shrunk_rate,
           FLOOR(CAST(s.n AS DOUBLE) / (CAST(s.n AS DOUBLE) + {m}.0e0)
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS self_weight
    FROM seg s CROSS JOIN g
    ORDER BY s.n_name
    """


@query("stats_eb_shrinkage", oracle=_eb_oracle())
def stats_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics tier — EMPIRICAL-BAYES shrinkage of per-segment
    rates (the James-Stein/beta-binomial discipline every honest
    leaderboard needs): each nation's urgent-order rate is pulled
    toward the global rate with prior strength m = {m} pseudo-
    observations, shrunk = (k + m*p0)/(n + m).  A 3-order nation at
    100% urgent stops outranking a 10,000-order nation at 40% — the
    small-sample pathology raw ranking suffers; self_weight = n/(n+m)
    shows exactly how much each segment's own data speaks.

    Exactness: k/n/global counts exact int64; each reported rate is
    an identical double tree with ONE division chain, 6-dp floor-
    quantized; empty segments report NULL raw_rate and shrink fully
    to the prior.

    100 TB: one dim-broadcast fact aggregate to the 25-row segment
    table; the prior is a one-row broadcast."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    m = float(_EB_M)
    seg = (
        nation.join(
            customer, customer.c_nationkey == nation.n_nationkey, "left"
        )
        .join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("n_name")
        .agg(
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1))
            .cast("long")
            .alias("k"),
            F.count(F.col("o_orderkey")).cast("long").alias("n"),
        )
    )
    g = seg.agg(
        F.sum("k").cast("long").alias("gk"),
        F.sum("n").cast("long").alias("gn"),
    )
    d = lambda c: F.col(c).cast("double")
    return (
        seg.crossJoin(F.broadcast(g))
        .select(
            "n_name",
            "k",
            "n",
            roundn(d("k") / F.nullif(F.col("n"), F.lit(0)).cast("double"), 6)
            .alias("raw_rate"),
            roundn(d("gk") / d("gn"), 6).alias("global_rate"),
            roundn(
                (d("k") + F.lit(m) * d("gk") / d("gn"))
                / (d("n") + F.lit(m)),
                6,
            ).alias("shrunk_rate"),
            roundn(d("n") / (d("n") + F.lit(m)), 6).alias("self_weight"),
        )
        .orderBy("n_name")
    )


stats_eb_shrinkage.__doc__ = stats_eb_shrinkage.__doc__.format(m=_EB_M)


# --------------------------------------------------------------------------
# hypothesis_permutation — seeded permutation test on the A/B metric
# --------------------------------------------------------------------------

#: permutation replicates (p-value resolution 1/(B+1))
_PERM_B = 199


def _perm_oracle() -> str:
    b = _PERM_B
    return f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT))
                    AS BIGINT) AS y_c,
               CASE WHEN SUBSTR(md5('arm:' || CAST(user_id AS VARCHAR)),
                                1, 1) < '8' THEN 1 ELSE 0 END AS is_a
        FROM events GROUP BY user_id),
    obs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(FLOOR(ABS(
                   SUM(CASE WHEN is_a = 1 THEN y_c ELSE 0 END) * 1.0e0
                       / NULLIF(SUM(is_a), 0)
                   - SUM(CASE WHEN is_a = 0 THEN y_c ELSE 0 END) * 1.0e0
                       / NULLIF(SUM(1 - is_a), 0))
                   * 10000.0e0 + 0.5e0) AS BIGINT) AS stat_obs,
               FLOOR(SUM(CASE WHEN is_a = 1 THEN y_c ELSE 0 END) * 1.0e0
                     / NULLIF(SUM(is_a), 0) + 0.5e0) / 100.0e0 AS mean_a,
               FLOOR(SUM(CASE WHEN is_a = 0 THEN y_c ELSE 0 END) * 1.0e0
                     / NULLIF(SUM(1 - is_a), 0) + 0.5e0) / 100.0e0 AS mean_b
        FROM per_user),
    perms AS (
        SELECT bb.b, u.y_c,
               CASE WHEN SUBSTR(md5('perm:' || CAST(bb.b AS VARCHAR)
                                    || ':' || CAST(u.user_id AS VARCHAR)),
                                1, 1) < '8' THEN 1 ELSE 0 END AS is_a
        FROM per_user u
        CROSS JOIN (SELECT UNNEST(range(1, {b} + 1)) AS b) bb),
    stats AS (
        SELECT b,
               CAST(FLOOR(ABS(
                   SUM(CASE WHEN is_a = 1 THEN y_c ELSE 0 END) * 1.0e0
                       / NULLIF(SUM(is_a), 0)
                   - SUM(CASE WHEN is_a = 0 THEN y_c ELSE 0 END) * 1.0e0
                       / NULLIF(SUM(1 - is_a), 0))
                   * 10000.0e0 + 0.5e0) AS BIGINT) AS stat_b
        FROM perms GROUP BY b),
    tail AS (
        SELECT CAST(SUM(CASE WHEN s.stat_b >= o.stat_obs THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ge
        FROM stats s CROSS JOIN obs o)
    SELECT o.n_users, CAST({b} AS BIGINT) AS n_perms, o.mean_a, o.mean_b,
           CAST(o.stat_obs AS DOUBLE) / 10000.0e0 AS stat_obs,
           t.n_ge,
           FLOOR((1.0e0 + t.n_ge) / (1.0e0 + {b})
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS p_value
    FROM obs o CROSS JOIN tail t
    """


@query("hypothesis_permutation", oracle=_perm_oracle())
def hypothesis_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier — the ASSUMPTION-FREE significance test: a
    seeded permutation test of the A/B arm difference in per-user
    spend.  {b} deterministic label permutations (arm_b(user) =
    md5('perm:b:user') coin — bit-reproducible, no RNG state), test
    statistic |mean_A − mean_B| per replicate, and the standard
    add-one p-value (1 + #{{stat_b ≥ stat_obs}})/(B+1) — exact
    finite-sample validity where the t-test needs normality.

    Exactness: per-user spend is integer cents; each replicate's means
    are single IEEE divisions of int64 sums and the statistic is
    floor-quantized to integer 1e-4 units BEFORE any comparison, so
    the ≥-tail count is an integer comparison both engines resolve
    identically.

    100 TB: the fact collapses to USER grain first (map-side), then
    fans out ×{b} replicate labels — the explode is user-grain ×B,
    collapsing immediately to (replicate, arm) partial sums;
    replicate-grain state is 2B rows.  B is the resolution/cost knob;
    fieller-style streaming of replicates through one pass is the
    same plan."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(cents).cast("long").alias("y_c")
    ).withColumn(
        "is_a",
        F.when(
            F.substring(
                F.md5(
                    F.concat(F.lit("arm:"), F.col("user_id").cast("string"))
                ),
                1,
                1,
            )
            < "8",
            1,
        ).otherwise(0),
    )
    per_user = per_user.localCheckpoint(eager=False)  # obs + B replicates

    def _stat(df, grp):
        means = df.groupBy(*grp).agg(
            F.sum(F.when(F.col("is_a") == 1, F.col("y_c")).otherwise(0))
            .cast("long")
            .alias("sa"),
            F.sum(F.col("is_a")).cast("long").alias("na"),
            F.sum(F.when(F.col("is_a") == 0, F.col("y_c")).otherwise(0))
            .cast("long")
            .alias("sb"),
            F.sum(1 - F.col("is_a")).cast("long").alias("nb"),
            F.count("*").cast("long").alias("n_users"),
        )
        diff = F.abs(
            F.col("sa") * F.lit(1.0) / F.nullif(F.col("na"), F.lit(0)).cast("double")
            - F.col("sb") * F.lit(1.0) / F.nullif(F.col("nb"), F.lit(0)).cast("double")
        )
        return means, diff

    obs_m, obs_diff = _stat(per_user, [])
    obs = obs_m.select(
        "n_users",
        F.floor(obs_diff * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("stat_obs"),
        (
            F.floor(
                F.col("sa") * F.lit(1.0) / F.nullif(F.col("na"), F.lit(0)).cast("double")
                + F.lit(0.5)
            )
            / F.lit(100.0)
        ).alias("mean_a"),
        (
            F.floor(
                F.col("sb") * F.lit(1.0) / F.nullif(F.col("nb"), F.lit(0)).cast("double")
                + F.lit(0.5)
            )
            / F.lit(100.0)
        ).alias("mean_b"),
    )
    grid = spark.range(1, _PERM_B + 1).select(F.col("id").alias("b"))
    perms = per_user.crossJoin(F.broadcast(grid)).select(
        "b",
        "y_c",
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                1,
            )
            < "8",
            1,
        )
        .otherwise(0)
        .alias("is_a"),
    )
    stats_m, stats_diff = _stat(perms, ["b"])
    stats = stats_m.select(
        "b",
        F.floor(stats_diff * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("stat_b"),
    )
    tail = stats.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            F.when(F.col("stat_b") >= F.col("stat_obs"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_ge")
    )
    return obs.crossJoin(F.broadcast(tail)).select(
        "n_users",
        F.lit(_PERM_B).cast("long").alias("n_perms"),
        "mean_a",
        "mean_b",
        (F.col("stat_obs").cast("double") / F.lit(10000.0)).alias("stat_obs"),
        "n_ge",
        roundn(
            (F.lit(1.0) + F.col("n_ge")) / F.lit(1.0 + _PERM_B), 6
        ).alias("p_value"),
    )


hypothesis_permutation.__doc__ = hypothesis_permutation.__doc__.format(
    b=_PERM_B
)


# --------------------------------------------------------------------------
# stats_cramers_v — categorical association matrix (Cramér's V)
# --------------------------------------------------------------------------


@query(
    "stats_cramers_v",
    oracle="""
    WITH pairs AS (
        SELECT 'status_priority' AS pair,
               o_orderstatus AS a, o_orderpriority AS b FROM orders
        UNION ALL
        SELECT 'status_month', o_orderstatus,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'priority_month', o_orderpriority,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS VARCHAR) FROM orders),
    cells AS (
        SELECT pair, a, b, CAST(COUNT(*) AS BIGINT) AS o
        FROM pairs GROUP BY 1, 2, 3),
    dense AS (
        SELECT g.pair, g.a, g.b, CAST(COALESCE(c.o, 0) AS BIGINT) AS o
        FROM (SELECT DISTINCT r.pair, r.a, s.b
              FROM (SELECT DISTINCT pair, a FROM cells) r
              JOIN (SELECT DISTINCT pair, b FROM cells) s USING (pair)) g
        LEFT JOIN cells c
          ON c.pair = g.pair AND c.a = g.a AND c.b = g.b),
    tot AS (
        SELECT pair, a, b, o,
               CAST(SUM(o) OVER (PARTITION BY pair, a) AS BIGINT) AS rt,
               CAST(SUM(o) OVER (PARTITION BY pair, b) AS BIGINT) AS ct,
               CAST(SUM(o) OVER (PARTITION BY pair) AS BIGINT) AS n
        FROM dense),
    terms AS (
        SELECT pair, a, b, n,
               FLOOR((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                      - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                     * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                        - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE)
                        * CAST(ct AS DOUBLE))
                     * 1000000.0e0 + 0.5e0) AS term_q
        FROM tot),
    agg AS (
        SELECT pair,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS c,
               CAST(SUM(term_q) AS BIGINT) AS chi2_q
        FROM terms GROUP BY pair)
    SELECT pair, n, r, c,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           chi2_q / 1000000.0e0 AS chi2,
           FLOOR(SQRT(chi2_q / 1000000.0e0
                      / (CAST(n AS DOUBLE)
                         * CAST(LEAST(r - 1, c - 1) AS DOUBLE)))
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS v,
           FLOOR(SQRT(GREATEST(0.0e0,
                               chi2_q / 1000000.0e0 / CAST(n AS DOUBLE)
                               - CAST((r - 1) * (c - 1) AS DOUBLE)
                                 / CAST(n - 1 AS DOUBLE))
                      / LEAST(CAST(r AS DOUBLE)
                              - CAST((r - 1) * (r - 1) AS DOUBLE)
                                / CAST(n - 1 AS DOUBLE) - 1.0e0,
                              CAST(c AS DOUBLE)
                              - CAST((c - 1) * (c - 1) AS DOUBLE)
                                / CAST(n - 1 AS DOUBLE) - 1.0e0))
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS v_corrected
    FROM agg
    ORDER BY pair
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical ASSOCIATION MATRIX — Cramér's V (plus the
    Bergsma bias-corrected variant) for every pair of the orders
    table's categorical axes (status × priority × order-month): the
    "corr matrix for categoricals" beside `agg_corr_matrix`'s numeric
    one, and the effect-size companion to `hypothesis_chisq` (which
    answers "is there association?" — V answers "how much?", on the
    comparable 0..1 scale that survives n growing 100×, where raw chi²
    just inflates).

    Exactness: cell/row/column counts are exact int64; each cell's chi²
    term (O·n − rt·ct)²/(n·rt·ct) is one fixed IEEE-double scalar tree
    over those integers, floor-quantized to 1e-6 BEFORE the cross-cell
    sum — so no float sum ever crosses rows un-quantized and summation
    order cannot drift the result.  V = √(χ²/(n·min(r−1,c−1))) and the
    bias-corrected V (φ² debiased by (r−1)(c−1)/(n−1), dims shrunk the
    same way — Bergsma 2013) are scalar trees on the 3-row aggregate,
    quantized at final projection.

    100 TB: ONE fact scan fans each row to the 3 pairs via an inline
    explode; partial aggregation collapses map-side to ≤ |pair|·r·c
    cells (≤ 180 rows here) before the only shuffle, so the reduce side
    is dimension-bounded regardless of fact volume; the window sums and
    the V algebra run on that tiny cell relation.

    Reference parity: the QC tier's per-table gates
    (dags/pipeline_orchestration_dag.py:121-141) check volumes; an
    association audit between pipeline dimensions is the statistical
    extension of that contract.
    """
    orders = load_table(spark, sf_dir, "orders")
    month = F.month("o_orderdate").cast("string")
    pairs = orders.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("status_priority").alias("pair"),
                    F.col("o_orderstatus").alias("a"),
                    F.col("o_orderpriority").alias("b"),
                ),
                F.struct(
                    F.lit("status_month").alias("pair"),
                    F.col("o_orderstatus").alias("a"),
                    month.alias("b"),
                ),
                F.struct(
                    F.lit("priority_month").alias("pair"),
                    F.col("o_orderpriority").alias("a"),
                    month.alias("b"),
                ),
            )
        ).alias("x")
    ).select("x.*")
    cells = pairs.groupBy("pair", "a", "b").agg(
        F.count("*").cast("long").alias("o")
    )
    # densify: unobserved (a, b) combinations are REAL chi-square cells
    # (each contributes (0-E)^2/E = E); the grid is dimension-bounded so
    # the distinct x distinct join stays tiny at any fact volume.
    grid = (
        cells.select("pair", "a")
        .distinct()
        .join(cells.select("pair", "b").distinct(), "pair")
    )
    dense = grid.join(cells, ["pair", "a", "b"], "left").select(
        "pair",
        "a",
        "b",
        F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
    )
    tot = (
        dense.withColumn(
            "rt", F.sum("o").over(Window.partitionBy("pair", "a")).cast("long")
        )
        .withColumn(
            "ct", F.sum("o").over(Window.partitionBy("pair", "b")).cast("long")
        )
        .withColumn(
            "n", F.sum("o").over(Window.partitionBy("pair")).cast("long")
        )
    )
    d = (
        F.col("o").cast("double") * F.col("n").cast("double")
        - F.col("rt").cast("double") * F.col("ct").cast("double")
    )
    term_q = F.floor(
        d
        * d
        / (
            F.col("n").cast("double")
            * F.col("rt").cast("double")
            * F.col("ct").cast("double")
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    )
    agg = tot.select("pair", "a", "b", "n", term_q.alias("term_q")).groupBy(
        "pair"
    ).agg(
        F.max("n").cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("r"),
        F.countDistinct("b").cast("long").alias("c"),
        F.sum("term_q").cast("long").alias("chi2_q"),
    )
    chi2 = F.col("chi2_q") / F.lit(1000000.0)
    nd = F.col("n").cast("double")
    rd, cd = F.col("r").cast("double"), F.col("c").cast("double")
    phi2corr = F.greatest(
        F.lit(0.0),
        chi2 / nd
        - ((rd - 1) * (cd - 1)) / (nd - 1),
    )
    rcorr = rd - (rd - 1) * (rd - 1) / (nd - 1) - F.lit(1.0)
    ccorr = cd - (cd - 1) * (cd - 1) / (nd - 1) - F.lit(1.0)
    return agg.select(
        "pair",
        "n",
        "r",
        "c",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        chi2.alias("chi2"),
        roundn(
            F.sqrt(chi2 / (nd * F.least(rd - 1, cd - 1))), 6
        ).alias("v"),
        roundn(F.sqrt(phi2corr / F.least(rcorr, ccorr)), 6).alias(
            "v_corrected"
        ),
    ).orderBy("pair")


# --------------------------------------------------------------------------
# hypothesis_mcnemar — paired classifier comparison
# --------------------------------------------------------------------------

#: chi-square(1) critical value at alpha = 0.05 (fixed literal, the
#: stats_fdr_bh no-libm discipline)
_MCN_CRIT_Q = 3_841_459  # 3.841459 in 1e-6 units


@query(
    "hypothesis_mcnemar",
    oracle=f"""
    WITH labeled AS (
        SELECT doc_id,
               SUBSTR(md5('y:' || CAST(doc_id AS VARCHAR)), 1, 2) < '80'
                   AS truth,
               SUBSTR(md5('ma:' || CAST(doc_id AS VARCHAR)), 1, 2) < '66'
                   AS pred_a,
               SUBSTR(md5('mb:' || CAST(doc_id AS VARCHAR)), 1, 2) < '99'
                   AS pred_b
        FROM documents),
    cells AS (
        SELECT CAST(SUM(CASE WHEN (pred_a = truth)
                              AND (pred_b = truth)
                             THEN 1 ELSE 0 END) AS BIGINT) AS both_ok,
               CAST(SUM(CASE WHEN (pred_a = truth)
                              AND (pred_b <> truth)
                             THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
               CAST(SUM(CASE WHEN (pred_a <> truth)
                              AND (pred_b = truth)
                             THEN 1 ELSE 0 END) AS BIGINT) AS only_b,
               CAST(SUM(CASE WHEN (pred_a <> truth)
                              AND (pred_b <> truth)
                             THEN 1 ELSE 0 END) AS BIGINT) AS both_bad,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM labeled)
    SELECT n, both_ok, only_a, only_b, both_bad,
           CASE WHEN only_a + only_b = 0 THEN 0
                ELSE ((abs(only_a - only_b) - 1)
                      * (abs(only_a - only_b) - 1) * 1000000)
                     // (only_a + only_b)
           END AS chi2_q,
           FLOOR(CAST(CASE WHEN only_a + only_b = 0 THEN 0
                ELSE ((abs(only_a - only_b) - 1)
                      * (abs(only_a - only_b) - 1) * 1000000)
                     // (only_a + only_b) END AS DOUBLE)
                 / 1000000.0e0 * 10000.0e0 + 0.5e0) / 10000.0e0
               AS chi2,
           (CASE WHEN only_a + only_b = 0 THEN 0
                 ELSE ((abs(only_a - only_b) - 1)
                       * (abs(only_a - only_b) - 1) * 1000000)
                      // (only_a + only_b) END) > {_MCN_CRIT_Q}
               AS reject_05
    FROM cells
    """,
)
def hypothesis_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier — McNEMAR'S TEST, the PAIRED classifier
    comparison the unpaired tests get wrong: when two models are
    evaluated on the SAME examples, only the DISCORDANT pairs carry
    information (examples one model gets right and the other wrong);
    the statistic is the continuity-corrected (|b−c|−1)²/(b+c) against
    χ²(1).  The channel plants two md5 classifiers of different
    accuracy against an md5 truth — discordant counts are deterministic
    and the test correctly favors the stronger model.

    Completes the hypothesis battery's missing cell: chisq tests
    independence, t/MannWhitney compare unpaired samples, kappa
    measures agreement — McNemar compares paired ACCURACY.

    Exactness: the statistic is exact integer arithmetic end-to-end
    ((|b−c|−1)²·10⁶ DIV (b+c) in 1e-6 units against a literal critical
    value — no p-value, no libm); the zero-discordance branch pins 0.

    100 TB: one projection + one single-row conditional aggregate —
    map-side collapse, no shuffle wider than one row.
    """
    docs = load_table(spark, sf_dir, "documents")

    def _coin(salt: str, thresh: str) -> F.Column:
        return (
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                2,
            )
            < thresh
        )

    labeled = docs.select(
        _coin("y", "80").alias("truth"),
        _coin("ma", "66").alias("pred_a"),
        _coin("mb", "99").alias("pred_b"),
    )
    cells = labeled.agg(
        F.sum(
            F.when(
                (F.col("pred_a") == F.col("truth"))
                & (F.col("pred_b") == F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("both_ok"),
        F.sum(
            F.when(
                (F.col("pred_a") == F.col("truth"))
                & (F.col("pred_b") != F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("only_a"),
        F.sum(
            F.when(
                (F.col("pred_a") != F.col("truth"))
                & (F.col("pred_b") == F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("only_b"),
        F.sum(
            F.when(
                (F.col("pred_a") != F.col("truth"))
                & (F.col("pred_b") != F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("both_bad"),
        F.count("*").cast("long").alias("n"),
    )
    chi2_q = F.when(
        F.col("only_a") + F.col("only_b") == 0, F.lit(0).cast("long")
    ).otherwise(
        F.expr(
            "((abs(only_a - only_b) - 1) * (abs(only_a - only_b) - 1)"
            " * 1000000) DIV (only_a + only_b)"
        )
    )
    return cells.select(
        "n",
        "both_ok",
        "only_a",
        "only_b",
        "both_bad",
        chi2_q.alias("chi2_q"),
        (
            F.floor(
                chi2_q.cast("double")
                / F.lit(1000000.0)
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("chi2"),
        (chi2_q > _MCN_CRIT_Q).alias("reject_05"),
    )


# --------------------------------------------------------------------------
# stats_mutual_info — mutual information of two categorical columns
# --------------------------------------------------------------------------


@query(
    "stats_mutual_info",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    xy AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_xy
        FROM documents GROUP BY 1, 2),
    mx AS (SELECT lang, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM xy GROUP BY 1),
    my AS (SELECT source, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM xy GROUP BY 1),
    cell AS (
        SELECT xy.lang, xy.source, xy.n_xy,
               ln(CAST(xy.n_xy AS DOUBLE) * n.n / (mx.n_x * my.n_y)) AS pmi,
               CAST(FLOOR(CAST(xy.n_xy AS DOUBLE) / n.n
                          * ln(CAST(xy.n_xy AS DOUBLE) * n.n
                               / (mx.n_x * my.n_y))
                          * 1000000000.0e0 + 0.5e0) AS BIGINT) AS cq
        FROM xy JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN n),
    tot AS (
        SELECT FLOOR(CAST(SUM(cq) AS DOUBLE) / 1000000000.0e0
                     * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS mi_total
        FROM cell)
    SELECT lang, source, n_xy,
           FLOOR(pmi * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS pmi,
           tot.mi_total
    FROM cell CROSS JOIN tot
    ORDER BY lang, source
    """,
)
def stats_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association tier — MUTUAL INFORMATION between two categorical
    columns (lang × source), the information-theoretic complement of
    stats_cramers_v's chi-square effect size: per-cell POINTWISE MI
    ln(p(x,y)/(p(x)p(y))) exposes WHICH (lang, source) pairs co-occur
    beyond independence (the feature-selection / leakage-detection
    readout), and the count-weighted sum is the corpus's total MI in
    nats — 0 iff the columns are independent. This is the metric a
    training-data audit uses to catch a source that silently encodes
    the language label (perfect leakage ⇒ MI = H(lang)).

    Exactness: all counts exact int64; each cell's MI contribution is
    quantized to integer NANO-NATS before the total (the
    text_bigram_lm micro-bits discipline — after floor-quantization,
    summation order cannot move the total); pmi is one rounded libm ln
    of an identical expression tree.

    100 TB: ONE map-side-combined aggregate over the fact table builds
    the contingency cells; margins roll up from the cells (never a
    second scan); everything downstream is |X|·|Y|-cardinality state —
    the one-row total crossJoin is category (a) scalar broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    xy = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_xy")
    )
    xy = xy.localCheckpoint(eager=False)  # margins + cells + total
    mx = xy.groupBy("lang").agg(F.sum("n_xy").cast("long").alias("n_x"))
    my = xy.groupBy("source").agg(F.sum("n_xy").cast("long").alias("n_y"))
    n = xy.agg(F.sum("n_xy").cast("long").alias("n"))
    pmi = F.log(
        F.col("n_xy").cast("double")
        * F.col("n")
        / (F.col("n_x") * F.col("n_y"))
    )
    cell = (
        xy.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "n_xy",
            pmi.alias("pmi_raw"),
            F.floor(
                F.col("n_xy").cast("double") / F.col("n") * pmi
                * F.lit(1000000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cq"),
        )
    )
    cell = cell.localCheckpoint(eager=False)  # rows + the total
    tot = cell.agg(
        (
            F.floor(
                F.sum("cq").cast("double")
                / F.lit(1000000000.0)
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("mi_total")
    )
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_xy",
            roundn(F.col("pmi_raw"), 6).alias("pmi"),
            "mi_total",
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# hypothesis_fisher_exact — the small-count 2x2 exact test
# --------------------------------------------------------------------------

#: Stirling constant 0.5*ln(2*pi)
_LN_SQRT_2PI = 0.9189385332046727


def _sql_lfact(x: str) -> str:
    """ln(x!) via an 8-step shifted Stirling series — an IDENTICAL
    double expression tree to :func:`_lfact_col`, so both engines
    produce bit-equal values (error < 1e-8 even at x = 0)."""
    x1 = f"(CAST({x} AS DOUBLE) + 1.0e0)"
    z = f"({x1} + 8.0e0)"
    base = (
        f"(({z} - 0.5e0) * ln({z}) - {z} + {_LN_SQRT_2PI}e0"
        f" + 1.0e0 / (12.0e0 * {z})"
        f" - 1.0e0 / (360.0e0 * {z} * {z} * {z}))"
    )
    corr = " + ".join(f"ln({x1} + {j}.0e0)" for j in range(8))
    return f"({base} - ({corr}))"


def _lfact_col(x) -> F.Column:
    """Spark twin of :func:`_sql_lfact` — same op sequence."""
    x1 = x.cast("double") + F.lit(1.0)
    z = x1 + F.lit(8.0)
    base = (
        (z - F.lit(0.5)) * F.log(z)
        - z
        + F.lit(_LN_SQRT_2PI)
        + F.lit(1.0) / (F.lit(12.0) * z)
        - F.lit(1.0) / (F.lit(360.0) * z * z * z)
    )
    corr = F.log(x1 + F.lit(0.0))
    for j in range(1, 8):
        corr = corr + F.log(x1 + F.lit(float(j)))
    return base - corr


def _fisher_oracle() -> str:
    def logp(k: str) -> str:
        return (
            f"{_sql_lfact('r1')} - {_sql_lfact(k)}"
            f" - {_sql_lfact(f'(r1 - {k})')}"
            f" + {_sql_lfact('(n - r1)')}"
            f" - {_sql_lfact(f'(c1 - {k})')}"
            f" - {_sql_lfact(f'(n - r1 - c1 + {k})')}"
            f" - {_sql_lfact('n')} + {_sql_lfact('c1')}"
            f" + {_sql_lfact('(n - c1)')}"
        )

    return f"""
    WITH labeled AS (
        SELECT SUBSTR(md5('fg:' || CAST(doc_id AS VARCHAR)), 1, 2) < '80'
                   AS grp,
               SUBSTR(md5('fo:' || CAST(doc_id AS VARCHAR)), 1, 2) < '08'
                   AS hit
        FROM documents),
    cells AS (
        SELECT CAST(SUM(CASE WHEN grp AND hit THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS r1,
               CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM labeled),
    obs AS (
        SELECT *, exp({logp('a')}) AS pmf_obs FROM cells),
    ks AS (
        SELECT obs.*, k
        FROM obs, UNNEST(range(GREATEST(0, r1 + c1 - n),
                               LEAST(r1, c1) + 1)) AS t(k)),
    terms AS (
        SELECT a, r1, c1, n, pmf_obs, k, exp({logp('k')}) AS pmf
        FROM ks),
    p AS (
        SELECT a, r1, c1, n,
               SUM(CASE WHEN pmf <= pmf_obs * (1.0e0 + 1.0e-7)
                        THEN pmf ELSE 0.0e0 END) AS p_two
        FROM terms GROUP BY 1, 2, 3, 4)
    SELECT n, a, r1 - a AS b, c1 - a AS c, n - r1 - c1 + a AS d,
           FLOOR(p_two * 1000000.0e0 + 0.5e0) / 1000000.0e0
               AS p_two_sided,
           CASE WHEN (r1 - a) * (c1 - a) = 0 THEN NULL
                ELSE FLOOR(CAST(a * (n - r1 - c1 + a) AS DOUBLE)
                           / ((r1 - a) * (c1 - a))
                           * 10000.0e0 + 0.5e0) / 10000.0e0
           END AS odds_ratio
    FROM p
    """


@query("hypothesis_fisher_exact", oracle=_fisher_oracle())
def hypothesis_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier — FISHER'S EXACT TEST on a 2x2 with a RARE
    outcome (~3% md5 coin vs a 50% cohort coin), the regime where the
    chi-square approximation (hypothesis_chisq) is invalid (expected
    cells < 5) and exact hypergeometric inference is mandatory: the
    two-sided p sums every table at least as extreme as observed
    (pmf(k) <= pmf(a)·(1+1e-7), the standard tolerance) over the
    hypergeometric support.

    Exactness: cell counts exact int64; ln(x!) is an 8-step shifted
    Stirling series written as the IDENTICAL double expression tree on
    both engines (error < 1e-8 at every argument, so pmf values agree
    to ~1e-8 relative); the support sum is of positive terms rounded
    at 6 dp — far above the float noise floor.

    100 TB: the 2x2 collapse is one map-side conditional aggregate;
    the support spine is min(r1, c1) rows — margin-sized, not
    corpus-sized. With margins beyond ~1e6 the exact tail is
    numerically indistinguishable from the chi-square/normal
    approximation and the battery switches to hypothesis_chisq —
    the documented scale swap (exactness only matters when counts
    are small enough to enumerate)."""
    docs = load_table(spark, sf_dir, "documents")

    def _coin(salt: str, thresh: str) -> F.Column:
        return (
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"),
                               F.col("doc_id").cast("string"))),
                1, 2,
            ) < thresh
        )

    labeled = docs.select(
        _coin("fg", "80").alias("grp"), _coin("fo", "08").alias("hit")
    )
    cells = labeled.agg(
        F.sum(F.when(F.col("grp") & F.col("hit"), 1).otherwise(0))
        .cast("long").alias("a"),
        F.sum(F.when(F.col("grp"), 1).otherwise(0)).cast("long").alias("r1"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long").alias("c1"),
        F.count("*").cast("long").alias("n"),
    )

    def logp(k: F.Column) -> F.Column:
        return (
            _lfact_col(F.col("r1"))
            - _lfact_col(k)
            - _lfact_col(F.col("r1") - k)
            + _lfact_col(F.col("n") - F.col("r1"))
            - _lfact_col(F.col("c1") - k)
            - _lfact_col(F.col("n") - F.col("r1") - F.col("c1") + k)
            - _lfact_col(F.col("n"))
            + _lfact_col(F.col("c1"))
            + _lfact_col(F.col("n") - F.col("c1"))
        )

    obs = cells.withColumn("pmf_obs", F.exp(logp(F.col("a"))))
    ks = obs.select(
        "a", "r1", "c1", "n", "pmf_obs",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), F.col("r1") + F.col("c1") - F.col("n")),
                F.least(F.col("r1"), F.col("c1")),
            )
        ).alias("k"),
    )
    terms = ks.withColumn("pmf", F.exp(logp(F.col("k"))))
    p = terms.groupBy("a", "r1", "c1", "n").agg(
        F.sum(
            F.when(
                F.col("pmf") <= F.col("pmf_obs") * F.lit(1.0 + 1.0e-7),
                F.col("pmf"),
            ).otherwise(F.lit(0.0))
        ).alias("p_two")
    )
    b = F.col("r1") - F.col("a")
    c = F.col("c1") - F.col("a")
    d = F.col("n") - F.col("r1") - F.col("c1") + F.col("a")
    return p.select(
        "n",
        "a",
        b.alias("b"),
        c.alias("c"),
        d.alias("d"),
        (F.floor(F.col("p_two") * F.lit(1000000.0) + F.lit(0.5))
         / F.lit(1000000.0)).alias("p_two_sided"),
        F.when(b * c == 0, F.lit(None).cast("double")).otherwise(
            F.floor(
                (F.col("a") * d).cast("double") / (b * c)
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("odds_ratio"),
    )
