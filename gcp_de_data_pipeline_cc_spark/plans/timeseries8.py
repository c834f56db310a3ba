"""Round-9 wave: stationarity, randomness and lead-lag diagnostics.

* ``ts_adf`` — Dickey–Fuller unit-root test (constant, no augmentation):
  is the revenue series mean-reverting or a random walk?
* ``ts_kpss`` — KPSS level-stationarity test, the complementary null
  (ADF's null is unit root; KPSS's null is stationarity — running both
  is the standard workup before any forecasting key).
* ``ts_variance_ratio`` — Lo–MacKinlay variance-ratio test on log
  returns (random-walk diagnostics via q-period variance scaling).
* ``ts_turning_points`` — turning-point randomness test (local extrema
  count vs the 2(n−2)/3 null).
* ``ts_bartels_rank`` — Bartels' rank version of the von Neumann ratio
  (rank-based serial-randomness test; robust to heavy tails).
* ``ts_crosscorr`` — lagged cross-correlation function between two
  event streams (lead-lag discovery ahead of ts_granger).
* ``ts_granger`` — Granger lag-1 causality F-test via closed-form
  nested OLS (does the click stream improve purchase forecasts?).

Series discipline: all order-series keys run on the OBSERVED-day spine
(days with ≥1 order) indexed by observation, the standard convention
for these tests on irregular business calendars; event keys run on the
observed-hour spine. Exactness: series levels are exact integers
(cents / counts), centerings use the n·x−S integer idiom, cross
products widen to DECIMAL/HUGEINT (the ts_twap idiom), transcendental
per-term contributions quantize once to integer units and int-sum.

Reference parity: the reference repo (AdepuAdithya/gcp-de-data-pipeline-cc)
contains no time-series engine; formulas are public (Dickey & Fuller
1979; Kwiatkowski et al. 1992; Lo & MacKinlay 1988; Kendall's
turning-point test; Bartels 1982; Granger 1969).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: shared day-grain revenue spine (exact cents), observation-indexed
_DAY_SQL = """
    day AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                    AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1),
    ser AS (
        SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS t FROM day)
"""


def _day_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t, y): observation index over observed days, revenue in cents."""
    orders = load_table(spark, sf_dir, "orders")
    day = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("y")
    )
    # the window runs over the DAY-grain relation — calendar-bounded
    # (|days| rows at any SF), the established ts-tier pattern
    w = Window.orderBy("d")
    return day.select(F.row_number().over(w).alias("t"), "y")


# ---------------------------------------------------------------------------
# ts_adf
# ---------------------------------------------------------------------------

#: 5% critical value, DF test with constant, asymptotic
_ADF_CRIT_05 = -2.86


def _adf_oracle() -> str:
    return f"""
    WITH {_DAY_SQL},
    obs AS (
        SELECT b.y - a.y AS dy, a.y AS x
        FROM ser a JOIN ser b ON b.t = a.t + 1),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(dy) AS HUGEINT) AS sd,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * dy) AS sxd,
               SUM(CAST(dy AS HUGEINT) * dy) AS sdd
        FROM obs),
    fit AS (
        SELECT n,
               (n * CAST(sxd AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE))
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   AS beta,
               CAST(sx AS DOUBLE) AS sxf, CAST(sd AS DOUBLE) AS sdf,
               CAST(sxx AS DOUBLE) AS sxxf, CAST(sxd AS DOUBLE) AS sxdf,
               CAST(sdd AS DOUBLE) AS sddf
        FROM s),
    fin AS (
        SELECT n, beta,
               (sddf - (sdf - beta * sxf) / n * sdf - beta * sxdf)
                   / (n - 2.0e0) AS s2,
               n * sxxf - sxf * sxf AS cxx
        FROM fit)
    SELECT n,
           {sql_roundn("beta", 8)} AS beta,
           {sql_roundn("sqrt(s2 * n / cxx)", 8)} AS se_beta,
           {sql_roundn("beta / sqrt(s2 * n / cxx)", 6)} AS adf_t,
           beta / sqrt(s2 * n / cxx) < {_ADF_CRIT_05}e0 AS reject_unit_root_05
    FROM fin
    """


@query("ts_adf", oracle=_adf_oracle())
def ts_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS tier — DICKEY–FULLER unit-root test (constant, lag 0) on the
    daily-revenue series: Δy_t = α + β·y_{t−1} + ε, t_DF = β̂/SE(β̂)
    against the Dickey–Fuller 5% critical −2.86 (NOT the normal
    −1.645: under the unit-root null the t-ratio has the DF
    distribution). reject ⇒ the series mean-reverts, so
    level-forecasting keys (ts_holt etc.) are licensed; fail-to-reject
    ⇒ difference first.

    Exactness: levels are exact cents; every OLS ingredient is an
    exact HUGEINT/decimal sum cast once to double, then one identical
    closed-form expression per engine.

    100 TB: the series is day-grain (calendar-bounded); sums are one
    aggregate over it; the fit is 1-row state."""
    ser = _day_series(spark, sf_dir)
    ser = ser.localCheckpoint(eager=False)  # both join sides
    a, b = ser.alias("a"), ser.alias("b")
    obs = a.join(b, F.col("b.t") == F.col("a.t") + 1).select(
        (F.col("b.y") - F.col("a.y")).alias("dy"), F.col("a.y").alias("x")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = obs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("dy").cast("decimal(38,0)").alias("sd"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("x") * F.col("dy")).alias("sxd"),
        F.sum(dec("dy") * F.col("dy")).alias("sdd"),
    )
    sxf = F.col("sx").cast("double")
    sdf = F.col("sd").cast("double")
    sxxf = F.col("sxx").cast("double")
    sxdf = F.col("sxd").cast("double")
    sddf = F.col("sdd").cast("double")
    n = F.col("n")
    beta = (n * sxdf - sxf * sdf) / (n * sxxf - sxf * sxf)
    fit = s.select(
        "n",
        beta.alias("beta"),
        (
            (sddf - (sdf - beta * sxf) / n * sdf - beta * sxdf)
            / (n - F.lit(2.0))
        ).alias("s2"),
        (n * sxxf - sxf * sxf).alias("cxx"),
    )
    se = F.sqrt(F.col("s2") * F.col("n") / F.col("cxx"))
    return fit.select(
        "n",
        roundn(F.col("beta"), 8).alias("beta"),
        roundn(se / F.lit(1.0), 8).alias("se_beta"),
        roundn(F.col("beta") / se, 6).alias("adf_t"),
        (F.col("beta") / se < F.lit(_ADF_CRIT_05)).alias(
            "reject_unit_root_05"
        ),
    )


# ---------------------------------------------------------------------------
# ts_kpss
# ---------------------------------------------------------------------------

_KPSS_L = 7
#: 5% critical value, level stationarity
_KPSS_CRIT_05 = 0.463


def _kpss_oracle() -> str:
    gammas = ",\n".join(
        f"""    g{j} AS (
        SELECT SUM(CAST(a.e AS HUGEINT) * b.e) AS g
        FROM e a JOIN e b ON b.t = a.t + {j})"""
        for j in range(0, _KPSS_L + 1)
    )
    lrv = " + ".join(
        f"2.0e0 * (1.0e0 - {j}.0e0 / {_KPSS_L + 1}.0e0)"
        f" * CAST(g{j}.g AS DOUBLE)"
        for j in range(1, _KPSS_L + 1)
    )
    joins = " CROSS JOIN ".join(f"g{j}" for j in range(0, _KPSS_L + 1))
    return f"""
    WITH {_DAY_SQL},
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s
        FROM ser),
    e AS (
        SELECT ser.t, tot.n * ser.y - tot.s AS e
        FROM ser CROSS JOIN tot),
    ps AS (
        SELECT t, SUM(e) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS sp
        FROM e),
    num AS (SELECT SUM(CAST(sp AS HUGEINT) * sp) AS ss FROM ps),
    {gammas}
    SELECT tot.n AS n, {_KPSS_L} AS lag_l,
           {sql_roundn(
               f"CAST(num.ss AS DOUBLE)"
               f" / (tot.n * (CAST(g0.g AS DOUBLE) + {lrv}))", 6)}
               AS kpss_stat,
           CAST(num.ss AS DOUBLE)
               / (tot.n * (CAST(g0.g AS DOUBLE) + {lrv}))
               > {_KPSS_CRIT_05}e0 AS reject_stationary_05
    FROM num CROSS JOIN tot CROSS JOIN {joins}
    """


@query("ts_kpss", oracle=_kpss_oracle())
def ts_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS tier — KPSS level-stationarity test on the daily-revenue
    series: η = (1/n²)·Σ_t S_t² / s²(l) with S_t the residual partial
    sums and s²(l) the Bartlett-kernel long-run variance at l = 7 —
    the COMPLEMENTARY null to ts_adf (stationarity is the null here;
    ADF's null is the unit root), so the pair classifies a series into
    stationary / unit-root / inconclusive instead of one test's
    one-sided answer.

    Exactness: residuals use the n·y−S integer centering (Σe = 0 by
    construction); partial sums are exact int64 cumulative sums over
    the calendar-bounded spine; S_t² and the lagged autocovariance
    products widen to HUGEINT/decimal; the n-scalings cancel
    analytically (η = ΣS̃²/(n·[γ̃₀+2Σw γ̃])) so no float rescaling
    happens before the final expression.

    100 TB: l+1 self-joins of the day-grain relation — calendar-
    bounded; everything else is 1-row state."""
    ser = _day_series(spark, sf_dir)
    tot = ser.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    e = ser.crossJoin(F.broadcast(tot)).select(
        "t", (F.col("n") * F.col("y") - F.col("s")).alias("e"), "n"
    )
    e = e.localCheckpoint(eager=False)  # partial sums + l+1 lag joins
    wp = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    ps = e.select("t", F.sum("e").over(wp).alias("sp"))
    num = ps.agg(
        F.sum(F.col("sp").cast("decimal(38,0)") * F.col("sp")).alias("ss")
    )
    ga, gb = e.alias("ga"), e.alias("gb")
    out = num
    for j in range(0, _KPSS_L + 1):
        gj = (
            ga.join(gb, F.col("gb.t") == F.col("ga.t") + j)
            .agg(
                F.sum(
                    F.col("ga.e").cast("decimal(38,0)") * F.col("gb.e")
                ).alias(f"g{j}")
            )
        )
        out = out.crossJoin(F.broadcast(gj))
    lrv = F.col("g0").cast("double")
    for j in range(1, _KPSS_L + 1):
        lrv = lrv + F.lit(2.0) * (
            F.lit(1.0) - F.lit(float(j)) / F.lit(float(_KPSS_L + 1))
        ) * F.col(f"g{j}").cast("double")
    eta = F.col("ss").cast("double") / (F.col("n") * lrv)
    return out.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n"),
        F.lit(_KPSS_L).alias("lag_l"),
        roundn(eta / F.lit(1.0), 6).alias("kpss_stat"),
        (eta > F.lit(_KPSS_CRIT_05)).alias("reject_stationary_05"),
    )


# ---------------------------------------------------------------------------
# ts_variance_ratio
# ---------------------------------------------------------------------------

_VR_Q = 5


def _vr_oracle() -> str:
    return f"""
    WITH day AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1),
    ser AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY d) AS t FROM day),
    r AS (
        SELECT b.t,
               CAST(FLOOR(ln(b.c * 1.0e0 / a.c) * 1000000000.0e0 + 0.5e0)
                    AS BIGINT) AS r
        FROM ser a JOIN ser b ON b.t = a.t + 1),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(r) AS BIGINT) AS a
        FROM r),
    v1 AS (
        SELECT SUM((m.m * CAST(r.r AS HUGEINT) - m.a)
                   * (m.m * CAST(r.r AS HUGEINT) - m.a)) AS c1
        FROM r CROSS JOIN m),
    rq AS (
        SELECT r.t, CAST(SUM(r2.r) AS BIGINT) AS rq
        FROM r JOIN r r2 ON r2.t BETWEEN r.t - {_VR_Q - 1} AND r.t
        GROUP BY r.t HAVING COUNT(*) = {_VR_Q}),
    vq AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS mq,
               SUM((m.m * CAST(rq.rq AS HUGEINT) - {_VR_Q} * m.a)
                   * (m.m * CAST(rq.rq AS HUGEINT) - {_VR_Q} * m.a)) AS cq
        FROM rq CROSS JOIN m GROUP BY m.m, m.a)
    SELECT m.m AS n_returns, {_VR_Q} AS q,
           {sql_roundn(
               f"(CAST(vq.cq AS DOUBLE) / ({_VR_Q}.0e0 * vq.mq))"
               f" / (CAST(v1.c1 AS DOUBLE) / m.m)", 6)} AS vr,
           {sql_roundn(
               f"((CAST(vq.cq AS DOUBLE) / ({_VR_Q}.0e0 * vq.mq))"
               f" / (CAST(v1.c1 AS DOUBLE) / m.m) - 1.0e0)"
               f" / sqrt(2.0e0 * (2.0e0 * {_VR_Q} - 1.0e0)"
               f" * ({_VR_Q} - 1.0e0) / (3.0e0 * {_VR_Q} * m.m))", 6)}
               AS z_stat
    FROM vq CROSS JOIN v1 CROSS JOIN m
    """


@query("ts_variance_ratio", oracle=_vr_oracle())
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS tier — LO–MACKINLAY VARIANCE-RATIO test (q = 5) on daily
    order-count log returns: under a random walk, Var of q-period
    returns = q·Var of 1-period returns, so VR(q) ≠ 1 diagnoses mean
    reversion (VR < 1) or trending/momentum (VR > 1); z uses the
    homoskedastic null variance 2(2q−1)(q−1)/(3qm).

    Exactness: each log return quantizes ONCE to nano units (identical
    ln both engines) and every subsequent step is integer/decimal —
    overlapping q-sums are exact int64 window sums, centerings use
    m·r−A, squares widen to HUGEINT/decimal.

    100 TB: calendar-bounded series; the overlapping-sum window is q
    rows; 1-row folds."""
    orders = load_table(spark, sf_dir, "orders")
    day = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.orderBy("d")
    ser = day.select(F.row_number().over(w).alias("t"), "c")
    ser = ser.localCheckpoint(eager=False)
    a, b = ser.alias("a"), ser.alias("b")
    r = a.join(b, F.col("b.t") == F.col("a.t") + 1).select(
        F.col("b.t").alias("t"),
        F.floor(
            F.log(F.col("b.c") * F.lit(1.0) / F.col("a.c")) * F.lit(1.0e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r"),
    )
    r = r.localCheckpoint(eager=False)  # moments + overlapping sums
    m = r.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("r").cast("long").alias("a"),
    )
    dev = F.col("m") * F.col("r").cast("decimal(38,0)") - F.col("a")
    v1 = r.crossJoin(F.broadcast(m)).agg(F.sum(dev * dev).alias("c1"))
    wq = Window.orderBy("t").rowsBetween(-(_VR_Q - 1), 0)
    rq = (
        r.select(
            "t",
            F.sum("r").over(wq).cast("long").alias("rq"),
            F.count("*").over(wq).alias("k"),
        )
        .filter(F.col("k") == _VR_Q)
    )
    devq = (
        F.col("m") * F.col("rq").cast("decimal(38,0)")
        - F.lit(_VR_Q) * F.col("a")
    )
    vq = rq.crossJoin(F.broadcast(m)).agg(
        F.count("*").cast("long").alias("mq"),
        F.sum(devq * devq).alias("cq"),
    )
    vr = (
        F.col("cq").cast("double") / (F.lit(float(_VR_Q)) * F.col("mq"))
    ) / (F.col("c1").cast("double") / F.col("m"))
    z = (vr - F.lit(1.0)) / F.sqrt(
        F.lit(2.0)
        * (F.lit(2.0) * _VR_Q - 1.0)
        * (_VR_Q - 1.0)
        / (F.lit(3.0) * _VR_Q * F.col("m"))
    )
    return (
        vq.crossJoin(F.broadcast(v1))
        .crossJoin(F.broadcast(m))
        .select(
            F.col("m").alias("n_returns"),
            F.lit(_VR_Q).alias("q"),
            roundn(vr / F.lit(1.0), 6).alias("vr"),
            roundn(z / F.lit(1.0), 6).alias("z_stat"),
        )
    )


# ---------------------------------------------------------------------------
# ts_turning_points
# ---------------------------------------------------------------------------


def _tp_oracle() -> str:
    return f"""
    WITH {_DAY_SQL},
    tp AS (
        SELECT CAST(SUM(CASE WHEN (a.y < b.y AND b.y > c.y)
                              OR (a.y > b.y AND b.y < c.y)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_turn
        FROM ser a JOIN ser b ON b.t = a.t + 1
                   JOIN ser c ON c.t = a.t + 2),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ser)
    SELECT n.n AS n, tp.n_turn AS n_turning,
           {sql_roundn("2.0e0 * (n.n - 2.0e0) / 3.0e0", 4)} AS e_turning,
           {sql_roundn("(16.0e0 * n.n - 29.0e0) / 90.0e0", 4)} AS var_turning,
           {sql_roundn(
               "(tp.n_turn - 2.0e0 * (n.n - 2.0e0) / 3.0e0)"
               " / sqrt((16.0e0 * n.n - 29.0e0) / 90.0e0)", 6)} AS z
    FROM tp CROSS JOIN n
    """


@query("ts_turning_points", oracle=_tp_oracle())
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS tier — TURNING-POINT randomness test on daily revenue: count
    interior local extrema (peak or trough); an i.i.d. series has
    E = 2(n−2)/3 of them with Var = (16n−29)/90 (Kendall), so too few
    turning points ⇒ trending/sticky, too many ⇒ oscillatory
    (negatively autocorrelated). The cheap first screen before
    ts_bartels_rank / ts_ljung_box.

    Exactness: cents levels are exact ints; the count and the closed
    forms are exact; one identical z expression.

    100 TB: two self-joins on the calendar-bounded day spine."""
    ser = _day_series(spark, sf_dir)
    ser = ser.localCheckpoint(eager=False)
    a, b, c = ser.alias("a"), ser.alias("b"), ser.alias("c")
    tp = (
        a.join(b, F.col("b.t") == F.col("a.t") + 1)
        .join(c, F.col("c.t") == F.col("a.t") + 2)
        .agg(
            F.sum(
                F.when(
                    (
                        (F.col("a.y") < F.col("b.y"))
                        & (F.col("b.y") > F.col("c.y"))
                    )
                    | (
                        (F.col("a.y") > F.col("b.y"))
                        & (F.col("b.y") < F.col("c.y"))
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_turn")
        )
    )
    nn = ser.agg(F.count("*").cast("long").alias("n"))
    e_t = F.lit(2.0) * (F.col("n") - F.lit(2.0)) / F.lit(3.0)
    v_t = (F.lit(16.0) * F.col("n") - F.lit(29.0)) / F.lit(90.0)
    return tp.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n"),
        F.col("n_turn").alias("n_turning"),
        roundn(e_t / F.lit(1.0), 4).alias("e_turning"),
        roundn(v_t / F.lit(1.0), 4).alias("var_turning"),
        roundn((F.col("n_turn") - e_t) / F.sqrt(v_t), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# ts_bartels_rank
# ---------------------------------------------------------------------------


def _bartels_oracle() -> str:
    return f"""
    WITH {_DAY_SQL},
    dv AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM ser GROUP BY 1),
    rk AS (
        SELECT y,
               2 * (SUM(cnt) OVER (ORDER BY y
                        ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS r2
        FROM dv),
    sr AS (
        SELECT ser.t, rk.r2 FROM ser JOIN rk ON ser.y = rk.y),
    num AS (
        SELECT CAST(SUM((a.r2 - b.r2) * (a.r2 - b.r2)) AS BIGINT) AS nv
        FROM sr a JOIN sr b ON b.t = a.t + 1),
    den AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r2) AS BIGINT) AS s,
               SUM(CAST(r2 AS HUGEINT) * r2) AS ss
        FROM sr)
    SELECT den.n AS n,
           {sql_roundn(
               "num.nv * 1.0e0"
               " / (CAST(den.ss AS DOUBLE) - den.s * 1.0e0 * den.s / den.n)",
               6)} AS rvn,
           {sql_roundn(
               "(num.nv * 1.0e0"
               " / (CAST(den.ss AS DOUBLE) - den.s * 1.0e0 * den.s / den.n)"
               " - 2.0e0)"
               " / sqrt(4.0e0 * (den.n - 2.0e0)"
               "        * (5.0e0 * den.n * den.n - 2.0e0 * den.n - 9.0e0)"
               "        / (5.0e0 * den.n * (den.n + 1.0e0)"
               "           * (den.n - 1.0e0) * (den.n - 1.0e0)))", 6)} AS z
    FROM num CROSS JOIN den
    """


@query("ts_bartels_rank", oracle=_bartels_oracle())
def ts_bartels_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS tier — BARTELS' RANK test of serial randomness (the rank
    version of von Neumann's ratio): RVN = Σ(r_t−r_{t+1})²/Σ(r_t−r̄)²
    on the midranks of daily revenue — E[RVN] = 2 under randomness,
    RVN < 2 ⇒ positive serial dependence, > 2 ⇒ alternation; robust
    where the parametric von Neumann ratio is wrecked by heavy tails.

    Exactness: 2×midranks are exact integers (value-cell
    construction); numerator and denominator are exact integer /
    HUGEINT sums; RVN and z are one identical expression per engine
    (Bartels 1982 exact null variance).

    100 TB: value-cells + one adjacency self-join on the
    calendar-bounded spine."""
    ser = _day_series(spark, sf_dir)
    ser = ser.localCheckpoint(eager=False)
    dv = ser.groupBy("y").agg(F.count("*").cast("long").alias("cnt"))
    wv = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    rk = dv.select(
        "y",
        (
            F.lit(2) * (F.sum("cnt").over(wv) - F.col("cnt"))
            + F.col("cnt")
            + F.lit(1)
        ).alias("r2"),
    )
    sr = ser.join(F.broadcast(rk), "y").select("t", "r2")
    sr = sr.localCheckpoint(eager=False)  # adjacency + moments
    a, b = sr.alias("a"), sr.alias("b")
    num = a.join(b, F.col("b.t") == F.col("a.t") + 1).agg(
        F.sum(
            (F.col("a.r2") - F.col("b.r2"))
            * (F.col("a.r2") - F.col("b.r2"))
        )
        .cast("long")
        .alias("nv")
    )
    den = sr.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r2").cast("long").alias("s"),
        F.sum(F.col("r2").cast("decimal(38,0)") * F.col("r2")).alias("ss"),
    )
    rvn = F.col("nv") * F.lit(1.0) / (
        F.col("ss").cast("double")
        - F.col("s") * F.lit(1.0) * F.col("s") / F.col("n")
    )
    nf = F.col("n") * F.lit(1.0)
    var = (
        F.lit(4.0)
        * (nf - 2.0)
        * (F.lit(5.0) * nf * nf - F.lit(2.0) * nf - F.lit(9.0))
        / (F.lit(5.0) * nf * (nf + 1.0) * (nf - 1.0) * (nf - 1.0))
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("n").alias("n"),
        roundn(rvn / F.lit(1.0), 6).alias("rvn"),
        roundn((rvn - F.lit(2.0)) / F.sqrt(var), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# ts_crosscorr + ts_granger (shared hourly click/purchase spine)
# ---------------------------------------------------------------------------

_CC_X, _CC_Y = "click", "purchase"
_CC_MAXLAG = 7

_HOUR_SQL = f"""
    hrs AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(SUM(CASE WHEN event_type = '{_CC_X}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = '{_CC_Y}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1),
    ser AS (
        SELECT x, y, ROW_NUMBER() OVER (ORDER BY h) AS t FROM hrs)
"""


def _hour_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hrs = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(F.when(F.col("event_type") == _CC_X, 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == _CC_Y, 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    w = Window.orderBy("h")
    return hrs.select("x", "y", F.row_number().over(w).alias("t"))


def _cc_oracle() -> str:
    return f"""
    WITH {_HOUR_SQL},
    lags AS (
        SELECT CAST(UNNEST(range(-{_CC_MAXLAG}, {_CC_MAXLAG + 1}))
                    AS BIGINT) AS lag),
    pairs AS (
        SELECT lags.lag, a.x AS x, b.y AS y
        FROM lags JOIN ser a ON TRUE
                  JOIN ser b ON b.t = a.t + lags.lag),
    s AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM pairs GROUP BY 1)
    SELECT lag, n AS n_pairs,
           {sql_roundn(
               "(n * CAST(sxy AS DOUBLE) - sx * 1.0e0 * sy)"
               " / sqrt((n * CAST(sxx AS DOUBLE) - sx * 1.0e0 * sx)"
               "        * (n * CAST(syy AS DOUBLE) - sy * 1.0e0 * sy))",
               6)} AS ccf
    FROM s ORDER BY lag
    """


@query("ts_crosscorr", oracle=_cc_oracle())
def ts_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS tier — lagged CROSS-CORRELATION function between the hourly
    click and purchase streams: ccf(l) = corr(x_t, y_{t+l}) for
    l ∈ [−7, 7] — positive-lag peaks mean clicks LEAD purchases (the
    lead-lag discovery step whose confirmatory test is ts_granger).
    Each lag's correlation is the plain Pearson r of the lag-aligned
    pairs (observation-indexed spine).

    Exactness: hourly counts are exact ints; per-lag moment sums widen
    to HUGEINT/decimal; one identical closed-form r per lag.

    100 TB: the lag spine is 15 literal rows broadcast against the
    hour-grain series (calendar-bounded); one aggregate per lag."""
    ser = _hour_series(spark, sf_dir)
    ser = ser.localCheckpoint(eager=False)  # both join sides
    lags = ser.sparkSession.range(
        -_CC_MAXLAG, _CC_MAXLAG + 1
    ).select(F.col("id").alias("lag"))
    a, b = ser.alias("a"), ser.alias("b")
    pairs = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("b.t") == F.col("a.t") + F.col("lag"))
        .select("lag", F.col("a.x").alias("x"), F.col("b.y").alias("y"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
    )
    r = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx") * F.lit(1.0) * F.col("sy")
    ) / F.sqrt(
        (
            F.col("n") * F.col("sxx").cast("double")
            - F.col("sx") * F.lit(1.0) * F.col("sx")
        )
        * (
            F.col("n") * F.col("syy").cast("double")
            - F.col("sy") * F.lit(1.0) * F.col("sy")
        )
    )
    return s.select(
        "lag",
        F.col("n").alias("n_pairs"),
        roundn(r / F.lit(1.0), 6).alias("ccf"),
    ).orderBy("lag")


def _granger_oracle() -> str:
    return f"""
    WITH {_HOUR_SQL},
    obs AS (
        SELECT b.y AS d, a.y AS ay, a.x AS bx
        FROM ser a JOIN ser b ON b.t = a.t + 1),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ay) AS BIGINT) AS sa, CAST(SUM(bx) AS BIGINT) AS sb,
               CAST(SUM(d) AS BIGINT) AS sd,
               SUM(CAST(ay AS HUGEINT) * ay) AS saa,
               SUM(CAST(bx AS HUGEINT) * bx) AS sbb,
               SUM(CAST(ay AS HUGEINT) * bx) AS sab,
               SUM(CAST(ay AS HUGEINT) * d) AS sad,
               SUM(CAST(bx AS HUGEINT) * d) AS sbd,
               SUM(CAST(d AS HUGEINT) * d) AS sdd
        FROM obs),
    c AS (
        SELECT n,
               n * CAST(saa AS DOUBLE) - sa * 1.0e0 * sa AS caa,
               n * CAST(sbb AS DOUBLE) - sb * 1.0e0 * sb AS cbb,
               n * CAST(sab AS DOUBLE) - sa * 1.0e0 * sb AS cab,
               n * CAST(sad AS DOUBLE) - sa * 1.0e0 * sd AS cad,
               n * CAST(sbd AS DOUBLE) - sb * 1.0e0 * sd AS cbd,
               n * CAST(sdd AS DOUBLE) - sd * 1.0e0 * sd AS cdd
        FROM s),
    fit AS (
        SELECT n,
               (cad * cbb - cbd * cab) / (caa * cbb - cab * cab) AS b1,
               (caa * cbd - cab * cad) / (caa * cbb - cab * cab) AS b2,
               caa, cab, cbb, cad, cbd, cdd
        FROM c),
    fin AS (
        SELECT n, b1, b2,
               (cdd - cad * cad / caa) / (n * 1.0e0) AS rss_r,
               (cdd - b1 * cad - b2 * cbd) / (n * 1.0e0) AS rss_u
        FROM fit)
    SELECT n,
           {sql_roundn("b1", 8)} AS beta_y_lag,
           {sql_roundn("b2", 8)} AS beta_x_lag,
           {sql_roundn("rss_r", 4)} AS rss_restricted,
           {sql_roundn("rss_u", 4)} AS rss_unrestricted,
           {sql_roundn(
               "(rss_r - rss_u) / (rss_u / (n - 3.0e0))", 6)} AS f_stat
    FROM fin
    """


@query("ts_granger", oracle=_granger_oracle())
def ts_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS tier — GRANGER lag-1 causality test, click → purchase:
    compare y_t = α + β₁y_{t−1} (restricted) against y_t = α +
    β₁y_{t−1} + β₂x_{t−1} (unrestricted) via the nested-OLS F-statistic
    F = (RSS_r − RSS_u)/(RSS_u/(n−3)) — "do lagged clicks improve the
    purchase forecast beyond purchase's own history", the confirmatory
    test for whatever ts_crosscorr's positive lags suggest. Both
    regressions solve in closed form from centered moment sums (no
    iterative fitting).

    Exactness: all 9 moment sums are exact HUGEINT/decimal from
    integer counts; centering, the 2×2 solve, RSS and F are one
    identical double sequence per engine.

    100 TB: one aggregate over the calendar-bounded hour spine; 1-row
    state after."""
    ser = _hour_series(spark, sf_dir)
    ser = ser.localCheckpoint(eager=False)
    a, b = ser.alias("a"), ser.alias("b")
    obs = a.join(b, F.col("b.t") == F.col("a.t") + 1).select(
        F.col("b.y").alias("d"),
        F.col("a.y").alias("ay"),
        F.col("a.x").alias("bx"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = obs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ay").cast("long").alias("sa"),
        F.sum("bx").cast("long").alias("sb"),
        F.sum("d").cast("long").alias("sd"),
        F.sum(dec("ay") * F.col("ay")).alias("saa"),
        F.sum(dec("bx") * F.col("bx")).alias("sbb"),
        F.sum(dec("ay") * F.col("bx")).alias("sab"),
        F.sum(dec("ay") * F.col("d")).alias("sad"),
        F.sum(dec("bx") * F.col("d")).alias("sbd"),
        F.sum(dec("d") * F.col("d")).alias("sdd"),
    )
    n = F.col("n")
    caa = n * F.col("saa").cast("double") - F.col("sa") * F.lit(1.0) * F.col("sa")
    cbb = n * F.col("sbb").cast("double") - F.col("sb") * F.lit(1.0) * F.col("sb")
    cab = n * F.col("sab").cast("double") - F.col("sa") * F.lit(1.0) * F.col("sb")
    cad = n * F.col("sad").cast("double") - F.col("sa") * F.lit(1.0) * F.col("sd")
    cbd = n * F.col("sbd").cast("double") - F.col("sb") * F.lit(1.0) * F.col("sd")
    cdd = n * F.col("sdd").cast("double") - F.col("sd") * F.lit(1.0) * F.col("sd")
    det = caa * cbb - cab * cab
    b1 = (cad * cbb - cbd * cab) / det
    b2 = (caa * cbd - cab * cad) / det
    rss_r = (cdd - cad * cad / caa) / (n * F.lit(1.0))
    rss_u = (cdd - b1 * cad - b2 * cbd) / (n * F.lit(1.0))
    return s.select(
        "n",
        roundn(b1, 8).alias("beta_y_lag"),
        roundn(b2, 8).alias("beta_x_lag"),
        roundn(rss_r, 4).alias("rss_restricted"),
        roundn(rss_u, 4).alias("rss_unrestricted"),
        roundn((rss_r - rss_u) / (rss_u / (n - F.lit(3.0))), 6).alias(
            "f_stat"
        ),
    )
