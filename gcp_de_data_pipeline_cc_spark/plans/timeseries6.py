"""Round-7 wave: long-memory, regularity and partial-correlation
diagnostics on the daily revenue series.

Three operators a time-series monitoring tier runs before trusting a
forecasting or anomaly baseline:

* ``ts_hurst_rs`` — the Hurst exponent by rescaled-range analysis:
  H > 0.5 means long-memory persistence (trends compound), H < 0.5
  anti-persistence — the diagnostic that says whether ts_holt-style
  exponential smoothing is even applicable.
* ``ts_sample_entropy`` — SampEn(m=2, r=0.2σ): the regularity score
  (low = repetitive/predictable, high = irregular) used to gate
  anomaly-detector sensitivity.
* ``ts_pacf_durbin`` — partial autocorrelations at lags 1–3 via the
  Durbin–Levinson recursion on the lag correlations: the classic
  AR-order selector (PACF cuts off at the true AR order).

Reference parity: the reference repo (AdepuAdithya/gcp-de-data-pipeline-cc,
Airflow DAG orchestration — dags/*.py) has no time-series engine; these
derive from the driver's mandate on public algorithms only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

# ---------------------------------------------------------------------------
# shared: the daily revenue series in integer DOLLARS (calendar-bounded;
# dollar grain keeps every squared moment below 2^63 at any SF)
# ---------------------------------------------------------------------------

_DAILY_SQL = """
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(FLOOR(SUM(CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                                AS BIGINT)) / 100.0e0) AS BIGINT) AS x
    FROM orders GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    return o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.floor(F.sum(cents) / F.lit(100.0)).cast("long").alias("x")
    )


# ---------------------------------------------------------------------------
# ts_hurst_rs
# ---------------------------------------------------------------------------

#: R/S window sizes (powers of two so every log is clean) and the
#: precomputed least-squares slope coefficients over ln(scale) — Python
#: literals embedded in BOTH engines, so the regression is a fixed
#: linear combination of the four ln(avg_RS) values
_HURST_SCALES = (8, 16, 32, 64)
_HURST_COEF = (
    -0.432808512266689,
    -0.14426950408889622,
    0.14426950408889658,
    0.43280851226668915,
)


def _hurst_oracle() -> str:
    per_scale = []
    for s in _HURST_SCALES:
        per_scale.append(f"""
    blk{s} AS (
        SELECT (i - 1) // {s} AS b, i, x,
               SUM(x) OVER (PARTITION BY (i - 1) // {s}
                            ORDER BY i) AS cum,
               SUM(x) OVER (PARTITION BY (i - 1) // {s}) AS tot,
               SUM(x * x) OVER (PARTITION BY (i - 1) // {s}) AS tot2,
               COUNT(*) OVER (PARTITION BY (i - 1) // {s}) AS m
        FROM idx),
    dev{s} AS (
        SELECT b, cum - (i - ((b) * {s})) * (tot * 1.0e0 / {s}) AS z,
               tot, tot2
        FROM blk{s} WHERE m = {s}),
    rs{s} AS (
        SELECT b,
               CAST(FLOOR((MAX(z) - MIN(z)) * {s}
                          / sqrt(CAST({s} * MAX(tot2) - MAX(tot) * MAX(tot)
                                      AS DOUBLE))
                          * 1000000.0e0 + 0.5e0) AS BIGINT) AS rsq
        FROM dev{s}
        GROUP BY b
        HAVING {s} * MAX(tot2) - MAX(tot) * MAX(tot) > 0),
    a{s} AS (
        SELECT CAST(SUM(rsq) AS BIGINT) AS srs,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM rs{s})""")
    avg = {
        s: f"(CAST(a{s}.srs AS DOUBLE) / a{s}.nb / 1000000.0e0)"
        for s in _HURST_SCALES
    }
    hurst = " + ".join(
        f"({c!r} * ln({avg[s]}))"
        for c, s in zip(_HURST_COEF, _HURST_SCALES)
    )
    return f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily),
    {",".join(per_scale)}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           {sql_roundn(avg[8], 6)} AS rs8,
           {sql_roundn(avg[16], 6)} AS rs16,
           {sql_roundn(avg[32], 6)} AS rs32,
           {sql_roundn(avg[64], 6)} AS rs64,
           {sql_roundn(hurst, 4)} AS hurst
    FROM a8 CROSS JOIN a16 CROSS JOIN a32 CROSS JOIN a64
    """


@query("ts_hurst_rs", oracle=_hurst_oracle())
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — HURST EXPONENT by classic RESCALED-RANGE (R/S)
    analysis (Hurst 1951; Mandelbrot & Wallis 1969) on the daily
    revenue series: split the day-indexed series into complete blocks
    of 8/16/32/64 days, per block compute the range of mean-adjusted
    cumulative sums over the population std, average R/S per scale,
    and fit ln(R/S) against ln(scale) — the slope IS the Hurst
    exponent.  H≈0.5 random walk, H>0.5 long-memory persistence
    (trend-following baselines justified), H<0.5 mean reversion.

    Exactness: the series is integer dollars so block moments are
    exact int64 (s·Σx² − (Σx)² fits at any SF); per-block R/S
    quantizes to integer micro-units so the per-scale mean is an EXACT
    integer sum / count; the regression is a FIXED linear combination
    of four ln values (slope coefficients precomputed as shared Python
    literals).

    100 TB: the daily rollup is map-side combined to a
    CALENDAR-BOUNDED relation; every window below partitions by
    (scale, block) — ≤64-row state."""
    daily = _daily(spark, sf_dir)
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("i")
    )
    idx = idx.localCheckpoint(eager=False)  # four scale passes
    aggs = []
    for s in _HURST_SCALES:
        b = F.floor((F.col("i") - 1) / F.lit(s)).cast("long")
        wb = Window.partitionBy("b").orderBy("i")
        wall = Window.partitionBy("b")
        blk = idx.select("i", "x", b.alias("b")).select(
            "b",
            "i",
            F.sum("x").over(wb).alias("cum"),
            F.sum("x").over(wall).alias("tot"),
            F.sum(F.col("x") * F.col("x")).over(wall).alias("tot2"),
            F.count("*").over(wall).alias("m"),
        )
        dev = blk.filter(F.col("m") == s).select(
            "b",
            (
                F.col("cum")
                - (F.col("i") - F.col("b") * s)
                * (F.col("tot") * F.lit(1.0) / F.lit(float(s)))
            ).alias("z"),
            "tot",
            "tot2",
        )
        num = F.lit(s) * F.max("tot2") - F.max("tot") * F.max("tot")
        rs = (
            dev.groupBy("b")
            .agg(
                F.floor(
                    (F.max("z") - F.min("z"))
                    * F.lit(float(s))
                    / F.sqrt(num.cast("double"))
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("rsq"),
                num.alias("den"),
            )
            .filter(F.col("den") > 0)
        )
        aggs.append(
            rs.agg(
                F.sum("rsq").cast("long").alias(f"srs{s}"),
                F.count("*").cast("long").alias(f"nb{s}"),
            )
        )
    out = aggs[0]
    for a in aggs[1:]:
        out = out.crossJoin(F.broadcast(a))
    nd = daily.agg(F.count("*").cast("long").alias("n_days"))
    avg = {
        s: F.col(f"srs{s}").cast("double") / F.col(f"nb{s}") / F.lit(1e6)
        for s in _HURST_SCALES
    }
    hurst = None
    for c, s in zip(_HURST_COEF, _HURST_SCALES):
        term = F.lit(c) * F.log(avg[s])
        hurst = term if hurst is None else hurst + term
    return out.crossJoin(F.broadcast(nd)).select(
        "n_days",
        roundn(avg[8], 6).alias("rs8"),
        roundn(avg[16], 6).alias("rs16"),
        roundn(avg[32], 6).alias("rs32"),
        roundn(avg[64], 6).alias("rs64"),
        roundn(hurst, 4).alias("hurst"),
    )


# ---------------------------------------------------------------------------
# ts_sample_entropy
# ---------------------------------------------------------------------------

_SAMPEN_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
seq AS (
    SELECT x,
           LEAD(x, 1) OVER (ORDER BY day) AS x1,
           LEAD(x, 2) OVER (ORDER BY day) AS x2,
           ROW_NUMBER() OVER (ORDER BY day) AS i
    FROM daily),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s1,
           CAST(SUM(x * x) AS BIGINT) AS s2
    FROM daily),
tol AS (
    SELECT CAST(FLOOR(0.2e0 * sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      / n) AS BIGINT) AS r
    FROM mom),
tmpl AS (
    SELECT i, x, x1, x2 FROM seq WHERE x2 IS NOT NULL),
cnt AS (
    SELECT CAST(SUM(CASE WHEN ABS(a.x - b.x) <= t.r
                          AND ABS(a.x1 - b.x1) <= t.r
                         THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt,
           CAST(SUM(CASE WHEN ABS(a.x - b.x) <= t.r
                          AND ABS(a.x1 - b.x1) <= t.r
                          AND ABS(a.x2 - b.x2) <= t.r
                         THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt
    FROM tmpl a JOIN tmpl b ON a.i < b.i CROSS JOIN tol t)
SELECT (SELECT n FROM mom) AS n_days,
       (SELECT r FROM tol) AS r_dollars,
       b_cnt, a_cnt,
       CASE WHEN a_cnt > 0 THEN
           {sql_roundn("-ln(CAST(a_cnt AS DOUBLE) / b_cnt)", 4)}
       END AS sampen
FROM cnt
"""


@query("ts_sample_entropy", oracle=_SAMPEN_ORACLE)
def ts_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — SAMPLE ENTROPY (Richman & Moorman 2000), m=2,
    r=0.2σ, on the daily revenue series: the regularity statistic that
    gates anomaly-detector sensitivity (a highly regular series can
    afford tight thresholds; an irregular one can't).  SampEn
    = −ln(A/B) where B counts template pairs matching on 2 consecutive
    points within tolerance r (Chebyshev) and A those also matching on
    the 3rd — self-matches excluded by the i<j pair form.

    Exactness: integer-dollar series; the tolerance floors an exact
    integer-moment std to whole dollars, so every match test is an
    integer compare and A/B are exact integers; one ln at the end,
    rounded 4 dp.

    100 TB: the template self-join is CALENDAR-BOUNDED (≤ ~2.4k days
    per TPC-H decade → ≤ 3M pairs regardless of data volume) and runs
    on the broadcast daily rollup, never on raw orders."""
    daily = _daily(spark, sf_dir)
    daily = daily.localCheckpoint(eager=False)  # moments + templates
    wd = Window.orderBy("day")
    seq = daily.select(
        "x",
        F.lead("x", 1).over(wd).alias("x1"),
        F.lead("x", 2).over(wd).alias("x2"),
        F.row_number().over(wd).alias("i"),
    )
    mom = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    tol = mom.select(
        F.floor(
            F.lit(0.2)
            * F.sqrt(
                F.col("n").cast("double") * F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double")
            )
            / F.col("n")
        )
        .cast("long")
        .alias("r")
    )
    tmpl = seq.filter(F.col("x2").isNotNull())
    a, b = tmpl.alias("a"), tmpl.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.i") < F.col("b.i")
    ).crossJoin(F.broadcast(tol))
    m2 = (F.abs(F.col("a.x") - F.col("b.x")) <= F.col("r")) & (
        F.abs(F.col("a.x1") - F.col("b.x1")) <= F.col("r")
    )
    m3 = m2 & (F.abs(F.col("a.x2") - F.col("b.x2")) <= F.col("r"))
    cnt = pairs.agg(
        F.sum(F.when(m2, 1).otherwise(0)).cast("long").alias("b_cnt"),
        F.sum(F.when(m3, 1).otherwise(0)).cast("long").alias("a_cnt"),
    )
    sampen = F.when(
        F.col("a_cnt") > 0,
        roundn(
            -F.log(F.col("a_cnt").cast("double") / F.col("b_cnt")), 4
        ),
    )
    return (
        cnt.crossJoin(F.broadcast(mom.select("n")))
        .crossJoin(F.broadcast(tol))
        .select(
            F.col("n").alias("n_days"),
            F.col("r").alias("r_dollars"),
            "b_cnt",
            "a_cnt",
            sampen.alias("sampen"),
        )
    )


# ---------------------------------------------------------------------------
# ts_pacf_durbin
# ---------------------------------------------------------------------------

_PACF_ORACLE = f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS hour,
           {sql_roundn("SUM(value)", 6)} AS total
    FROM events GROUP BY 1, 2),
lagged AS (
    SELECT event_type, total,
           LAG(total, 1) OVER w AS l1,
           LAG(total, 2) OVER w AS l2,
           LAG(total, 3) OVER w AS l3
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
acf AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           {sql_roundn("corr(total, l1)", 6)} AS r1,
           {sql_roundn("corr(total, l2)", 6)} AS r2,
           {sql_roundn("corr(total, l3)", 6)} AS r3
    FROM lagged GROUP BY event_type),
dl AS (
    SELECT event_type, n_hours, r1, r2, r3,
           (r2 - r1 * r1) / (1.0e0 - r1 * r1) AS phi22
    FROM acf),
dl2 AS (
    SELECT *,
           r1 - phi22 * r1 AS a21,
           (1.0e0 - r1 * r1) * (1.0e0 - phi22 * phi22) AS v2
    FROM dl)
SELECT event_type, n_hours,
       {sql_roundn("r1", 4)} AS pacf1,
       {sql_roundn("phi22", 4)} AS pacf2,
       {sql_roundn("(r3 - a21 * r2 - phi22 * r1) / v2", 4)} AS pacf3
FROM dl2
ORDER BY event_type
"""


@query("ts_pacf_durbin", oracle=_PACF_ORACLE)
def ts_pacf_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — PARTIAL AUTOCORRELATIONS at lags 1–3 via the
    DURBIN–LEVINSON recursion, the AR-order selector that completes
    ts_autocorr (ACF says "how much memory", PACF says "how many AR
    terms"): φ11 = r1; φ22 = (r2−r1²)/(1−r1²); φ33 from the level-2
    coefficients — the recursion unrolled as closed-form expressions
    over the lag correlations, per event type.

    Exactness: the ts_autocorr float discipline — hourly totals round
    at 6 dp BEFORE correlation, the lag correlations round at 6 dp
    BEFORE the recursion, so the Durbin–Levinson arithmetic runs on
    bit-identical doubles in both engines; outputs round at 4.

    100 TB: one keyed hourly aggregate (map-side combined), one window
    shuffle per event_type carrying (hour, total), then per-type
    scalar recursion — hours-per-series state, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(roundn(F.sum("value"), 6).alias("total"))
    w = Window.partitionBy("event_type").orderBy("hour")
    lagged = hourly.select(
        "event_type",
        "total",
        F.lag("total", 1).over(w).alias("l1"),
        F.lag("total", 2).over(w).alias("l2"),
        F.lag("total", 3).over(w).alias("l3"),
    )
    acf = lagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        roundn(F.corr("total", "l1"), 6).alias("r1"),
        roundn(F.corr("total", "l2"), 6).alias("r2"),
        roundn(F.corr("total", "l3"), 6).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi22 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    dl2 = acf.select(
        "*",
        phi22.alias("phi22"),
    ).select(
        "*",
        (r1 - F.col("phi22") * r1).alias("a21"),
        (
            (F.lit(1.0) - r1 * r1)
            * (F.lit(1.0) - F.col("phi22") * F.col("phi22"))
        ).alias("v2"),
    )
    return dl2.select(
        "event_type",
        "n_hours",
        roundn(r1, 4).alias("pacf1"),
        roundn(F.col("phi22"), 4).alias("pacf2"),
        roundn(
            (r3 - F.col("a21") * r2 - F.col("phi22") * r1) / F.col("v2"), 4
        ).alias("pacf3"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# ts_periodogram_fft — the documented long-series swap, delivered
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from gcp_de_data_pipeline_cc_spark.plans.timeseries5 import (  # noqa: E402
    _PG_MAXK,
    _periodogram_oracle,
)


@query("ts_periodogram_fft", oracle=_periodogram_oracle())
def ts_periodogram_fft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — ts_periodogram's documented long-series swap,
    DELIVERED: the same power spectrum via a REAL FFT (numpy rfft) in
    one applyInPandas pass over each type's day-ordered count vector —
    O(N log N) per series where the relational DFT pays O(N·K) sum
    terms, and the win compounds when K grows toward N/2 on long
    series.  SHARES ts_periodogram's oracle VERBATIM (the Tarjan
    shared-oracle discipline): one hash match validates two different
    algorithms computing the same spectrum.

    Exactness: |rfft(x)[k]|² equals (Σx·cos)² + (Σx·sin)² up to
    summation-order ulps ~12 digits below the 2 dp rounding grain
    (the direct key's own float posture); counts are exact integers
    into the transform.

    100 TB: the day collapse is the only event-grain work; each
    series' vector is CALENDAR-BOUNDED (~2.4k days/decade), so the
    per-group pandas transform is constant-size work per series and
    the output is (series × {mk}) rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))

    def spectrum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        x = pdf["cnt"].to_numpy(dtype=np.float64)
        nd = len(x)
        fx = np.fft.rfft(x)
        kmax = min(_PG_MAXK, nd // 2)
        ks = np.arange(1, kmax + 1)
        power = np.floor(
            (np.abs(fx[1 : kmax + 1]) ** 2) / nd * 100.0 + 0.5
        ) / 100.0
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].iloc[0],
                "k": ks.astype("int32"),
                "nd": np.int64(nd),
                "power": power,
            }
        )

    pw = daily.groupBy("event_type").applyInPandas(
        spectrum, "event_type string, k int, nd long, power double"
    )
    pw = pw.localCheckpoint(eager=False)  # rows + the max flag
    mx = pw.groupBy("event_type").agg(F.max("power").alias("pmax"))
    return (
        pw.join(F.broadcast(mx), "event_type")
        .select(
            "event_type",
            F.col("k").cast("int").alias("k"),
            (
                F.floor(
                    F.col("nd").cast("double") / F.col("k") * F.lit(100.0)
                    + F.lit(0.5)
                )
                / F.lit(100.0)
            ).alias("period_days"),
            "power",
            (F.col("power") == F.col("pmax")).cast("int").alias(
                "is_dominant"
            ),
        )
        .orderBy("event_type", "k")
    )


ts_periodogram_fft.__doc__ = ts_periodogram_fft.__doc__.format(mk=_PG_MAXK)


# ---------------------------------------------------------------------------
# attribution_shapley_sampled — the documented >20-channel swap, delivered
# ---------------------------------------------------------------------------

import hashlib  # noqa: E402
import itertools  # noqa: E402

from gcp_de_data_pipeline_cc_spark.plans.timeseries5 import (  # noqa: E402
    _SHAP_CHANNELS,
)

#: deterministic sample of 8 of the 24 channel permutations: md5-rank
#: of the permutation string — the seeded-draw discipline (dp_count's
#: Laplace, dp_exponential's Gumbel) applied to permutation sampling,
#: so both engines consume the IDENTICAL literal spine
_SHAP_M = 8


def _shap_sampled_spine() -> list[tuple[int, int, int]]:
    perms = sorted(
        itertools.permutations(range(len(_SHAP_CHANNELS))),
        key=lambda p: hashlib.md5(
            ("perm:" + "".join(map(str, p))).encode()
        ).hexdigest(),
    )[:_SHAP_M]
    spine = []
    for pid, p in enumerate(perms):
        before = 0
        for d in p:
            spine.append((pid, d, before))
            before |= 1 << d
    return spine


def _shapley_sampled_oracle() -> str:
    bit = " + ".join(
        f"MAX(CASE WHEN event_type = '{ch}' THEN {1 << d} ELSE 0 END)"
        for d, ch in enumerate(_SHAP_CHANNELS)
    )
    rows = ", ".join(
        f"({pid}, {d}, {before})" for pid, d, before in _shap_sampled_spine()
    )
    w24 = (
        "CASE bit_count(v0.s) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2"
        " ELSE 6 END"
    )
    names = " ".join(
        f"WHEN {d} THEN '{ch}'" for d, ch in enumerate(_SHAP_CHANNELS)
    )
    return f"""
    WITH touch AS (
        SELECT user_id,
               CAST({bit} AS BIGINT) AS mask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id),
    conv AS (
        SELECT mask, CAST(SUM(converted) AS BIGINT) AS n_conv
        FROM touch GROUP BY mask),
    sets AS (SELECT UNNEST(range(0, 16)) AS s),
    v AS (
        SELECT s.s, CAST(COALESCE(SUM(c.n_conv), 0) AS BIGINT) AS v
        FROM sets s LEFT JOIN conv c ON (c.mask & s.s) = c.mask
        GROUP BY s.s),
    spine(pid, d, before) AS (VALUES {rows}),
    samp AS (
        SELECT sp.d, CAST(SUM(v1.v - v0.v) AS BIGINT) AS m{_SHAP_M}
        FROM spine sp
        JOIN v v0 ON v0.s = sp.before
        JOIN v v1 ON v1.s = (sp.before | (1 << sp.d))
        GROUP BY sp.d),
    exact AS (
        SELECT ch.d, CAST(SUM(({w24}) * (v1.v - v0.v)) AS BIGINT) AS s24
        FROM (SELECT UNNEST(range(0, {len(_SHAP_CHANNELS)})) AS d) ch
        JOIN v v0 ON (v0.s & (1 << ch.d)) = 0
        JOIN v v1 ON v1.s = (v0.s | (1 << ch.d))
        GROUP BY ch.d),
    full_v AS (
        SELECT MAX(CASE WHEN s = 15 THEN v END) AS v_full,
               MAX(CASE WHEN s = 0 THEN v END) AS v_empty
        FROM v)
    SELECT CASE samp.d {names} ELSE '?' END AS channel,
           samp.m{_SHAP_M} AS sampled_{_SHAP_M}ths,
           FLOOR(samp.m{_SHAP_M} / {_SHAP_M}.0e0 * 10000.0e0 + 0.5e0)
               / 10000.0e0 AS sampled_conversions,
           exact.s24 AS exact_24ths,
           FLOOR((samp.m{_SHAP_M} / {_SHAP_M}.0e0
                  - exact.s24 / 24.0e0) * 10000.0e0 + 0.5e0) / 10000.0e0
               AS gap_conversions,
           CAST(full_v.v_full - full_v.v_empty AS BIGINT)
               AS attributable_conversions
    FROM samp JOIN exact ON exact.d = samp.d CROSS JOIN full_v
    ORDER BY channel
    """


@query("attribution_shapley_sampled", oracle=_shapley_sampled_oracle())
def attribution_shapley_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Attribution tier — PERMUTATION-SAMPLED Shapley, the documented
    >~20-channel swap of attribution_shapley delivered as code
    (Castro et al. 2009's simple random-order estimator): φ̂_c =
    (1/M)·Σ_sampled-perms [v(before(c) ∪ {{c}}) − v(before(c))], with
    M = {m} permutations drawn DETERMINISTICALLY by md5-rank (the
    seeded-draw discipline, so the sample is replayable and the
    oracle consumes the identical literal spine).  The estimator's
    telescoping efficiency (Σ_c φ̂_c = v(full) − v(∅) EXACTLY for any
    permutation set) is the test-pinned law, and the exact 24ths are
    emitted beside the estimate so the SAMPLING ERROR per channel is
    the visible diagnostic — the honest exhibit of what the swap
    trades at 4 channels, where exact enumeration still fits.

    Exactness: FULLY INTEGER — sampled marginal sums accumulate in
    exact {m}ths next to the exact 24ths; two floored readout
    divisions.

    100 TB: identical fact-table profile to the exact key (ONE
    user-grain bit-OR aggregate); the estimator's state is M·k spine
    rows joined twice against the 2^k lattice — at 20+ channels the
    lattice join is replaced by per-permutation coalition masks and
    cost is O(M·k) regardless of 2^k, which is the point."""
    ev = load_table(spark, sf_dir, "events")
    mask = None
    for d, chn in enumerate(_SHAP_CHANNELS):
        term = F.max(
            F.when(F.col("event_type") == chn, F.lit(1 << d)).otherwise(0)
        )
        mask = term if mask is None else mask + term
    touch = ev.groupBy("user_id").agg(
        mask.cast("long").alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    conv = touch.groupBy("mask").agg(
        F.sum("converted").cast("long").alias("n_conv")
    )
    sets = spark.range(0, 16).select(F.col("id").cast("long").alias("s"))
    v = (
        sets.join(
            F.broadcast(conv),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).cast("long").alias("v"))
    )
    v = v.localCheckpoint(eager=False)  # spine joins + exact + full
    spine = spark.createDataFrame(
        _shap_sampled_spine(), "pid INT, d INT, before BIGINT"
    )
    v0 = v.select(F.col("s").alias("before"), F.col("v").alias("vb"))
    v1 = v.select(F.col("s").alias("after"), F.col("v").alias("va"))
    samp = (
        spine.join(F.broadcast(v0), "before")
        .withColumn(
            "after",
            F.col("before").bitwiseOR(
                F.expr("shiftleft(CAST(1 AS BIGINT), d)")
            ),
        )
        .join(F.broadcast(v1), "after")
        .groupBy("d")
        .agg(F.sum(F.col("va") - F.col("vb")).cast("long").alias("m_s"))
    )
    w24 = (
        F.when(F.bit_count(F.col("b.s")) == 0, 6)
        .when(F.bit_count(F.col("b.s")) == 1, 2)
        .when(F.bit_count(F.col("b.s")) == 2, 2)
        .otherwise(6)
    )
    ch = spark.range(0, len(_SHAP_CHANNELS)).select(
        F.col("id").cast("int").alias("d")
    )
    exact = (
        ch.crossJoin(F.broadcast(v.alias("b")))
        .filter(
            F.col("b.s").bitwiseAND(
                F.expr("shiftleft(CAST(1 AS BIGINT), d)")
            )
            == 0
        )
        .withColumn(
            "after",
            F.col("b.s").bitwiseOR(
                F.expr("shiftleft(CAST(1 AS BIGINT), d)")
            ),
        )
        .join(F.broadcast(v1), "after")
        .groupBy("d")
        .agg(
            F.sum(w24 * (F.col("va") - F.col("b.v")))
            .cast("long")
            .alias("s24")
        )
    )
    full_v = v.agg(
        F.max(F.when(F.col("s") == 15, F.col("v"))).alias("v_full"),
        F.max(F.when(F.col("s") == 0, F.col("v"))).alias("v_empty"),
    )
    name = None
    for d, chn in enumerate(_SHAP_CHANNELS):
        cond = F.when(F.col("d") == d, chn)
        name = cond if name is None else name.when(F.col("d") == d, chn)
    return (
        samp.join(exact, "d")
        .crossJoin(F.broadcast(full_v))
        .select(
            name.otherwise("?").alias("channel"),
            F.col("m_s").alias(f"sampled_{_SHAP_M}ths"),
            (
                F.floor(
                    F.col("m_s") / F.lit(float(_SHAP_M)) * F.lit(10000.0)
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("sampled_conversions"),
            F.col("s24").alias("exact_24ths"),
            (
                F.floor(
                    (
                        F.col("m_s") / F.lit(float(_SHAP_M))
                        - F.col("s24") / F.lit(24.0)
                    )
                    * F.lit(10000.0)
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("gap_conversions"),
            (F.col("v_full") - F.col("v_empty"))
            .cast("long")
            .alias("attributable_conversions"),
        )
        .orderBy("channel")
    )


attribution_shapley_sampled.__doc__ = attribution_shapley_sampled.__doc__.format(
    m=_SHAP_M
)
