"""Round-8 wave: frequency-domain and portmanteau time-series
diagnostics.

* ``ts_ljung_box`` — the Ljung–Box portmanteau test: is a series white
  noise across the first H autocorrelations jointly?  The residual
  check every fitted forecaster (ts_holt_winters, ts_rolling_ols)
  implicitly assumes; the single-lag readouts (ts_autocorr, ts_pacf)
  cannot answer "is anything left".
* ``ts_spectral_entropy`` — Shannon entropy of the normalized
  periodogram: 0 = one pure cycle, 1 = white-noise-flat spectrum; the
  one-number forecastability score on top of ts_periodogram's
  per-frequency table.

Reference parity: the reference repo (AdepuAdithya/gcp-de-data-pipeline-cc,
Airflow DAG orchestration — dags/*.py) contains no time-series engine;
these derive from the driver's analytics mandate on public formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

# ---------------------------------------------------------------------------
# ts_ljung_box
# ---------------------------------------------------------------------------

#: number of autocorrelation lags pooled into Q
_LB_H = 10
#: chi-square 0.05 critical value at df = H
_LB_CRIT = 18.307038


def _lb_oracle() -> str:
    h = _LB_H
    leads = ",\n               ".join(
        f"LEAD(d, {k}) OVER (PARTITION BY event_type ORDER BY rn) AS d{k}"
        for k in range(1, h + 1)
    )
    cks = ",\n               ".join(
        f"SUM(CAST(d AS DECIMAL(19,0)) * CAST(d{k} AS DECIMAL(19,0))) AS c{k}"
        for k in range(1, h + 1)
    )
    qterms = " + ".join(
        f"CAST(FLOOR(CAST(c{k} AS DOUBLE) * CAST(c{k} AS DOUBLE)"
        f" / (CAST(c0 AS DOUBLE) * CAST(c0 AS DOUBLE))"
        f" / (n - {k}) * 1000000000000.0e0 + 0.5e0) AS BIGINT)"
        for k in range(1, h + 1)
    )
    return f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(SUM(CAST(FLOOR(value * 1000000.0e0 + 0.5e0)
                             AS BIGINT)) AS BIGINT) AS t_int
        FROM events GROUP BY 1, 2),
    idx AS (
        SELECT event_type, t_int,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour)
                   AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n,
               SUM(t_int) OVER (PARTITION BY event_type) AS s
        FROM hourly),
    dev AS (
        SELECT event_type, rn, n, n * t_int - s AS d FROM idx),
    lagd AS (
        SELECT event_type, n, d,
               {leads}
        FROM dev),
    mom AS (
        SELECT event_type, CAST(ANY_VALUE(n) AS BIGINT) AS n,
               SUM(CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0)))
                   AS c0,
               {cks}
        FROM lagd GROUP BY event_type),
    q AS (
        SELECT event_type, n,
               CAST(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
                    AS DOUBLE) AS rho1,
               ({qterms}) AS qq
        FROM mom)
    SELECT event_type, n AS n_hours,
           {sql_roundn("rho1 / 1.0e0", 6)} AS rho1,
           {sql_roundn(
               "n * (n + 2.0e0) * (qq / 1000000000000.0e0) / 1.0e0", 6)}
               AS q{h},
           n * (n + 2.0e0) * (qq / 1000000000000.0e0) > {_LB_CRIT}e0
               AS reject_05
    FROM q
    ORDER BY event_type
    """


@query("ts_ljung_box", oracle=_lb_oracle())
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — LJUNG–BOX portmanteau white-noise test per event
    type: Q = n(n+2)·Σ_{{k=1..{h}}} ρ̂_k²/(n−k) over the hourly-volume
    series ~ χ²({h}) under independence — the JOINT test across the
    first {h} autocorrelations that the per-lag readouts (ts_autocorr,
    ts_pacf_durbin) cannot give, and the standard residual diagnostic
    after any forecast fit.  reject_05 compares against the fixed
    χ²₀.₀₅({h}) = {crit} critical value.

    Exactness: hourly totals snap to integer micro-units per ROW
    (order-free int sums, no double accumulation); deviations n·x−S
    are exact int64; every autocovariance accumulates d·d_k products
    in DECIMAL(19,0)×DECIMAL(19,0) (exact in any order, the ts_twap
    idiom); each ρ²/(n−k) term quantizes ONCE to 1e-12 units and
    int-sums across the {h} fixed lags.

    100 TB: one keyed aggregation to hourly grain, ONE window shuffle
    per series carrying (hour, deviation) for all {h} LEADs, then a
    map-side-combinable decimal aggregate — hours-per-series state,
    never raw events."""
    ev = load_table(spark, sf_dir, "events")
    h = _LB_H
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.sum(
            F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("t_int")
    )
    wp = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("hour")
    dev = hourly.select(
        "event_type",
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wp).alias("n"),
        (
            F.count("*").over(wp) * F.col("t_int")
            - F.sum("t_int").over(wp)
        ).alias("d"),
    )
    wl = Window.partitionBy("event_type").orderBy("rn")
    lagd = dev.select(
        "event_type",
        "n",
        "d",
        *[F.lead("d", k).over(wl).alias(f"d{k}") for k in range(1, h + 1)],
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    mom = lagd.groupBy("event_type").agg(
        F.any_value("n").cast("long").alias("n"),
        F.sum(dec("d") * dec("d")).alias("c0"),
        *[
            F.sum(dec("d") * dec(f"d{k}")).alias(f"c{k}")
            for k in range(1, h + 1)
        ],
    )
    qq = None
    for k in range(1, h + 1):
        term = F.floor(
            F.col(f"c{k}").cast("double")
            * F.col(f"c{k}").cast("double")
            / (F.col("c0").cast("double") * F.col("c0").cast("double"))
            / (F.col("n") - F.lit(k))
            * F.lit(1.0e12)
            + F.lit(0.5)
        ).cast("long")
        qq = term if qq is None else qq + term
    qstat = (
        F.col("n")
        * (F.col("n") + F.lit(2.0))
        * (F.col("qq") / F.lit(1.0e12))
    )
    return (
        mom.withColumn("qq", qq)
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            roundn(
                F.col("c1").cast("double") / F.col("c0").cast("double")
                / F.lit(1.0),
                6,
            ).alias("rho1"),
            roundn(qstat / F.lit(1.0), 6).alias(f"q{h}"),
            (qstat > F.lit(_LB_CRIT)).alias("reject_05"),
        )
        .orderBy("event_type")
    )


ts_ljung_box.__doc__ = ts_ljung_box.__doc__.format(h=_LB_H, crit=_LB_CRIT)


# ---------------------------------------------------------------------------
# ts_spectral_entropy
# ---------------------------------------------------------------------------

#: frequencies probed — identical to ts_periodogram's spine
_SE_MAXK = 14
_SE_PI = "3.141592653589793"


def _se_oracle() -> str:
    return f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
    idx AS (
        SELECT event_type, cnt,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   - 1 AS t,
               COUNT(*) OVER (PARTITION BY event_type) AS nd
        FROM daily),
    ks AS (SELECT UNNEST(range(1, {_SE_MAXK + 1})) AS k),
    terms AS (
        SELECT idx.event_type, ks.k, idx.nd,
               idx.cnt * cos(2.0e0 * {_SE_PI}e0 * ks.k * idx.t / idx.nd)
                   AS cr,
               idx.cnt * sin(2.0e0 * {_SE_PI}e0 * ks.k * idx.t / idx.nd)
                   AS ci
        FROM idx CROSS JOIN ks WHERE ks.k * 2 <= idx.nd),
    spec AS (
        SELECT event_type, k, MIN(nd) AS nd,
               SUM(cr) AS a, SUM(ci) AS b
        FROM terms GROUP BY event_type, k),
    pw AS (
        SELECT event_type, k,
               CAST(FLOOR((a * a + b * b) / nd * 100.0e0 + 0.5e0)
                    AS BIGINT) AS p100
        FROM spec),
    tot AS (
        SELECT event_type, CAST(SUM(p100) AS BIGINT) AS s100,
               CAST(COUNT(*) AS BIGINT) AS m,
               CAST(MAX(p100) AS BIGINT) AS pmax
        FROM pw GROUP BY 1),
    ent AS (
        SELECT pw.event_type,
               CAST(SUM(CAST(FLOOR(
                   -(pw.p100 * 1.0e0 / tot.s100)
                    * ln(pw.p100 * 1.0e0 / tot.s100)
                    * 1000000000.0e0 + 0.5e0) AS BIGINT)) AS BIGINT) AS eq
        FROM pw JOIN tot USING (event_type)
        WHERE pw.p100 > 0
        GROUP BY 1)
    SELECT tot.event_type, tot.m AS m_freqs,
           {sql_roundn("tot.pmax * 1.0e0 / tot.s100 / 1.0e0", 6)}
               AS dominant_share,
           {sql_roundn("ent.eq / 1000000000.0e0 / 1.0e0", 6)}
               AS spectral_entropy,
           {sql_roundn(
               "ent.eq / 1000000000.0e0 / ln(tot.m * 1.0e0)", 6)}
               AS entropy_norm
    FROM tot JOIN ent USING (event_type)
    ORDER BY tot.event_type
    """


@query("ts_spectral_entropy", oracle=_se_oracle())
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — SPECTRAL ENTROPY per event type: Shannon entropy
    of the normalized periodogram H = −Σ p_k·ln p_k (p_k = P_k/ΣP over
    the k = 1..{mk} frequency spine shared VERBATIM with
    ts_periodogram), normalized by ln(m) → 0 = a single pure cycle
    carries all variance (forecast it), 1 = flat white-noise spectrum
    (don't) — the one-number forecastability score feature pipelines
    attach to every series before choosing a model
    (ts_seasonality_strength answers "how strong is THE cycle"; this
    answers "is there any structure at all").

    Exactness: powers are the periodogram's own 2-dp-rounded values
    scaled to exact integer hundredths, so shares p_k are exact
    rationals; each −p·ln p term quantizes ONCE to nano-units and
    int-sums (order-free); zero-power frequencies drop in both engines
    (lim p→0 of −p·ln p = 0), and a series whose ENTIRE spectrum
    rounds to zero (all variance orthogonal to the k ≤ {mk} spine)
    drops from the output in both engines — the inner join is the
    documented degenerate-case rule.

    100 TB: identical cost class to ts_periodogram — the day collapse
    is the only event-grain work; entropy is (series × {mk}) state."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    wd = Window.partitionBy("event_type").orderBy("day")
    wp = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "cnt",
        (F.row_number().over(wd) - 1).alias("t"),
        F.count("*").over(wp).alias("nd"),
    )
    ks = spark.range(1, _SE_MAXK + 1).select(F.col("id").alias("k"))
    ang = (
        F.lit(2.0)
        * F.lit(float(_SE_PI))
        * F.col("k")
        * F.col("t")
        / F.col("nd")
    )
    terms = (
        idx.crossJoin(F.broadcast(ks))
        .filter(F.col("k") * 2 <= F.col("nd"))
        .select(
            "event_type",
            "k",
            "nd",
            (F.col("cnt") * F.cos(ang)).alias("cr"),
            (F.col("cnt") * F.sin(ang)).alias("ci"),
        )
    )
    pw = (
        terms.groupBy("event_type", "k")
        .agg(
            F.min("nd").alias("nd"),
            F.sum("cr").alias("a"),
            F.sum("ci").alias("b"),
        )
        .select(
            "event_type",
            "k",
            F.floor(
                (F.col("a") * F.col("a") + F.col("b") * F.col("b"))
                / F.col("nd")
                * F.lit(100.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("p100"),
        )
    )
    pw = pw.localCheckpoint(eager=False)  # tot + ent
    tot = pw.groupBy("event_type").agg(
        F.sum("p100").cast("long").alias("s100"),
        F.count("*").cast("long").alias("m"),
        F.max("p100").cast("long").alias("pmax"),
    )
    share = F.col("p100") * F.lit(1.0) / F.col("s100")
    ent = (
        pw.join(F.broadcast(tot), "event_type")
        .filter(F.col("p100") > 0)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.floor(
                    -share * F.log(share) * F.lit(1.0e9) + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("eq")
        )
    )
    return (
        tot.join(ent, "event_type")
        .select(
            "event_type",
            F.col("m").alias("m_freqs"),
            roundn(
                F.col("pmax") * F.lit(1.0) / F.col("s100") / F.lit(1.0), 6
            ).alias("dominant_share"),
            roundn(F.col("eq") / F.lit(1.0e9) / F.lit(1.0), 6).alias(
                "spectral_entropy"
            ),
            roundn(
                F.col("eq") / F.lit(1.0e9) / F.log(F.col("m") * F.lit(1.0)),
                6,
            ).alias("entropy_norm"),
        )
        .orderBy("event_type")
    )


ts_spectral_entropy.__doc__ = ts_spectral_entropy.__doc__.format(mk=_SE_MAXK)


# ---------------------------------------------------------------------------
# ts_page_hinkley
# ---------------------------------------------------------------------------

#: alarm threshold in null-scale units (PH / (sigma * sqrt(n)))
_PH_LAMBDA = 3.0


def _ph_oracle() -> str:
    return f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(SUM(CAST(FLOOR(value * 1000000.0e0 + 0.5e0)
                             AS BIGINT)) AS BIGINT) AS t_int
        FROM events GROUP BY 1, 2),
    idx AS (
        SELECT event_type, t_int,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour)
                   AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n,
               SUM(t_int) OVER (PARTITION BY event_type) AS s
        FROM hourly),
    dev AS (
        SELECT event_type, rn, n, n * t_int - s AS d FROM idx),
    walk AS (
        SELECT event_type, rn, n, d,
               SUM(d) OVER (PARTITION BY event_type ORDER BY rn
                            ROWS UNBOUNDED PRECEDING) AS g
        FROM dev),
    cum AS (
        SELECT event_type, rn, n, g,
               MIN(g) OVER (PARTITION BY event_type ORDER BY rn
                            ROWS UNBOUNDED PRECEDING) AS gmin
        FROM walk),
    mom AS (
        SELECT event_type, CAST(ANY_VALUE(n) AS BIGINT) AS n,
               SUM(CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0)))
                   AS d2
        FROM dev GROUP BY 1),
    ph AS (
        SELECT cum.event_type, mom.n,
               CAST(MAX(cum.g - cum.gmin) AS BIGINT) AS ph_raw,
               sqrt(CAST(mom.d2 AS DOUBLE) / mom.n)
                   * sqrt(mom.n * 1.0e0) AS scale,
               CAST(MIN(CASE WHEN (cum.g - cum.gmin)
                        > {_PH_LAMBDA}e0
                          * sqrt(CAST(mom.d2 AS DOUBLE) / mom.n)
                          * sqrt(mom.n * 1.0e0)
                        THEN cum.rn END) AS BIGINT) AS alarm_hour
        FROM cum JOIN mom USING (event_type)
        GROUP BY cum.event_type, mom.n, scale)
    SELECT event_type, n AS n_hours,
           {sql_roundn("ph_raw / scale / 1.0e0", 6)} AS ph_norm,
           alarm_hour,
           alarm_hour IS NOT NULL AS alarmed
    FROM ph
    ORDER BY event_type
    """


@query("ts_page_hinkley", oracle=_ph_oracle())
def ts_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — PAGE–HINKLEY mean-shift detection per event type
    (the sequential sibling of ts_cusum, in its two-pass batch form):
    over hourly volume deviations d_t from the series mean, the PH
    statistic max_t(G_t − min_{{s≤t}} G_s) of the deviation random walk
    spikes when the mean SHIFTS (the walk stops mean-reverting);
    normalized by the null scale σ√n, with the fixed λ = {lam} alarm
    and the FIRST crossing hour — the drift detector a feed monitor
    runs beside the distribution-drift checks (qc_psi watches shape;
    PH watches level, cumulatively).

    Exactness: hourly totals snap to integer micro-units per row;
    deviations n·x−S and their running sums/minima are exact int64
    (Σd = 0 by construction, so G is a genuine zero-drift walk); Σd²
    accumulates in DECIMAL(19,0)² (exact any order); only the final
    normalization is float, identical trees.

    100 TB: one keyed hourly rollup, one window shuffle per series for
    the cumulative walk — hours-per-series state."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.sum(
            F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("t_int")
    )
    wp = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("hour")
    dev = hourly.select(
        "event_type",
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wp).alias("n"),
        (
            F.count("*").over(wp) * F.col("t_int")
            - F.sum("t_int").over(wp)
        ).alias("d"),
    )
    dev = dev.localCheckpoint(eager=False)  # walk + moments
    wc = Window.partitionBy("event_type").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    walk = dev.select(
        "event_type", "rn", F.sum("d").over(wc).alias("g")
    )
    cum = walk.select(
        "event_type", "rn", "g", F.min("g").over(wc).alias("gmin")
    )
    dec = F.col("d").cast("decimal(19,0)")
    mom = dev.groupBy("event_type").agg(
        F.any_value("n").cast("long").alias("n"),
        F.sum(dec * dec).alias("d2"),
    )
    scale = F.sqrt(F.col("d2").cast("double") / F.col("n")) * F.sqrt(
        F.col("n") * F.lit(1.0)
    )
    ph = (
        cum.join(F.broadcast(mom), "event_type")
        .groupBy("event_type", "n", scale.alias("scale"))
        .agg(
            F.max(F.col("g") - F.col("gmin")).cast("long").alias("ph_raw"),
            F.min(
                F.when(
                    (F.col("g") - F.col("gmin"))
                    > F.lit(_PH_LAMBDA) * scale,
                    F.col("rn"),
                )
            )
            .cast("long")
            .alias("alarm_hour"),
        )
    )
    return ph.select(
        "event_type",
        F.col("n").alias("n_hours"),
        roundn(F.col("ph_raw") / F.col("scale") / F.lit(1.0), 6).alias(
            "ph_norm"
        ),
        "alarm_hour",
        F.col("alarm_hour").isNotNull().alias("alarmed"),
    ).orderBy("event_type")


ts_page_hinkley.__doc__ = ts_page_hinkley.__doc__.format(lam=_PH_LAMBDA)
