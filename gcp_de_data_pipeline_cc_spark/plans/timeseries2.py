"""Time-series analytics wave 2: exponential smoothing and robust
(median/MAD-based) statistics.

Extends plans/timeseries.py (gapfill / OHLC / WMA / interpolation /
seasonal baseline) with the two remaining families a monitoring or
feature pipeline needs:

- **EWMA** — the exponential smoother (recent points decay geometrically)
  in its truncated-window form, so the expression is a bounded frame
  aggregate rather than an unbounded recursion;
- **robust anomaly/scaling stats** — median + MAD replace mean + stddev
  (anomaly_zscore) so heavy-tailed series don't let outliers mask
  themselves, and winsorized means quantify tail influence.

Exact-percentile discipline: Spark ``percentile()`` and DuckDB
``quantile_cont()`` implement the same (n-1)·q linear interpolation over
sorted doubles, established cross-engine by win_median_smooth — every
percentile here reuses that mapping and rounds at final projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: EWMA trailing-frame length and decay (1-alpha)
_EWMA_K = 8
_EWMA_DECAY = 0.7


@query(
    "ts_ewma",
    oracle=f"""
    WITH framed AS (
        SELECT event_id, event_type, ts, value,
               list(value) OVER (
                   PARTITION BY event_type ORDER BY ts
                   ROWS BETWEEN {_EWMA_K - 1} PRECEDING AND CURRENT ROW
               ) AS vals
        FROM events)
    SELECT event_id, event_type, ts,
           {sql_roundn(
               "list_sum(list_transform(generate_series(1, len(vals)),"
               f" i -> vals[i] * POW({_EWMA_DECAY}e0, len(vals) - i)))"
               " / list_sum(list_transform(generate_series(1, len(vals)),"
               f" i -> POW({_EWMA_DECAY}e0, len(vals) - i)))", 4)} AS ewma
    FROM framed
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — exponentially-weighted moving average over the
    trailing ``_EWMA_K`` rows per series: weight (1-α)^age, normalized
    over the present taps. The truncated form keeps EWMA a *bounded
    frame aggregate* — the textbook recursive definition needs either an
    unbounded running product (overflow-prone: decay^-n grows without
    bound) or sequential state; truncation at 8 taps retains >94% of the
    weight mass at decay 0.7 and keeps the plan a single window shuffle.

    Both engines build the frame list in ts order (feed has no ties) and
    fold the same expression tree, so the result is bit-stable before
    the shared rounding. Scale: identical profile to ts_wma — one
    shuffle on the series key, K doubles of state per row."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts")
        .rowsBetween(-(_EWMA_K - 1), Window.currentRow)
    )
    framed = ev.select(
        "event_id", "event_type", "ts",
        F.collect_list("value").over(w).alias("vals"),
    )
    n = F.size("vals")
    decay_at = lambda i: F.pow(  # noqa: E731
        F.lit(_EWMA_DECAY), (n - i).cast("double")
    )
    num = F.aggregate(
        F.zip_with(F.col("vals"), F.sequence(F.lit(1), n),
                   lambda x, i: x * decay_at(i)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(F.sequence(F.lit(1), n), decay_at),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return framed.select(
        "event_id", "event_type", "ts", roundn(num / den, 4).alias("ewma")
    )


@query(
    "anomaly_mad",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5e0) AS med,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type),
    dev AS (
        SELECT e.event_type, med.med, med.n,
               ABS(e.value - med.med) AS adev
        FROM events e JOIN med USING (event_type)),
    mad AS (
        SELECT event_type, ANY_VALUE(med) AS med, ANY_VALUE(n) AS n,
               quantile_cont(adev, 0.5e0) AS mad
        FROM dev GROUP BY event_type)
    SELECT e.event_type, mad.n,
           {sql_roundn("ANY_VALUE(mad.med)", 4)} AS med,
           {sql_roundn("ANY_VALUE(mad.mad)", 4)} AS mad,
           CAST(SUM(CASE WHEN ABS(0.6745e0 * (e.value - mad.med) / mad.mad)
                              > 3.5e0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM events e JOIN mad USING (event_type)
    GROUP BY e.event_type, mad.n
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate per series: median + MAD (median absolute
    deviation) replace the mean + stddev of anomaly_zscore, and the
    modified z-score 0.6745·(x-med)/MAD > 3.5 flags outliers. The robust
    pair matters on heavy-tailed feeds: a burst of extreme values
    inflates the stddev enough to mask itself from a plain z-gate, while
    the median/MAD gate is immune to ~50% contamination.

    Exact two-pass formulation: median per group, rejoin for absolute
    deviations, median of those, rejoin for the count — three
    aggregations keyed on the series key, each with bounded per-group
    sort state (Spark's exact percentile). At 100 TB swap the exact
    percentiles for approx_percentile under a documented error budget;
    the gate logic is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5d)").alias("med"),
        F.count("*").alias("n"),
    )
    dev = ev.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.any_value("med").alias("med"),
        F.any_value("n").alias("n"),
        F.expr("percentile(adev, 0.5d)").alias("mad"),
    )
    z = F.abs(0.6745 * (F.col("value") - F.col("med")) / F.col("mad"))
    flag = F.when(z > 3.5, 1).otherwise(0)
    return (
        ev.join(mad, "event_type")
        .groupBy("event_type", "n")
        .agg(
            roundn(F.any_value("med"), 4).alias("med"),
            roundn(F.any_value("mad"), 4).alias("mad"),
            F.sum(flag).alias("n_outliers"),
        )
        .select("event_type", "n", "med", "mad", "n_outliers")
    )


@query(
    "feature_winsorize",
    oracle=f"""
    WITH pct AS (
        SELECT event_type,
               quantile_cont(value, 0.05e0) AS p05,
               quantile_cont(value, 0.95e0) AS p95,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type)
    SELECT e.event_type, pct.n,
           {sql_roundn("ANY_VALUE(pct.p05)", 4)} AS p05,
           {sql_roundn("ANY_VALUE(pct.p95)", 4)} AS p95,
           CAST(SUM(CASE WHEN e.value < pct.p05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN e.value > pct.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high,
           {sql_roundn("AVG(e.value)", 4)} AS raw_mean,
           {sql_roundn(
               "AVG(LEAST(GREATEST(e.value, pct.p05), pct.p95))", 4)}
               AS winsor_mean
    FROM events e JOIN pct USING (event_type)
    GROUP BY e.event_type, pct.n
    """,
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized feature statistics per series: clip values into the
    exact [P05, P95] band and compare the clipped mean against the raw
    mean — the standard tail-robust normalization a feature pipeline
    applies before scaling (feature_scale), plus the clip counts a drift
    monitor watches. clip = LEAST(GREATEST(x, p05), p95) — identical
    fenceposts on both engines, values exactly at the fence unclipped.

    Scale: one exact-percentile aggregation keyed on the series key, one
    broadcastable rejoin (|event_type| rows), one final aggregation —
    two shuffles total; the percentile swap to approx_percentile is the
    same documented trade as anomaly_mad."""
    ev = load_table(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05d)").alias("p05"),
        F.expr("percentile(value, 0.95d)").alias("p95"),
        F.count("*").alias("n"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(F.broadcast(pct), "event_type")
        .groupBy("event_type", "n")
        .agg(
            roundn(F.any_value("p05"), 4).alias("p05"),
            roundn(F.any_value("p95"), 4).alias("p95"),
            F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0)).alias(
                "n_clipped_low"
            ),
            F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0)).alias(
                "n_clipped_high"
            ),
            roundn(F.avg("value"), 4).alias("raw_mean"),
            roundn(F.avg(clipped), 4).alias("winsor_mean"),
        )
        .select(
            "event_type", "n", "p05", "p95",
            "n_clipped_low", "n_clipped_high", "raw_mean", "winsor_mean",
        )
    )


@query(
    "ts_autocorr",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               {sql_roundn("SUM(value)", 6)} AS total
        FROM events GROUP BY 1, 2),
    lagged AS (
        SELECT event_type, total,
               LAG(total, 1) OVER w AS lag1,
               LAG(total, 24) OVER w AS lag24
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           {sql_roundn("corr(total, lag1)", 4)} AS acf1,
           {sql_roundn("corr(total, lag24)", 4)} AS acf24
    FROM lagged
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — lag-1 and lag-24 autocorrelation of hourly volume
    per event type: the standard seasonality/persistence diagnostic
    (acf1 ≈ momentum, acf24 ≈ daily cycle at hourly grain) a monitoring
    pipeline computes before choosing a forecasting baseline
    (ts_seasonal_baseline assumes exactly the periodicity acf24
    measures). corr(x, lag(x)) skips the NULL warm-up rows by SQL
    aggregate semantics — identically on both engines.

    Float discipline: the hourly totals are rounded at 6 decimals
    BEFORE the correlation on both sides, so the co-moment inputs are
    bit-identical doubles and only the final corr rounds (at 4).

    100 TB: one keyed aggregation to hourly grain (map-side combined),
    then one window shuffle per event_type carrying (hour, total) —
    hours-per-series state, never raw events; corr is a single-pass
    co-moment aggregate."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(roundn(F.sum("value"), 6).alias("total"))
    w = Window.partitionBy("event_type").orderBy("hour")
    lagged = hourly.select(
        "event_type",
        "total",
        F.lag("total", 1).over(w).alias("lag1"),
        F.lag("total", 24).over(w).alias("lag24"),
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            roundn(F.corr("total", "lag1"), 4).alias("acf1"),
            roundn(F.corr("total", "lag24"), 4).alias("acf24"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_twap",
    oracle=f"""
    WITH seg AS (
        SELECT event_type,
               CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT) AS cents,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id)
                   - epoch_us(ts) AS w_us
        FROM events),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               SUM(CAST(cents AS DECIMAL(38,0)) * CAST(w_us AS DECIMAL(38,0)))
                   AS pw,
               SUM(CAST(w_us AS DECIMAL(38,0))) AS w
        FROM seg WHERE w_us IS NOT NULL
        GROUP BY 1)
    SELECT event_type, n_segments,
           {sql_roundn("CAST(pw AS DOUBLE) / CAST(w AS DOUBLE) / 100.0e0", 4)}
               AS twap
    FROM s ORDER BY event_type
    """,
)
def ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — time-weighted average price/value per event type:
    each observation is held until the next one (step interpolation),
    so its weight is the microseconds until the successor; the last
    observation of a series has no holding interval and drops out. THE
    aggregation for irregularly-sampled series — a plain AVG
    over-weights bursts, which is exactly when values are least
    representative.

    Exactness: value snaps to integer cents, holding times are exact
    integer microseconds (unix_micros / epoch_us), and the weighted sum
    accumulates cents×µs products in DECIMAL(38,0) — cent-scale values
    over month-scale spans overflow int64 in the SUM, and double
    accumulation is order-dependent; 38-digit decimal is exact in any
    order on both engines. One division at the end, then the shared
    rounding.

    100 TB: one window shuffle per series for the LEAD (carrying
    (ts, cents) only), then a map-side-combinable decimal aggregate —
    the same cost profile as win_lag_lead plus a groupBy."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seg = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        (
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("w_us"),
    ).filter(F.col("w_us").isNotNull())
    s = seg.groupBy("event_type").agg(
        F.count("*").alias("n_segments"),
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * F.col("w_us").cast("decimal(38,0)")
        ).alias("pw"),
        F.sum(F.col("w_us").cast("decimal(38,0)")).alias("w"),
    )
    return s.select(
        "event_type",
        "n_segments",
        roundn(
            F.col("pw").cast("double") / F.col("w").cast("double") / F.lit(100.0),
            4,
        ).alias("twap"),
    ).orderBy("event_type")


@query(
    "ts_theilsen",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2),
    slopes AS (
        SELECT a.event_type,
               (b.cents - a.cents) * 1.0e0 / (b.day - a.day) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {sql_roundn("quantile_cont(slope, 0.5) / 100.0e0", 4)}
               AS theilsen_slope
    FROM slopes
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ts_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — Theil–Sen robust trend: the median of all pairwise
    slopes of the daily-volume series per event type, in value-units
    per day. The robust complement to agg_regression's least squares —
    up to ~29% of the days can be corrupted (outages, backfills,
    spikes) before the estimate moves, where OLS bends for a single
    wild day.

    Exactness: day indices and daily cents are exact integers, each
    pairwise slope is one identical double division, and the median
    uses the established (n−1)·q percentile mapping
    (win_median_smooth); one rounding at the end.

    100 TB: the O(d²) pair build is per-series and bounded by the
    window length (30 days → 435 pairs), never by event volume — the
    heavy reduction is the daily rollup, a map-side-combinable
    aggregate. For year-scale windows the documented swap is the
    repeated-median or sampled-pairs variant, same output contract."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias("day"),
    ).agg(
        F.sum(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
        ).alias("cents")
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.cents") - F.col("a.cents"))
            * F.lit(1.0)
            / (F.col("b.day") - F.col("a.day"))
        ).alias("slope"),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count("*").alias("n_pairs"),
            roundn(
                F.expr("percentile(slope, 0.5d)") / F.lit(100.0), 4
            ).alias("theilsen_slope"),
        )
        .orderBy("event_type")
    )


@query(
    "win_pct_change",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2),
    lagged AS (
        SELECT event_type, day, cents,
               LAG(cents) OVER (
                   PARTITION BY event_type ORDER BY day) AS prev
        FROM daily)
    SELECT event_type, day,
           {sql_roundn("cents / 100.0e0", 2)} AS revenue,
           {sql_roundn("(cents - prev) * 100.0e0 / prev", 2)} AS pct_change
    FROM lagged
    ORDER BY event_type, day
    """,
)
def win_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W/T-extension — period-over-period growth: day-over-day percent
    change of daily volume per event type, NULL on each series' first
    day (no prior period — not 0, which would claim flatness). The
    ubiquitous dashboard/reporting primitive, composed here the
    scale-correct way: aggregate FIRST (calendar-grain rollup), window
    SECOND — lag over the ~30-row-per-series daily table, never over
    raw events.

    Exactness: daily sums in integer cents; the growth ratio is one
    identical double expression ((cents−prev)·100/prev) rounded at 2 on
    both sides.

    100 TB: the rollup is map-side combinable; the window shuffle
    carries days-per-series rows. Same profile as ts_autocorr's hourly
    pass."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
        ).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        daily.select(
            "event_type",
            "day",
            roundn(F.col("cents") / F.lit(100.0), 2).alias("revenue"),
            roundn(
                (F.col("cents") - F.lag("cents").over(w))
                * F.lit(100.0)
                / F.lag("cents").over(w),
                2,
            ).alias("pct_change"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# anomaly ensemble vote (r4c wave)
# ---------------------------------------------------------------------------

def _ens_oracle() -> str:
    return f"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1),
    st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS BIGINT) AS s2
        FROM d),
    r AS (
        SELECT day, cents,
               ROW_NUMBER() OVER (ORDER BY cents, day) AS rn
        FROM d),
    med AS (
        SELECT cents AS med FROM r, st WHERE rn = (st.n + 1) // 2),
    q AS (
        SELECT (SELECT cents FROM r, st WHERE rn = (1 * st.n + 3) // 4)
                   AS q1,
               (SELECT cents FROM r, st WHERE rn = (3 * st.n + 3) // 4)
                   AS q3),
    ad AS (
        SELECT d.day, ABS(d.cents - med.med) AS adev FROM d, med),
    adr AS (
        SELECT adev, ROW_NUMBER() OVER (ORDER BY adev, day) AS rn
        FROM ad),
    mad AS (
        SELECT adev AS mad FROM adr, st WHERE rn = (st.n + 1) // 2),
    flags AS (
        SELECT d.day, d.cents,
               (st.n * d.cents - st.s) * 1.0e0 * (st.n * d.cents - st.s)
                   > 9.0e0 * (st.n * 1.0e0 * st.s2 - st.s * 1.0e0 * st.s)
                   AS z_flag,
               ABS(d.cents - med.med) > 3 * mad.mad AS mad_flag,
               (2 * d.cents < 2 * q.q1 - 3 * (q.q3 - q.q1)
                OR 2 * d.cents > 2 * q.q3 + 3 * (q.q3 - q.q1)) AS iqr_flag
        FROM d, st, med, mad, q)
    SELECT day, cents, z_flag, mad_flag, iqr_flag,
           CAST((CASE WHEN z_flag THEN 1 ELSE 0 END)
                + (CASE WHEN mad_flag THEN 1 ELSE 0 END)
                + (CASE WHEN iqr_flag THEN 1 ELSE 0 END) AS BIGINT)
               AS votes,
           (CASE WHEN z_flag THEN 1 ELSE 0 END)
               + (CASE WHEN mad_flag THEN 1 ELSE 0 END)
               + (CASE WHEN iqr_flag THEN 1 ELSE 0 END) >= 2 AS is_anomaly
    FROM flags ORDER BY day
    """


@query("anomaly_ensemble", oracle=_ens_oracle())
def anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANOMALY ENSEMBLE — majority vote of three detectors with
    disjoint failure modes over daily revenue: z-score (|x−μ| > 3σ —
    efficient but its own μ/σ are corrupted by the outliers it hunts),
    MAD (|x−med| > 3·MAD — 50% breakdown point), and Tukey IQR fences
    (x outside [q1−1.5·IQR, q3+1.5·IQR]). Flagged = ≥2 of 3 agree; the
    per-detector flags stay in the output so disagreements (the
    interesting rows) are visible, not averaged away. The ensemble
    rung over anomaly_zscore / anomaly_mad, the way verify panels
    compose finders.

    Exactness: MAD and IQR verdicts are PURE INTEGER comparisons
    (medians/quartiles are type-1 order statistics of integer cents;
    fences cross-multiplied by 2 so the 1.5 factor never floats); the
    z-score verdict squares in doubles as one identical tree
    ((n·x−S)² vs 9·(n·S₂−S²) — cross-multiplied so μ and σ themselves
    are never materialized).

    100 TB: one day-grain aggregate; every statistic is computed on
    the domain-bounded day table; global stats ride one-row
    broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("v"),
        )
        .groupBy("day")
        .agg(F.sum("v").alias("cents"))
    )
    d = d.localCheckpoint(eager=False)  # stats + ranks + flags consumers
    st = d.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    r = d.select(
        "day",
        "cents",
        F.row_number().over(Window.orderBy("cents", "day")).alias("rn"),
    )
    med = (
        r.crossJoin(F.broadcast(st))
        .filter(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
        .select(F.col("cents").alias("med"))
    )
    q1 = (
        r.crossJoin(F.broadcast(st))
        .filter(F.col("rn") == ((F.col("n") + 3) / 4).cast("long"))
        .select(F.col("cents").alias("q1"))
    )
    q3 = (
        r.crossJoin(F.broadcast(st))
        .filter(F.col("rn") == ((3 * F.col("n") + 3) / 4).cast("long"))
        .select(F.col("cents").alias("q3"))
    )
    ad = d.crossJoin(F.broadcast(med)).select(
        "day", F.abs(F.col("cents") - F.col("med")).alias("adev")
    )
    adr = ad.select(
        "adev",
        F.row_number().over(Window.orderBy("adev", "day")).alias("rn"),
    )
    mad = (
        adr.crossJoin(F.broadcast(st))
        .filter(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
        .select(F.col("adev").alias("mad"))
    )
    one = F.lit(1.0)
    zq = F.col("n") * F.col("cents") - F.col("s")
    z_flag = (zq * one * zq) > (
        F.lit(9.0)
        * (F.col("n") * one * F.col("s2") - F.col("s") * one * F.col("s"))
    )
    mad_flag = F.abs(F.col("cents") - F.col("med")) > 3 * F.col("mad")
    iqr = F.col("q3") - F.col("q1")
    iqr_flag = (2 * F.col("cents") < 2 * F.col("q1") - 3 * iqr) | (
        2 * F.col("cents") > 2 * F.col("q3") + 3 * iqr
    )
    flags = (
        d.crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(q3))
        .select(
            "day",
            "cents",
            z_flag.alias("z_flag"),
            mad_flag.alias("mad_flag"),
            iqr_flag.alias("iqr_flag"),
        )
    )
    votes = (
        F.when(F.col("z_flag"), 1).otherwise(0)
        + F.when(F.col("mad_flag"), 1).otherwise(0)
        + F.when(F.col("iqr_flag"), 1).otherwise(0)
    )
    return flags.select(
        "day",
        "cents",
        "z_flag",
        "mad_flag",
        "iqr_flag",
        votes.cast("long").alias("votes"),
        (votes >= 2).alias("is_anomaly"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# prominence-gated peak detection (r4o wave)
# ---------------------------------------------------------------------------

#: neighbor half-window (days on each side) a peak must dominate
_PEAK_W = 3


@query(
    "ts_peak_detect",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    w AS (
        SELECT day, cents,
               MAX(cents) OVER (ORDER BY day
                   ROWS BETWEEN {_PEAK_W} PRECEDING AND 1 PRECEDING)
                   AS lmax,
               MAX(cents) OVER (ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND {_PEAK_W} FOLLOWING)
                   AS rmax,
               COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN {_PEAK_W} PRECEDING AND 1 PRECEDING)
                   AS nl,
               COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND {_PEAK_W} FOLLOWING)
                   AS nr
        FROM daily)
    SELECT day, cents,
           CAST(GREATEST(lmax, rmax) AS BIGINT) AS neighbor_max,
           CAST(cents - GREATEST(lmax, rmax) AS BIGINT) AS strength_cents
    FROM w
    WHERE nl = {_PEAK_W} AND nr = {_PEAK_W}
      AND cents > lmax AND cents > rmax
    ORDER BY day
    """,
)
def ts_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series tier — PEAK detection on the daily revenue series:
    a day is a peak when it strictly dominates every day within
    {w} positions on BOTH sides (interior days only — edge days with a
    truncated neighborhood can't certify a peak and are excluded), and
    each peak reports its STRENGTH (height above the tallest
    neighbor — the simplified prominence a capacity/campaign review
    ranks spikes by).  The complement of the trough-hunting the
    anomaly keys do: anomaly_zscore/MAD flag outliers against a
    rolling distribution; this certifies LOCAL MAXIMA against an
    exact neighborhood.

    Exactness: the series is exact integer cents; domination and
    strength are pure integer comparisons/differences — no float
    anywhere.

    100 TB: the series is DAY-grain (calendar-bounded, thousands of
    rows regardless of fact size) after one map-side-combined
    aggregate; the neighborhood windows share one bounded sort."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    wl = Window.orderBy("day").rowsBetween(-_PEAK_W, -1)
    wr = Window.orderBy("day").rowsBetween(1, _PEAK_W)
    w = daily.select(
        "day",
        "cents",
        F.max("cents").over(wl).alias("lmax"),
        F.max("cents").over(wr).alias("rmax"),
        F.count("*").over(wl).alias("nl"),
        F.count("*").over(wr).alias("nr"),
    )
    return (
        w.where(
            (F.col("nl") == _PEAK_W)
            & (F.col("nr") == _PEAK_W)
            & (F.col("cents") > F.col("lmax"))
            & (F.col("cents") > F.col("rmax"))
        )
        .select(
            "day",
            "cents",
            F.greatest("lmax", "rmax").cast("long").alias("neighbor_max"),
            (F.col("cents") - F.greatest("lmax", "rmax"))
            .cast("long")
            .alias("strength_cents"),
        )
        .orderBy("day")
    )


ts_peak_detect.__doc__ = ts_peak_detect.__doc__.format(w=_PEAK_W)


# ---------------------------------------------------------------------------
# clamped running balance (r5g wave)
# ---------------------------------------------------------------------------

#: sampled account set: every _BAL_SAMPLEth user keeps the output bounded
_BAL_SAMPLE = 100


@query(
    "inventory_running_balance",
    oracle=f"""
    WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(SUM(CASE WHEN event_type IN ('click', 'view')
                             THEN CAST(FLOOR(value * 100.0e0 + 0.5e0)
                                       AS BIGINT)
                             ELSE -CAST(FLOOR(value * 100.0e0 + 0.5e0)
                                        AS BIGINT) END) AS BIGINT)
                   AS delta_cents
        FROM events WHERE user_id % {_BAL_SAMPLE} = 0
        GROUP BY 1, 2),
    st AS (
        SELECT user_id, day, delta_cents,
            list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                    (SELECT list(d2.delta_cents ORDER BY d2.day)
                     FROM d d2
                     WHERE d2.user_id = d.user_id AND d2.day <= d.day)),
                (acc, e) -> GREATEST(CAST(0 AS BIGINT), acc + e))
                AS balance_cents
        FROM d)
    SELECT user_id, day, delta_cents, balance_cents,
           CAST(COALESCE(LAG(balance_cents) OVER (
                    PARTITION BY user_id ORDER BY day), 0)
                + delta_cents < 0 AS INT) AS clamped
    FROM st
    ORDER BY user_id, day
    """,
)
def inventory_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-extension — CLAMPED running balance (prepaid-meter /
    inventory-floor semantics): per account, the daily balance is
    balance' = max(0, balance + delta) — the floor BREAKS prefix-sum
    decomposability (a plain cumulative SUM window cannot express it:
    once clamped, history before the clamp must be forgotten), so the
    recursion runs as a LEFT FOLD over each account's ascending day
    deltas (the ts_holt discipline), with a ``clamped`` flag marking
    days the floor absorbed a deficit.

    Exactness: deltas are exact integer cents (credits: click/view;
    debits: the rest); the fold is pure int64 max/add — bit-identical
    on both engines.

    100 TB: the feed collapses to (account, day) grain map-side; folds
    are per-account over day-domain-bounded arrays, partitioned by
    account — embarrassingly parallel; the sample predicate bounds the
    registered output, production runs unsampled with the same plan."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    delta = F.sum(
        F.when(F.col("event_type").isin("click", "view"), cents).otherwise(
            -cents
        )
    ).cast("long")
    d = (
        ev.filter(F.col("user_id") % _BAL_SAMPLE == 0)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(delta.alias("delta_cents"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    arr = F.collect_list("delta_cents").over(w)
    bal = F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, e: F.greatest(F.lit(0).cast("long"), acc + e),
    )
    st = d.select("user_id", "day", "delta_cents", bal.alias("balance_cents"))
    lag_bal = F.lag("balance_cents").over(
        Window.partitionBy("user_id").orderBy("day")
    )
    return st.select(
        "user_id",
        "day",
        "delta_cents",
        "balance_cents",
        (F.coalesce(lag_bal, F.lit(0)) + F.col("delta_cents") < 0)
        .cast("int")
        .alias("clamped"),
    ).orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# dominant-period detection (r5k wave)
# ---------------------------------------------------------------------------

#: candidate periods scanned (days)
_PD_MIN, _PD_MAX = 2, 14

#: integer down-scaling of daily cents so squared sums stay in int64
#: (cents ~1e9 at sf0.1 -> kilocents ~1e6; v² ~1e12 × 3650 days OK;
#: at 100× data raise the divisor — the documented knob)
_PD_DIV = 1000


@query(
    "ts_period_detect",
    oracle=f"""
    WITH d AS (
        SELECT date_diff('day', DATE '1990-01-01', CAST(ts AS DATE))
                   AS dnum,
               CAST(SUM(CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT))
                    // {_PD_DIV} AS BIGINT) AS v
        FROM events GROUP BY 1),
    grid AS (SELECT UNNEST(range({_PD_MIN}, {_PD_MAX} + 1)) AS k),
    pairs AS (
        SELECT g.k, a.v AS x, b.v AS y
        FROM d a CROSS JOIN grid g
        JOIN d b ON b.dnum = a.dnum - g.k),
    mom AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY k),
    acf AS (
        SELECT CAST(k AS INT) AS lag_days, m,
               FLOOR(CAST(m * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                            * CAST(m * syy - sy * sy AS DOUBLE))
                     * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS acf
        FROM mom),
    best AS (
        SELECT lag_days AS det FROM acf
        ORDER BY acf DESC, lag_days LIMIT 1)
    SELECT a.lag_days, a.m AS n_pairs, a.acf,
           CAST(a.lag_days = b.det AS INT) AS is_dominant,
           CAST(b.det AS INT) AS detected_period
    FROM acf a CROSS JOIN best b
    ORDER BY a.lag_days
    """,
)
def ts_period_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-extension — DOMINANT-PERIOD detection: the lagged Pearson
    autocorrelation of the daily revenue series scanned over candidate
    periods {lo}..{hi} days, argmax = the detected seasonality — the
    diagnostic that DECIDES the season length ts_holt_winters /
    ts_seasonal_baseline assume (they hardcode 7; this measures it).

    Exactness: daily cents are integer-downscaled (DIV {dv}) so every
    co-moment sum (m·Σxy − Σx·Σy form) is EXACT int64 — unlike a
    corr() aggregate, summation order cannot move the argmax; the one
    float step (divide by the sqrt of the exact variance product) is a
    fixed scalar tree per lag, quantized at 1e-6 BEFORE the argmax
    with a lag tie-break.

    100 TB: the feed collapses to day grain map-side; the lag pairing
    is |days|×{nl} rows via the dnum equi-join; moments are map-side
    combined to {nl} rows."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1990-01-01").cast("date")).alias(
            "dnum"
        )
    ).agg(
        F.expr(
            f"CAST(SUM(CAST(FLOOR(value * 100.0D + 0.5D) AS LONG))"
            f" DIV {_PD_DIV} AS LONG)"
        ).alias("v")
    )
    d = d.localCheckpoint(eager=False)  # both pairing sides
    grid = spark.range(_PD_MIN, _PD_MAX + 1).select(
        F.col("id").alias("k")
    )
    pairs = (
        d.alias("a")
        .crossJoin(F.broadcast(grid))
        .join(
            d.alias("b"),
            F.col("b.dnum") == F.col("a.dnum") - F.col("k"),
        )
        .select("k", F.col("a.v").alias("x"), F.col("b.v").alias("y"))
    )
    mom = pairs.groupBy("k").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    acf = mom.select(
        F.col("k").cast("int").alias("lag_days"),
        F.col("m"),
        roundn(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            6,
        ).alias("acf"),
    )
    acf = acf.localCheckpoint(eager=False)  # argmax + rows consumers
    best = acf.orderBy(F.desc("acf"), "lag_days").limit(1).select(
        F.col("lag_days").alias("det")
    )
    return (
        acf.crossJoin(F.broadcast(best))
        .select(
            "lag_days",
            F.col("m").alias("n_pairs"),
            "acf",
            (F.col("lag_days") == F.col("det")).cast("int").alias(
                "is_dominant"
            ),
            F.col("det").cast("int").alias("detected_period"),
        )
        .orderBy("lag_days")
    )


ts_period_detect.__doc__ = ts_period_detect.__doc__.format(
    lo=_PD_MIN, hi=_PD_MAX, dv=_PD_DIV, nl=_PD_MAX - _PD_MIN + 1
)


# ---------------------------------------------------------------------------
# ts_matrix_profile — all-pairs subsequence nearest neighbors (r6h wave)
# ---------------------------------------------------------------------------

#: subsequence window length (days) and the trivial-match exclusion zone
_MP_M = 7


def _matrix_profile_oracle() -> str:
    leads = ",\n               ".join(
        f"LEAD(cnt, {k}) OVER w AS d{k}" for k in range(1, _MP_M)
    )
    dd = " + ".join(
        f"(a.d{k} - b.d{k}) * (a.d{k} - b.d{k})" for k in range(_MP_M)
    )
    return f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
    idx AS (
        SELECT event_type, cnt,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS i
        FROM daily),
    win AS (
        SELECT event_type, i, cnt AS d0,
               {leads}
        FROM idx
        WINDOW w AS (PARTITION BY event_type ORDER BY i)),
    com AS (SELECT * FROM win WHERE d{_MP_M - 1} IS NOT NULL),
    pairs AS (
        SELECT a.event_type, a.i AS i, b.i AS j,
               CAST({dd} AS BIGINT) AS dd
        FROM com a JOIN com b
          ON b.event_type = a.event_type
         AND ABS(a.i - b.i) >= {_MP_M}),
    mp AS (
        SELECT event_type, i, j, dd,
               ROW_NUMBER() OVER (PARTITION BY event_type, i
                                  ORDER BY dd, j) AS rn
        FROM pairs)
    SELECT event_type, CAST(i AS BIGINT) AS idx,
           CAST(j AS BIGINT) AS nn_idx, dd AS mp_dist
    FROM mp WHERE rn = 1
    ORDER BY event_type, idx
    """


@query("ts_matrix_profile", oracle=_matrix_profile_oracle())
def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — the MATRIX PROFILE (Yeh et al. 2016), the modern
    time-series primitive under motif discovery, discord (anomaly)
    hunting and segmentation: for every length-{m} subsequence of each
    type's daily-count series, the distance to its nearest
    NON-TRIVIAL neighbor (exclusion zone |i−j| ≥ {m} kills
    self-matches) and that neighbor's index.  Low mp_dist = a motif
    (the week repeats somewhere); the profile's maxima are discords —
    weeks unlike ANY other, the strongest anomaly definition there is
    (no model, no threshold).

    This is the EUCLIDEAN-MP variant on integer counts: every distance
    is an exact int64 sum of squared differences — no normalization
    floats anywhere, so the argmin is engine-exact with (dd, j)
    tie-breaks.  (The z-normalized variant divides each window by its
    σ first; on count series the unnormalized profile is the standard
    scale-aware choice.)

    100 TB: the day collapse is one map-side aggregate; windows come
    from {mm1} LEAD columns (one window shuffle per type); the
    all-pairs join is (days−{mm1})² PER TYPE — day-grain bounded
    (365² rows/type/year), never event-grain.  For long series the
    STOMP recurrence replaces the pair join (each diagonal reuses the
    previous dot product) — the documented swap."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    win = daily.select(
        "event_type",
        F.row_number().over(w).alias("i"),
        F.col("cnt").alias("d0"),
        *[
            F.lead("cnt", k).over(w).alias(f"d{k}")
            for k in range(1, _MP_M)
        ],
    ).filter(F.col(f"d{_MP_M - 1}").isNotNull())
    win = win.localCheckpoint(eager=False)  # both pair sides
    a, b = win.alias("a"), win.alias("b")
    dd = None
    for k in range(_MP_M):
        term = (F.col(f"a.d{k}") - F.col(f"b.d{k}")) * (
            F.col(f"a.d{k}") - F.col(f"b.d{k}")
        )
        dd = term if dd is None else dd + term
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.abs(F.col("a.i") - F.col("b.i")) >= _MP_M),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        dd.cast("long").alias("dd"),
    )
    wmp = Window.partitionBy("event_type", "i").orderBy(
        F.asc("dd"), F.asc("j")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(wmp))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("i").cast("long").alias("idx"),
            F.col("j").cast("long").alias("nn_idx"),
            F.col("dd").alias("mp_dist"),
        )
        .orderBy("event_type", "idx")
    )


ts_matrix_profile.__doc__ = ts_matrix_profile.__doc__.format(
    m=_MP_M, mm1=_MP_M - 1
)


@query("ts_matrix_profile_stomp", oracle=_matrix_profile_oracle())
def ts_matrix_profile_stomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — the STOMP form of `ts_matrix_profile`, its
    documented long-series swap DELIVERED (the banded-DTW /
    sampled-Brandes pattern): instead of re-summing m squared
    differences per pair, every distance decomposes as
    dd(i,j) = ssq(i) + ssq(j) − 2·QT(i,j), where the dot products
    QT along each DIAGONAL k = j−i are a WINDOWED SUM of single
    products cnt_t·cnt_{{t+k}} (the STOMP recurrence, expressed as a
    frame aggregate instead of a sequential scan) and ssq is one
    windowed sum of squares — O(1) amortized arithmetic per pair
    where the direct form pays O(m).  Output and oracle are
    IDENTICAL to ts_matrix_profile: the hash match plus the pinned
    frame-equality law cross-verify the recurrence against the
    direct computation.

    100 TB: same day-grain (i, k) grid as the direct form — the win
    is the m-fold arithmetic reduction per cell, exactly STOMP's
    contribution; diagonals shard naturally on (type, k)."""
    m = _MP_M
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    pos = daily.select(
        "event_type", F.row_number().over(w).alias("i"), "cnt"
    )
    pos = pos.localCheckpoint(eager=False)  # ssq + both product sides
    # complete-window sums of squares per start index
    wf = (
        Window.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(0, m - 1)
    )
    ssq = pos.select(
        "event_type",
        "i",
        F.sum(F.col("cnt") * F.col("cnt")).over(wf).alias("ssq"),
        F.count("*").over(wf).alias("nw"),
    ).filter(F.col("nw") == m).drop("nw")
    # one product per (diagonal k, position t): cnt_t * cnt_{t+k}
    a, b = pos.alias("a"), pos.alias("b")
    prod = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.i") > F.col("a.i")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.i") - F.col("a.i")).alias("k"),
        F.col("a.i").alias("t"),
        (F.col("a.cnt") * F.col("b.cnt")).alias("p"),
    )
    wd = (
        Window.partitionBy("event_type", "k")
        .orderBy("t")
        .rowsBetween(0, m - 1)
    )
    qt = prod.select(
        "event_type",
        "k",
        F.col("t").alias("i"),
        F.sum("p").over(wd).alias("qt"),
        F.count("*").over(wd).alias("nw"),
    ).filter((F.col("nw") == m) & (F.col("k") >= m))
    ssq_j = ssq.select(
        F.col("event_type").alias("et_j"),
        F.col("i").alias("j"),
        F.col("ssq").alias("ssq_j"),
    )
    up = (
        qt.join(ssq, ["event_type", "i"])
        .join(
            ssq_j,
            (F.col("et_j") == F.col("event_type"))
            & (F.col("j") == F.col("i") + F.col("k")),
        )
        .select(
            "event_type",
            "i",
            "j",
            (F.col("ssq") + F.col("ssq_j") - 2 * F.col("qt"))
            .cast("long")
            .alias("dd"),
        )
    )
    both = up.unionByName(
        up.select(
            "event_type",
            F.col("j").alias("i"),
            F.col("i").alias("j"),
            "dd",
        )
    )
    wmp = Window.partitionBy("event_type", "i").orderBy(
        F.asc("dd"), F.asc("j")
    )
    return (
        both.withColumn("rn", F.row_number().over(wmp))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("i").cast("long").alias("idx"),
            F.col("j").cast("long").alias("nn_idx"),
            F.col("dd").alias("mp_dist"),
        )
        .orderBy("event_type", "idx")
    )
