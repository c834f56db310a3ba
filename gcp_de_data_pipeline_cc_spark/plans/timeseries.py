"""Time-series coverage wave: dense-calendar gap-fill, funnel
conversion, and OHLC resampling over the event stream.

These are the batch twins of the streaming tier (plans/events.py) —
the shapes a hypertable/metrics consumer of the reference's event feed
(ref: dags/pipeline_orchestration_dag.py:212 staging tier) runs daily.
All are pure DataFrame compositions: the calendar spine is generated
with ``sequence()`` (codegen, no driver loop), forward-fill is
``last(ignorenulls)`` over an ordered window, and OHLC open/close are
argmin/argmax selections over the (tie-free) event timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query


@query(
    "ts_gapfill",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events),
    calendar AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM bounds),
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_raw,
               {sql_roundn("SUM(value)", 2)} AS value_sum_raw
        FROM events
        GROUP BY 1, 2),
    spine AS (
        SELECT t.event_type, c.hour
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN calendar c)
    SELECT s.event_type, s.hour,
           COALESCE(h.n_raw, 0) AS n_events,
           h.value_sum_raw AS value_sum,
           last_value(h.value_sum_raw IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_sum_ff
    FROM spine s
    LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hour = h.hour
    """,
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — dense-calendar gap fill: hourly per-type rollup
    left-joined onto a generated calendar spine, empty hours zero-filled
    for counts and forward-filled (last non-null) for the running value
    level. The spine is sequence() over the global [min,max] hour — a
    broadcast-scale frame (types × hours), never a per-row explosion of
    raw data. Forward fill is one window pass ordered by hour; at 100 TB
    partition the window by (type, coarse time range) so no single
    partition holds years of hours."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    calendar = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count("*").alias("n_raw"),
        roundn(F.sum("value")).alias("value_sum_raw"),
    )
    spine = ev.select("event_type").distinct().crossJoin(F.broadcast(calendar))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_raw", F.lit(0)).alias("n_events"),
            F.col("value_sum_raw").alias("value_sum"),
            F.last("value_sum_raw", ignorenulls=True).over(w).alias("value_sum_ff"),
        )
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND e.ts > v.t_view
          AND e.ts <= v.t_view + INTERVAL 2 HOUR
        GROUP BY 1),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > c.t_click
          AND e.ts <= c.t_click + INTERVAL 24 HOUR
        GROUP BY 1)
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
           (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_2h,
           (SELECT COUNT(*) FROM p) AS n_purchased_24h
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-event funnel: first view → first click within 2 h →
    first purchase within 24 h, counted per stage. Each stage is a
    groupBy over only the candidate users of the previous stage (the
    join prunes before aggregating), so stage cost shrinks down-funnel —
    the MATCH_RECOGNIZE shape expressed as cascaded min-aggregates.
    Timestamp ties are absent in the event feed (verified at all sfs),
    so strict > ordering is deterministic."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # Each stage feeds BOTH the next stage and its own count; checkpoint
    # the (tiny) per-stage survivor sets so assembling the four counts
    # doesn't re-run every upstream stage's scan+shuffle (without the
    # cuts the composed plan scans events 20×).
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint()
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 2 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint()
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_users = ev.select(F.count_distinct("user_id").alias("n_users"))
    return (
        n_users.crossJoin(F.broadcast(v.select(F.count("*").alias("n_viewed"))))
        .crossJoin(F.broadcast(c.select(F.count("*").alias("n_clicked_2h"))))
        .crossJoin(F.broadcast(p.select(F.count("*").alias("n_purchased_24h"))))
    )


@query(
    "ts_resample_ohlc",
    oracle=f"""
    SELECT event_type, date_trunc('hour', ts) AS hour,
           arg_min(value, ts) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ts) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           {sql_roundn("AVG(value)", 4)} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — OHLC bar resampling: open/close are argmin/argmax
    of value over the (unique) event timestamp within each hourly
    bucket; high/low/count/avg complete the bar. One hash aggregate,
    all selection aggregates mergeable map-side — the classic
    tick→bar downsample that turns 100 TB of raw ticks into a
    broadcastable bar table. Open/high/low/close are raw column reads
    (bit-exact); only the avg is rounded."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count("*").alias("n_ticks"),
        roundn(F.avg("value"), 4).alias("avg_value"),
    )


@query(
    "sessionize_path",
    oracle="""
    WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        FROM events),
    p AS (
        SELECT user_id, string_agg(event_type, '->' ORDER BY rn) AS path
        FROM r WHERE rn <= 3 GROUP BY user_id)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
)
def sessionize_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: each user's first three events (by the
    tie-free event timestamp) concatenated into a path string, ranked by
    how many users share it. The per-user top-3 uses a rank window that
    Spark executes with WindowGroupLimit pushdown — partial top-3 per
    map task before the shuffle — so the exchange carries ≤3 rows per
    user, not the full stream. Path assembly sorts the 3-element struct
    array per row (codegen), not with an ordered string_agg, which Spark
    lacks as a deterministic aggregate."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("ts"))
    first3 = ev.select("user_id", "event_type", rn.alias("rn")).filter(
        F.col("rn") <= 3
    )
    paths = first3.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            "->",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(20)
    )


#: trailing window width (rows) for the weighted moving average
WMA_K = 10


@query(
    "ts_wma",
    oracle=f"""
    WITH framed AS (
        SELECT event_id, event_type, ts, value,
               list(value) OVER (
                   PARTITION BY event_type ORDER BY ts
                   ROWS BETWEEN {WMA_K - 1} PRECEDING AND CURRENT ROW
               ) AS vals
        FROM events
    )
    SELECT event_id, event_type, ts,
           FLOOR(
               list_sum(list_transform(generate_series(1, len(vals)),
                                       i -> vals[i] * i))
               / (len(vals) * (len(vals) + 1) / 2.0)
               * 10000.0 + 0.5) / 10000.0 AS wma
    FROM framed
    """,
)
def ts_wma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — linearly-weighted moving average over the trailing
    ``WMA_K`` rows per series (recent rows weigh more; the lag-sensitive
    smoother dashboards use where plain rolling means respond too
    slowly). Expressed as collect_list over a row frame + a codegen
    ``aggregate(zip_with(...))`` weighted sum — no UDF, no self-join.
    Both engines build the frame list in ts order (ties absent from the
    feed), so the weighted sum is evaluated in identical order and is
    bit-stable before the shared rounding.

    Scale: one window shuffle on the series key; the frame holds K
    doubles per row regardless of corpus size. The all-window-functions
    alternative (K lag() columns) is the same shuffle with a wider
    projection — the list frame keeps the expression O(1) columns."""
    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts")
        .rowsBetween(-(WMA_K - 1), Window.currentRow)
    )
    vals = F.collect_list("value").over(w)
    framed = ev.select("event_id", "event_type", "ts", vals.alias("vals"))
    n = F.size("vals")
    weighted = F.aggregate(
        F.zip_with(
            F.col("vals"),
            F.sequence(F.lit(1), n),
            lambda x, i: x * i.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return framed.select(
        "event_id",
        "event_type",
        "ts",
        roundn(weighted / (n * (n + 1) / 2.0), 4).alias("wma"),
    )


@query(
    "win_median_smooth",
    oracle="""
    SELECT event_id, event_type, ts,
           FLOOR(quantile_cont(value, 0.5) OVER (
                     PARTITION BY event_type ORDER BY ts
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                 * 10000.0 + 0.5) / 10000.0 AS median5
    FROM events
    """,
)
def win_median_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — rolling median filter (trailing 5 rows per series):
    the outlier-robust smoother that a mean-based rolling window can't
    give you — one spike corrupts a mean for the whole window but moves
    a median by at most one rank. Spark evaluates exact `percentile` as
    a window aggregate over the row frame; both engines interpolate
    linearly (continuous quantile), so values agree bit-for-bit before
    shared rounding.

    Scale: same single window shuffle as ts_wma; per-row cost is
    O(frame) on the 5-row frame. For wide frames at 100 TB prefer
    approx_percentile partials or the WMA — exact medians don't
    decompose."""
    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        roundn(F.percentile("value", F.lit(0.5)).over(w), 4).alias("median5"),
    )


@query(
    "ts_interpolate",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events),
    calendar AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM bounds),
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               AVG(value) AS v
        FROM events GROUP BY 1, 2),
    spine AS (
        SELECT t.event_type, c.hour
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN calendar c),
    filled AS (
        SELECT s.event_type, s.hour, h.v,
               last_value(h.v IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(h.hour IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
               first_value(h.v IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(h.hour IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        FROM spine s
        LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.hour = h.hour)
    SELECT event_type, hour,
           (v IS NOT NULL) AS observed,
           {sql_roundn(
               "CASE WHEN v IS NOT NULL THEN v "
               "WHEN pv IS NOT NULL AND nv IS NOT NULL THEN "
               "  pv + (nv - pv) * ((epoch_us(hour) - epoch_us(ph)) * 1.0e0"
               "        / (epoch_us(nh) - epoch_us(ph))) "
               "ELSE COALESCE(pv, nv) END", 4)} AS v_interp
    FROM filled
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — linear gap interpolation over a dense hourly spine:
    observed hours keep their value; interior gaps get the straight line
    between the neighboring observations, weighted by time distance;
    leading/trailing gaps fall back to the nearest one-sided neighbor
    (ts_gapfill's forward-fill generalized to two-sided).

    100 TB: the heavy input collapses to (type, hour) aggregates before
    any window runs; the four IGNORE-NULLS frames share one partition
    ordering, so Catalyst plans a single sort-shuffle per type series —
    interpolation adds zero extra exchanges over plain gap-fill.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.avg("value").alias("v"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    calendar = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL '1' HOUR"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(calendar))
    filled = spine.join(hourly, ["event_type", "hour"], "left")

    back = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    pv = F.last("v", ignorenulls=True).over(back)
    ph = F.last(F.when(F.col("v").isNotNull(), F.col("hour")), True).over(back)
    nv = F.first("v", ignorenulls=True).over(fwd)
    nh = F.first(F.when(F.col("v").isNotNull(), F.col("hour")), True).over(fwd)
    frac = (F.unix_micros("hour") - F.unix_micros(ph)) * F.lit(1.0) / (
        F.unix_micros(nh) - F.unix_micros(ph)
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pv.isNotNull() & nv.isNotNull(), pv + (nv - pv) * frac)
        .otherwise(F.coalesce(pv, nv))
    )
    return filled.select(
        "event_type",
        "hour",
        F.col("v").isNotNull().alias("observed"),
        roundn(interp, 4).alias("v_interp"),
    )


@query(
    "ts_seasonal_baseline",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2),
    d AS (
        SELECT *, dayofweek(day) AS dow FROM daily),
    b AS (
        SELECT event_type, day, n_events,
               median(n_events) OVER (
                   PARTITION BY event_type, dow ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS baseline
        FROM d)
    SELECT event_type, day, n_events,
           {sql_roundn("baseline", 2)} AS baseline,
           {sql_roundn("CASE WHEN baseline > 0 THEN "
                       "(n_events - baseline) / baseline END", 4)}
               AS rel_deviation,
           COALESCE(ABS((n_events - baseline) / baseline) > 0.5, FALSE)
               AS anomaly_flag
    FROM b
    """,
)
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-extension — seasonal volume baseline: each (type, day) count
    compared against the trailing median of the SAME WEEKDAY's last three
    observations — the production form of qc_volume_drift's fixed ±50%
    envelope (a Sunday is judged against Sundays, so weekly seasonality
    doesn't false-alarm). Median, not mean, so one prior outage doesn't
    poison the baseline.

    100 TB: the feed collapses to (type, day) counts before any window;
    the seasonal window partitions by (type, weekday) over ~|days|/7
    aggregated rows each. Weekday alignment: Spark's dayofweek is
    1-based (Sunday=1), DuckDB's 0-based — the Spark side subtracts 1.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n_events"))
    d = daily.withColumn("dow", F.dayofweek("day") - 1)
    w = (
        Window.partitionBy("event_type", "dow")
        .orderBy("day")
        .rowsBetween(-3, -1)
    )
    baseline = F.expr("percentile(n_events, 0.5)").over(w)
    rel = F.when(baseline > 0, (F.col("n_events") - baseline) / baseline)
    return d.select(
        "event_type",
        "day",
        "n_events",
        roundn(baseline, 2).alias("baseline"),
        roundn(rel, 4).alias("rel_deviation"),
        F.coalesce(F.abs(rel) > 0.5, F.lit(False)).alias("anomaly_flag"),
    )
