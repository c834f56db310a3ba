"""Visualization-grade downsampling: Largest-Triangle-Three-Buckets.

The dashboard-serving primitive: reduce a long time series to K points
that preserve its SHAPE (peaks, troughs, trend breaks) far better than
uniform sampling or per-bucket averages — Steinarsson 2013, the public
standard behind Grafana/Influx downsampling.

The selection in bucket i depends on the point selected in bucket i−1
(the triangle anchor), so the recursion is a LEFT FOLD over the bucket
array — the `ts_holt_winters` fold discipline applied to a selection
problem, with a nested argmax fold per bucket.

Scale notes (100 TB): the fact feed collapses to |days| rows before
anything sequential happens; the fold runs over the bounded bucket
array on one row.  A per-series variant partitions the identical
construction by series key (each series' fold is independent — the
embarrassingly-parallel shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: output size (first + last + K-2 bucket picks)
_LTTB_K = 60


@query(
    "ts_downsample_lttb",
    oracle=f"""
    /* state is the FLAT selected list [x1,y1,...,xk,yk]; the anchor is
       its last pair — appending the pick once both advances the anchor
       and records the selection (list_reduce's init-is-first-element
       convention via list_prepend, the ts_holt_winters discipline). */
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                             AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1),
    x AS (
        SELECT datediff('day', (SELECT MIN(day) FROM d), day) AS xd, y,
               ROW_NUMBER() OVER (ORDER BY day) AS rn,
               COUNT(*) OVER () AS n
        FROM d),
    f AS (SELECT CAST(xd AS DOUBLE) AS fx, CAST(y AS DOUBLE) AS fy
          FROM x WHERE rn = 1),
    l AS (SELECT CAST(xd AS DOUBLE) AS lx, CAST(y AS DOUBLE) AS ly
          FROM x WHERE rn = n),
    mid AS (
        SELECT xd, y,
               CAST(((rn - 2) * ({_LTTB_K} - 2)) // (n - 2) AS BIGINT)
                   AS b
        FROM x WHERE rn > 1 AND rn < n),
    bk AS (
        SELECT b,
               flatten(list(list_value(CAST(xd AS DOUBLE),
                                       CAST(y AS DOUBLE))
                            ORDER BY xd)) AS cands,
               CAST(SUM(xd) AS DOUBLE) / COUNT(*) AS ax,
               CAST(SUM(y) AS DOUBLE) / COUNT(*) AS ay
        FROM mid GROUP BY b),
    el AS (
        SELECT b,
               list_concat(
                   list_value(
                       COALESCE(LEAD(ax) OVER (ORDER BY b),
                                (SELECT lx FROM l)),
                       COALESCE(LEAD(ay) OVER (ORDER BY b),
                                (SELECT ly FROM l))),
                   cands) AS e
        FROM bk),
    folded AS (
        SELECT list_concat(
            list_reduce(
                list_prepend(
                    (SELECT list_value(fx, fy) FROM f),
                    (SELECT list(e ORDER BY b) FROM el)),
                (acc, e) -> list_concat(acc,
                    list_slice(
                        list_reduce(
                            list_prepend(
                                list_value(-1.0e0, 0.0e0, 0.0e0),
                                list_transform(
                                    range(1, (len(e) - 2) // 2 + 1),
                                    i -> list_value(
                                        abs((acc[len(acc) - 1] - e[1])
                                            * (e[2 * i + 2]
                                               - acc[len(acc)])
                                            - (acc[len(acc) - 1]
                                               - e[2 * i + 1])
                                            * (e[2] - acc[len(acc)])),
                                        e[2 * i + 1],
                                        e[2 * i + 2]))),
                            (a, c) -> CASE WHEN c[1] > a[1]
                                           THEN c ELSE a END),
                        2, 3))),
            (SELECT list_value(lx, ly) FROM l)) AS s),
    idx AS (
        SELECT s, UNNEST(range(1, len(s) // 2 + 1)) AS i FROM folded)
    SELECT CAST(i AS BIGINT) AS sel_idx,
           CAST(s[2 * i - 1] AS INT) AS x_day,
           CAST((SELECT MIN(day) FROM d)
                + CAST(CAST(s[2 * i - 1] AS INT) AS BIGINT)
                  * INTERVAL 1 DAY AS DATE) AS day,
           CAST(s[2 * i] AS BIGINT) AS y_cents
    FROM idx
    ORDER BY sel_idx
    """,
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-serving tier — LTTB DOWNSAMPLING: reduce the {n}-point daily
    revenue series to {k} shape-preserving points.  First and last
    points always survive; each of the {k}−2 equal-population middle
    buckets contributes the point forming the LARGEEST triangle with
    (a) the previously SELECTED point and (b) the next bucket's
    centroid — the sequential anchor dependency that makes naive
    per-bucket argmax lose peaks at bucket boundaries.

    Exactness: x (day offset) and y (cents) enter the fold as
    integer-valued doubles; the triangle area 2A =
    |(pₓ−nₓ)(cy−py) − (pₓ−cₓ)(ny−py)| is one fixed IEEE scalar tree
    on both engines; the argmax keeps the FIRST maximum (strict ``>``
    over the x-ordered candidate list), so ties cannot drift; no
    rounding is needed anywhere — selected points are EXACT originals.

    100 TB: the fact scan collapses map-side to |days| rows; bucket
    centroids are one day-grain aggregate; the fold runs over the
    K-bounded bucket array on a single row.  Per-series downsampling
    partitions the identical fold by series key.

    Reference parity: the reference's curated tier feeds BI dashboards
    (`dags/pipeline_orchestration_dag.py:178-208` curation writes);
    LTTB is the serving-side reducer those dashboards run.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    d = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.sum(cents).alias("y"))
    w_all = Window.orderBy("day")
    x = d.select(
        F.datediff(
            "day", F.min("day").over(w_all.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            ))
        ).alias("xd"),
        "y",
        F.row_number().over(w_all).alias("rn"),
        F.count("*")
        .over(
            w_all.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
        "day",
    ).localCheckpoint(eager=False)  # first/last/mid/min-day consumers
    first = x.where(F.col("rn") == 1).select(
        F.col("xd").cast("double").alias("fx"),
        F.col("y").cast("double").alias("fy"),
        F.col("day").alias("day0"),
    )
    last = x.where(F.col("rn") == F.col("n")).select(
        F.col("xd").cast("double").alias("lx"),
        F.col("y").cast("double").alias("ly"),
    )
    mid = x.where((F.col("rn") > 1) & (F.col("rn") < F.col("n"))).select(
        "xd",
        "y",
        F.expr(f"CAST(((rn - 2) * ({_LTTB_K} - 2)) DIV (n - 2) AS BIGINT)")
        .alias("b"),
    )
    bk = mid.groupBy("b").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("xd").cast("double").alias("x"),
                    F.col("y").cast("double").alias("y"),
                )
            )
        ).alias("cands"),
        (F.sum("xd").cast("double") / F.count("*")).alias("ax"),
        (F.sum("y").cast("double") / F.count("*")).alias("ay"),
    )
    wb = Window.orderBy("b")
    el = bk.crossJoin(F.broadcast(last)).select(
        "b",
        "cands",
        F.coalesce(F.lead("ax").over(wb), F.col("lx")).alias("nax"),
        F.coalesce(F.lead("ay").over(wb), F.col("ly")).alias("nay"),
    )
    buckets = el.agg(
        F.sort_array(
            F.collect_list(F.struct("b", "cands", "nax", "nay"))
        ).alias("bks")
    )

    def _step(acc, e):
        px = F.element_at(acc, -1).getField("x")
        py = F.element_at(acc, -1).getField("y")
        nax = e.getField("nax")
        nay = e.getField("nay")

        def _area(c):
            return F.abs(
                (px - nax) * (c.getField("y") - py)
                - (px - c.getField("x")) * (nay - py)
            )

        best = F.aggregate(
            e.getField("cands"),
            F.struct(
                F.lit(-1.0).alias("area"),
                F.lit(0.0).alias("x"),
                F.lit(0.0).alias("y"),
            ),
            lambda ba, c: F.when(
                _area(c) > ba.getField("area"),
                F.struct(
                    _area(c).alias("area"),
                    c.getField("x").alias("x"),
                    c.getField("y").alias("y"),
                ),
            ).otherwise(ba),
        )
        return F.concat(
            acc,
            F.array(
                F.struct(
                    best.getField("x").alias("x"),
                    best.getField("y").alias("y"),
                )
            ),
        )

    sel = (
        buckets.crossJoin(F.broadcast(first))
        .crossJoin(F.broadcast(last))
        .select(
            "day0",
            F.concat(
                F.aggregate(
                    F.col("bks"),
                    F.array(
                        F.struct(
                            F.col("fx").alias("x"), F.col("fy").alias("y")
                        )
                    ),
                    _step,
                ),
                F.array(
                    F.struct(
                        F.col("lx").alias("x"), F.col("ly").alias("y")
                    )
                ),
            ).alias("s"),
        )
    )
    return (
        sel.select(
            "day0", F.posexplode("s").alias("pos", "p")
        )
        .select(
            (F.col("pos") + 1).cast("long").alias("sel_idx"),
            F.col("p.x").cast("int").alias("x_day"),
            F.date_add("day0", F.col("p.x").cast("int")).alias("day"),
            F.col("p.y").cast("long").alias("y_cents"),
        )
        .orderBy("sel_idx")
    )


ts_downsample_lttb.__doc__ = ts_downsample_lttb.__doc__.format(
    n="~2400", k=_LTTB_K
)


# --------------------------------------------------------------------------
# sli_burn_rate_alerts — multi-window burn-rate alert policy
# --------------------------------------------------------------------------

#: error budget: SLO = 75% success, budget = 25% error share (sized to
#: the synthetic feed's ~20% baseline so both alert states occur);
#: burn = error_share / budget = 4 * error_share
_BURN_BUDGET_INV = 4

#: thresholds in ppm of burn rate: page = sustained 2x budget burn on
#: BOTH the 1h and 6h windows (the fast+confirm pair), ticket = 1.2x
#: on both the 1d and 3d windows (the slow-leak pair) — the Google SRE
#: workbook's multiwindow policy SHAPE, thresholds scaled to this SLO
_BURN_PAGE_PPM = 2_000_000
_BURN_TICKET_PPM = 1_200_000


@query(
    "sli_burn_rate_alerts",
    oracle=f"""
    WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errors,
               CAST(COUNT(*) AS BIGINT) AS total
        FROM events GROUP BY 1),
    win AS (
        SELECT hour, errors, total,
               CAST(SUM(errors) OVER w6 AS BIGINT) AS e6,
               CAST(SUM(total) OVER w6 AS BIGINT) AS t6,
               CAST(SUM(errors) OVER w24 AS BIGINT) AS e24,
               CAST(SUM(total) OVER w24 AS BIGINT) AS t24,
               CAST(SUM(errors) OVER w72 AS BIGINT) AS e72,
               CAST(SUM(total) OVER w72 AS BIGINT) AS t72
        FROM hourly
        WINDOW w6 AS (ORDER BY hour ROWS BETWEEN 5 PRECEDING
                      AND CURRENT ROW),
               w24 AS (ORDER BY hour ROWS BETWEEN 23 PRECEDING
                       AND CURRENT ROW),
               w72 AS (ORDER BY hour ROWS BETWEEN 71 PRECEDING
                       AND CURRENT ROW)),
    burn AS (
        SELECT hour, errors, total,
               ({_BURN_BUDGET_INV} * 1000000 * errors) // total
                   AS burn_1h_ppm,
               ({_BURN_BUDGET_INV} * 1000000 * e6) // t6 AS burn_6h_ppm,
               ({_BURN_BUDGET_INV} * 1000000 * e24) // t24
                   AS burn_1d_ppm,
               ({_BURN_BUDGET_INV} * 1000000 * e72) // t72
                   AS burn_3d_ppm
        FROM win)
    SELECT hour, errors, total,
           CAST(burn_1h_ppm AS BIGINT) AS burn_1h_ppm,
           CAST(burn_6h_ppm AS BIGINT) AS burn_6h_ppm,
           CAST(burn_1d_ppm AS BIGINT) AS burn_1d_ppm,
           CAST(burn_3d_ppm AS BIGINT) AS burn_3d_ppm,
           (burn_1h_ppm >= {_BURN_PAGE_PPM}
            AND burn_6h_ppm >= {_BURN_PAGE_PPM}) AS page,
           (burn_1d_ppm >= {_BURN_TICKET_PPM}
            AND burn_3d_ppm >= {_BURN_TICKET_PPM}) AS ticket
    FROM burn
    ORDER BY hour
    """,
)
def sli_burn_rate_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-ops tier — MULTI-WINDOW BURN-RATE ALERTING (the
    Google SRE workbook policy `sli_error_budget` budgets and
    `ops_incident_mttr` measures): per hour, the error-budget burn
    rate over FOUR trailing windows; PAGE when both the fast (1h) and
    confirming (6h) windows burn ≥ 2× budget — a single noisy hour
    cannot page, a real outage pages within the hour; TICKET when both
    the slow-leak windows (1d, 3d) burn ≥ 1.2× — drains too slow to
    page but on track to exhaust the budget.  The dual-window AND is
    the policy's point: it bounds both detection time AND reset time.

    Exactness: hourly error/total counts are exact int64; window sums
    are integer; burn rates are integer ppm via one DIV — no float
    exists anywhere, so the alert booleans cannot flicker across
    engines or runs.

    100 TB: the feed collapses map-side to |hours| rows; all four
    frames share the single hour-ordered window pass (bounded by the
    calendar, not the data); alert evaluation is projection-side.

    Reference parity: the reference's `email_on_failure`
    (dags/pipeline_orchestration_dag.py:31-33) alerts on single task
    failures; burn-rate alerting is that signal made budget-aware.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errors"),
        F.count("*").cast("long").alias("total"),
    )
    w = Window.orderBy("hour")
    win = hourly.select(
        "hour",
        "errors",
        "total",
        F.sum("errors").over(w.rowsBetween(-5, 0)).cast("long").alias("e6"),
        F.sum("total").over(w.rowsBetween(-5, 0)).cast("long").alias("t6"),
        F.sum("errors")
        .over(w.rowsBetween(-23, 0))
        .cast("long")
        .alias("e24"),
        F.sum("total")
        .over(w.rowsBetween(-23, 0))
        .cast("long")
        .alias("t24"),
        F.sum("errors")
        .over(w.rowsBetween(-71, 0))
        .cast("long")
        .alias("e72"),
        F.sum("total")
        .over(w.rowsBetween(-71, 0))
        .cast("long")
        .alias("t72"),
    )
    b = _BURN_BUDGET_INV
    burn = win.select(
        "hour",
        "errors",
        "total",
        F.expr(f"CAST(({b} * 1000000 * errors) DIV total AS BIGINT)")
        .alias("burn_1h_ppm"),
        F.expr(f"CAST(({b} * 1000000 * e6) DIV t6 AS BIGINT)")
        .alias("burn_6h_ppm"),
        F.expr(f"CAST(({b} * 1000000 * e24) DIV t24 AS BIGINT)")
        .alias("burn_1d_ppm"),
        F.expr(f"CAST(({b} * 1000000 * e72) DIV t72 AS BIGINT)")
        .alias("burn_3d_ppm"),
    )
    return burn.select(
        "*",
        (
            (F.col("burn_1h_ppm") >= _BURN_PAGE_PPM)
            & (F.col("burn_6h_ppm") >= _BURN_PAGE_PPM)
        ).alias("page"),
        (
            (F.col("burn_1d_ppm") >= _BURN_TICKET_PPM)
            & (F.col("burn_3d_ppm") >= _BURN_TICKET_PPM)
        ).alias("ticket"),
    ).orderBy("hour")


# --------------------------------------------------------------------------
# ts_seasonality_strength — Hyndman trend/seasonal strength
# --------------------------------------------------------------------------


@query(
    "ts_seasonality_strength",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1),
    ma AS (
        SELECT day, cents,
               CAST(SUM(cents) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
                   AS sum7,
               COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7,
               CAST(EXTRACT(isodow FROM day) AS INT) AS wd
        FROM d),
    core AS (
        SELECT day, cents, wd, sum7, 7 * cents - sum7 AS det7
        FROM ma WHERE n7 = 7),
    seas AS (
        SELECT wd, SUM(det7) * 1.0e0 / (7.0e0 * COUNT(*)) AS s_wd
        FROM core GROUP BY wd),
    norm AS (SELECT AVG(s_wd) AS s_mean FROM seas),
    q AS (
        SELECT
            CAST(FLOOR(c.det7 / 7.0e0
                       - (s.s_wd - n.s_mean) + 0.5e0)
                 AS BIGINT) AS r_q,
            CAST(FLOOR(c.det7 / 7.0e0 + 0.5e0) AS BIGINT)
                AS sr_q,
            CAST(FLOOR(c.cents - (s.s_wd - n.s_mean)
                       + 0.5e0) AS BIGINT) AS tr_q
        FROM core c JOIN seas s ON s.wd = c.wd, norm n),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r_q) AS BIGINT) AS s_r,
               CAST(SUM(r_q * r_q) AS BIGINT) AS s_rr,
               CAST(SUM(sr_q) AS BIGINT) AS s_sr,
               CAST(SUM(sr_q * sr_q) AS BIGINT) AS s_srsr,
               CAST(SUM(tr_q) AS BIGINT) AS s_tr,
               CAST(SUM(tr_q * tr_q) AS BIGINT) AS s_trtr
        FROM q)
    SELECT n AS n_days,
           CASE WHEN (CAST(n AS DOUBLE) * s_srsr
                      - CAST(s_sr AS DOUBLE) * s_sr) <= 0.0e0 THEN 0.0e0
                ELSE FLOOR(GREATEST(0.0e0,
                    1.0e0 - (CAST(n AS DOUBLE) * s_rr
                             - CAST(s_r AS DOUBLE) * s_r)
                            / (CAST(n AS DOUBLE) * s_srsr
                               - CAST(s_sr AS DOUBLE) * s_sr))
                    * 1000000.0e0 + 0.5e0) / 1000000.0e0
           END AS f_seasonal,
           CASE WHEN (CAST(n AS DOUBLE) * s_trtr
                      - CAST(s_tr AS DOUBLE) * s_tr) <= 0.0e0 THEN 0.0e0
                ELSE FLOOR(GREATEST(0.0e0,
                    1.0e0 - (CAST(n AS DOUBLE) * s_rr
                             - CAST(s_r AS DOUBLE) * s_r)
                            / (CAST(n AS DOUBLE) * s_trtr
                               - CAST(s_tr AS DOUBLE) * s_tr))
                    * 1000000.0e0 + 0.5e0) / 1000000.0e0
           END AS f_trend,
           (CAST(n AS DOUBLE) * s_srsr - CAST(s_sr AS DOUBLE) * s_sr)
               > (CAST(n AS DOUBLE) * s_trtr
                  - CAST(s_tr AS DOUBLE) * s_tr) AS seasonal_dominant
    FROM mom
    """,
)
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-extension — Hyndman SEASONALITY / TREND STRENGTH: the scalar
    verdicts over `ts_stl_decompose`'s classical decomposition —
    F_seasonal = max(0, 1 − Var(R)/Var(S+R)) and
    F_trend = max(0, 1 − Var(R)/Var(T+R)) (Wang-Smith-Hyndman), the
    0..1 scores feature stores use to route series to seasonal vs
    trend models (`ts_period_detect` finds the period; this key says
    whether it matters).

    Exactness: the decomposition reuses the exact-integer det7 = 7x−Σ₇
    discipline; the three component series (R, S+R, T+R) quantize to
    whole-CENT int64 via identical scalar trees BEFORE any cross-row
    sum (cent grain keeps Σx² inside int64 with ~100× revenue
    headroom; the F ratios are insensitive at 1e-6 relative error), so variances are exact co-moment sums (n·Σx²−(Σx)²) and the
    F ratios are fixed one-row scalar trees, quantized at projection.

    100 TB: day-grain collapse map-side; windows calendar-bounded;
    the verdict is a one-row aggregate.  Per-series strength
    partitions the identical construction by series key.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents).cast("long").alias("cents")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    ma = d.select(
        "day",
        "cents",
        F.sum("cents").over(w7).cast("long").alias("sum7"),
        F.count("*").over(w7).alias("n7"),
        (((F.dayofweek("day") + 5) % 7) + 1).cast("int").alias("wd"),
    )
    core = ma.where(F.col("n7") == 7).select(
        "day",
        "cents",
        "wd",
        (F.lit(7) * F.col("cents") - F.col("sum7")).alias("det7"),
    )
    core = core.localCheckpoint(eager=False)  # seasonal + quantize uses
    seas = core.groupBy("wd").agg(
        (
            F.sum("det7") * F.lit(1.0)
            / (F.lit(7.0) * F.count("*"))
        ).alias("s_wd")
    )
    norm = seas.agg(F.avg("s_wd").alias("s_mean"))
    q = (
        core.join(F.broadcast(seas), "wd")
        .crossJoin(F.broadcast(norm))
        .select(
            F.floor(
                F.col("det7") / F.lit(7.0)
                - (F.col("s_wd") - F.col("s_mean"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("r_q"),
            F.floor(F.col("det7") / F.lit(7.0) + F.lit(0.5))
            .cast("long")
            .alias("sr_q"),
            F.floor(
                F.col("cents")
                - (F.col("s_wd") - F.col("s_mean"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("tr_q"),
        )
    )
    mom = q.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r_q").cast("long").alias("s_r"),
        F.sum(F.col("r_q") * F.col("r_q")).cast("long").alias("s_rr"),
        F.sum("sr_q").cast("long").alias("s_sr"),
        F.sum(F.col("sr_q") * F.col("sr_q")).cast("long").alias("s_srsr"),
        F.sum("tr_q").cast("long").alias("s_tr"),
        F.sum(F.col("tr_q") * F.col("tr_q")).cast("long").alias("s_trtr"),
    )
    nd = F.col("n").cast("double")
    var_r = nd * F.col("s_rr") - F.col("s_r").cast("double") * F.col("s_r")
    var_sr = (
        nd * F.col("s_srsr")
        - F.col("s_sr").cast("double") * F.col("s_sr")
    )
    var_tr = (
        nd * F.col("s_trtr")
        - F.col("s_tr").cast("double") * F.col("s_tr")
    )
    return mom.select(
        F.col("n").alias("n_days"),
        F.when(var_sr <= 0.0, F.lit(0.0))
        .otherwise(
            roundn(
                F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_sr), 6
            )
        )
        .alias("f_seasonal"),
        F.when(var_tr <= 0.0, F.lit(0.0))
        .otherwise(
            roundn(
                F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_tr), 6
            )
        )
        .alias("f_trend"),
        (var_sr > var_tr).alias("seasonal_dominant"),
    )


# --------------------------------------------------------------------------
# ts_dtw_distance — dynamic time warping between two daily series
# --------------------------------------------------------------------------

#: border infinity for the DP lattice: far above any reachable path
#: cost, far below int64/2 so border+cost never overflows
_DTW_INF = 1 << 60


@query(
    "ts_dtw_distance",
    oracle=f"""
    /* the DP runs as a row fold: outer fold over series A, state =
       previous padded DP row [D(i,0..n)]; inner fold over j appends
       D(i,j) = |a_i-b_j| + min(D(i-1,j), D(i,j-1), D(i-1,j-1)).
       list_reduce's acc type = element type, so scalars ride as
       one-element lists (the ts_holt_winters list discipline). */
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN event_type = 'view'
                             THEN 1 ELSE 0 END) AS BIGINT) AS b
        FROM events GROUP BY 1),
    arrs AS (
        SELECT list(a ORDER BY day) AS av, list(b ORDER BY day) AS bv,
               COUNT(*) AS n
        FROM d),
    folded AS (
        SELECT n, av, bv,
            list_reduce(
                list_prepend(
                    list_prepend(CAST(0 AS BIGINT),
                        list_transform(range(1, CAST(n AS INT) + 1),
                                       x -> CAST({_DTW_INF} AS BIGINT))),
                    list_transform(av, a -> list_value(a))),
                (prev, ae) -> list_reduce(
                    list_prepend(
                        list_value(CAST({_DTW_INF} AS BIGINT)),
                        list_transform(range(1, CAST(n AS INT) + 1),
                                       j -> list_value(CAST(j AS BIGINT)))),
                    (curr, je) -> list_append(curr,
                        abs(ae[1] - bv[CAST(je[1] AS INT)])
                        + least(prev[CAST(je[1] AS INT) + 1],
                                curr[len(curr)],
                                prev[CAST(je[1] AS INT)])))) AS row_n
        FROM arrs),
    lock AS (
        SELECT CAST(list_sum(list_transform(range(1, CAST(n AS INT) + 1),
                    i -> abs(av[CAST(i AS INT)] - bv[CAST(i AS INT)])))
               AS BIGINT) AS lockstep_l1
        FROM arrs)
    SELECT f.n AS n_days,
           CAST(f.row_n[CAST(f.n AS INT) + 1] AS BIGINT) AS dtw_l1,
           l.lockstep_l1,
           CAST(l.lockstep_l1 - f.row_n[CAST(f.n AS INT) + 1] AS BIGINT)
               AS warp_gain
    FROM folded f, lock l
    """,
)
def ts_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-extension — DYNAMIC TIME WARPING between the daily click and
    view count series: the elastic distance that aligns shifted/
    stretched patterns where lockstep L1 punishes any phase offset —
    THE similarity measure for "do these two metrics move alike, even
    off by a day or two?".  Emitted beside the lockstep L1 with
    ``warp_gain`` = lockstep − DTW, which is PROVABLY ≥ 0 (the
    diagonal path is one admissible warping, so the DP minimum can
    only improve on it — a testable invariant, planted-shift laws
    drive it positive).

    The full O(n²) DP runs as a LEFT FOLD over series A whose state is
    the previous padded DP row, with a nested fold over B building
    each row — `eval_rouge_l`'s DP-as-fold discipline on the warping
    lattice.  Border cells carry an integer infinity (2⁶⁰: above any
    path cost, safely below overflow).

    Exactness: costs are |a−b| on exact int64 daily counts; every DP
    cell is an int64 min/add — no float exists anywhere.

    100 TB: both series collapse map-side to |days| rows; the fold
    runs on ONE row over calendar-bounded arrays.  Pairwise DTW over
    many series partitions the identical fold by series pair (each
    pair independent), with banded (Sakoe-Chiba) pruning as the
    long-series swap.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    arrs = d.agg(
        F.array_sort(
            F.collect_list(F.struct("day", "a", "b"))
        ).alias("rows"),
        F.count("*").alias("n"),
    ).select(
        F.expr("transform(rows, r -> r.a)").alias("av"),
        F.expr("transform(rows, r -> r.b)").alias("bv"),
        "n",
    )
    inf = F.lit(_DTW_INF).cast("long")

    def _row(prev, a):
        def _cell(curr, j):
            cost = F.abs(a - F.element_at(F.col("bv"), j.cast("int")))
            best = F.least(
                F.element_at(prev, (j + 1).cast("int")),
                F.element_at(curr, -1),
                F.element_at(prev, j.cast("int")),
            )
            return F.concat(curr, F.array(cost + best))

        return F.aggregate(
            F.expr("sequence(1L, n)"),
            F.array(inf),
            _cell,
        )

    init = F.concat(
        F.array(F.lit(0).cast("long")),
        F.expr(f"array_repeat({_DTW_INF}L, CAST(n AS INT))"),
    )
    folded = arrs.select(
        F.col("n").cast("long").alias("n_days"),
        F.element_at(
            F.aggregate(F.col("av"), init, _row),
            F.expr("CAST(n AS INT) + 1"),
        )
        .cast("long")
        .alias("dtw_l1"),
        F.expr(
            "CAST(aggregate(zip_with(av, bv, (x, y) -> abs(x - y)),"
            " 0L, (acc, v) -> acc + v) AS BIGINT)"
        ).alias("lockstep_l1"),
    )
    return folded.select(
        "n_days",
        "dtw_l1",
        "lockstep_l1",
        (F.col("lockstep_l1") - F.col("dtw_l1"))
        .cast("long")
        .alias("warp_gain"),
    )


# --------------------------------------------------------------------------
# ts_dtw_banded — Sakoe-Chiba banded DTW (the long-series scale swap)
# --------------------------------------------------------------------------

#: Sakoe-Chiba band half-width in days: cells with |i-j| > band are
#: never evaluated, capping per-row DP cost at 2w+1 regardless of n
_DTW_BAND = 7


def _dtw_banded_frame(spark: SparkSession, sf_dir: str, w: int) -> DataFrame:
    """The banded-DTW plan parameterized by half-width ``w`` — split out
    so the law test can instantiate w >= n and assert equality with the
    full-lattice ts_dtw_distance."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    arrs = d.agg(
        F.array_sort(
            F.collect_list(F.struct("day", "a", "b"))
        ).alias("rows"),
        F.count("*").alias("n"),
    ).select(
        F.expr("transform(rows, r -> r.a)").alias("av"),
        F.expr("transform(rows, r -> r.b)").alias("bv"),
        "n",
    )
    inf = F.lit(_DTW_INF).cast("long")
    wl = F.lit(w).cast("long")
    nl = F.col("n").cast("long")

    def _row(prev, i):
        lo = F.greatest(F.lit(1).cast("long"), i - wl)
        hi = F.least(nl, i + wl)
        a = F.element_at(F.col("av"), i.cast("int"))

        def _cell(curr, j):
            cost = F.abs(a - F.element_at(F.col("bv"), j.cast("int")))
            best = F.least(
                F.element_at(prev, (j + 1).cast("int")),
                F.element_at(curr, -1),
                F.element_at(prev, j.cast("int")),
            )
            return F.concat(curr, F.array(cost + best))

        # prefix of lo infs = the j=0 border plus columns < lo (out of
        # band); only j in [lo, hi] is ever evaluated — the band cap
        body = F.aggregate(
            F.sequence(lo, hi),
            F.array_repeat(inf, lo.cast("int")),
            _cell,
        )
        return F.concat(body, F.array_repeat(inf, (nl - hi).cast("int")))

    init = F.concat(
        F.array(F.lit(0).cast("long")),
        F.expr(f"array_repeat({_DTW_INF}L, CAST(n AS INT))"),
    )
    return arrs.select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(w).cast("long").alias("band_w"),
        F.element_at(
            F.aggregate(F.expr("sequence(1L, n)"), init, _row),
            F.expr("CAST(n AS INT) + 1"),
        )
        .cast("long")
        .alias("dtw_banded_l1"),
        F.expr(
            "CAST(aggregate(zip_with(av, bv, (x, y) -> abs(x - y)),"
            " 0L, (acc, v) -> acc + v) AS BIGINT)"
        ).alias("lockstep_l1"),
        F.expr(
            f"CAST(aggregate(sequence(1L, n), 0L, (acc, i) -> acc"
            f" + least(n, i + {w}L) - greatest(1L, i - {w}L) + 1L)"
            " AS BIGINT)"
        ).alias("band_cells"),
    ).select(
        "n_days",
        "band_w",
        "dtw_banded_l1",
        "lockstep_l1",
        (F.col("lockstep_l1") - F.col("dtw_banded_l1"))
        .cast("long")
        .alias("warp_gain_banded"),
        "band_cells",
        (F.col("n_days") * F.col("n_days")).cast("long").alias("full_cells"),
    )


@query(
    "ts_dtw_banded",
    oracle=f"""
    /* the full-DTW DP fold (ts_dtw_distance) with the Sakoe-Chiba band:
       row i starts as GREATEST(1, i-w) infs (border + out-of-band
       prefix), folds only j in [i-w, i+w], then pads the out-of-band
       suffix — so per-row work is <= 2w+1 cells. */
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN event_type = 'view'
                             THEN 1 ELSE 0 END) AS BIGINT) AS b
        FROM events GROUP BY 1),
    arrs AS (
        SELECT list(a ORDER BY day) AS av, list(b ORDER BY day) AS bv,
               COUNT(*) AS n
        FROM d),
    folded AS (
        SELECT n, av, bv,
            list_reduce(
                list_prepend(
                    list_prepend(CAST(0 AS BIGINT),
                        list_transform(range(1, CAST(n AS INT) + 1),
                                       x -> CAST({_DTW_INF} AS BIGINT))),
                    list_transform(range(1, CAST(n AS INT) + 1),
                                   i -> list_value(CAST(i AS BIGINT)))),
                (prev, ie) -> list_concat(
                    list_reduce(
                        list_prepend(
                            list_transform(
                                range(1, CAST(GREATEST(1, ie[1] - {_DTW_BAND})
                                              AS INT) + 1),
                                x -> CAST({_DTW_INF} AS BIGINT)),
                            list_transform(
                                range(CAST(GREATEST(1, ie[1] - {_DTW_BAND})
                                           AS INT),
                                      CAST(LEAST(n, ie[1] + {_DTW_BAND})
                                           AS INT) + 1),
                                j -> list_value(CAST(j AS BIGINT)))),
                        (curr, je) -> list_append(curr,
                            abs(av[CAST(ie[1] AS INT)]
                                - bv[CAST(je[1] AS INT)])
                            + least(prev[CAST(je[1] AS INT) + 1],
                                    curr[len(curr)],
                                    prev[CAST(je[1] AS INT)]))),
                    list_transform(
                        range(1, CAST(n - LEAST(n, ie[1] + {_DTW_BAND})
                                      AS INT) + 1),
                        x -> CAST({_DTW_INF} AS BIGINT)))) AS row_n
        FROM arrs),
    lock AS (
        SELECT CAST(list_sum(list_transform(range(1, CAST(n AS INT) + 1),
                    i -> abs(av[CAST(i AS INT)] - bv[CAST(i AS INT)])))
               AS BIGINT) AS lockstep_l1
        FROM arrs)
    SELECT f.n AS n_days,
           CAST({_DTW_BAND} AS BIGINT) AS band_w,
           CAST(f.row_n[CAST(f.n AS INT) + 1] AS BIGINT) AS dtw_banded_l1,
           l.lockstep_l1,
           CAST(l.lockstep_l1 - f.row_n[CAST(f.n AS INT) + 1] AS BIGINT)
               AS warp_gain_banded,
           CAST(list_sum(list_transform(range(1, CAST(f.n AS INT) + 1),
                i -> LEAST(f.n, i + {_DTW_BAND})
                     - GREATEST(1, i - {_DTW_BAND}) + 1)) AS BIGINT)
               AS band_cells,
           CAST(f.n * f.n AS BIGINT) AS full_cells
    FROM folded f, lock l
    """,
)
def ts_dtw_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-extension — SAKOE-CHIBA BANDED DTW between the daily click and
    view series: ts_dtw_distance's elastic alignment with the classic
    |i-j| <= w constraint (w={w} days), the LONG-SERIES SCALE SWAP the
    full-lattice key documents.  The band is both a cost cap and a
    modeling choice: alignments that warp more than w days apart are
    disallowed, so banded DTW >= full DTW, and per-row DP work drops
    from n cells to at most 2w+1 — O(n*w) total instead of O(n^2),
    the difference between feasible and not on year-long minute-grain
    series.  ``band_cells`` vs ``full_cells`` reports the realized cap
    so the saving is a verified output, not a docstring claim.

    Laws (tests/test_wave_r5a.py): w >= n recovers the full DTW
    bit-exactly (the band stops binding); the diagonal is always
    in-band so lockstep L1 >= banded DTW (warp_gain_banded >= 0);
    banded >= full DTW at any w; band_cells <= n*(2w+1).

    Exactness: identical int64 DP cells as ts_dtw_distance; out-of-band
    cells carry the same 2^60 integer infinity as the borders.

    100 TB: the series collapses map-side to |days| rows and the fold
    runs on ONE row; the band caps the fold at O(n*w) — pairwise
    banded DTW over many series partitions the same fold by pair.
    """
    return _dtw_banded_frame(spark, sf_dir, _DTW_BAND)


ts_dtw_banded.__doc__ = ts_dtw_banded.__doc__.format(w=_DTW_BAND)


# --------------------------------------------------------------------------
# ts_bounce_rate — single-event-session share per day
# --------------------------------------------------------------------------

#: session gap: a pause longer than this starts a new session
_BR_GAP_S = 1800


@query(
    "ts_bounce_rate",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS us FROM events),
    flagged AS (
        SELECT user_id, us,
               CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                            ORDER BY us)
                         > {_BR_GAP_S} * 1000000
                         OR LAG(us) OVER (PARTITION BY user_id
                                          ORDER BY us) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM ev),
    sess AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
    per AS (
        SELECT user_id, sid,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(us) AS BIGINT) AS start_us
        FROM sess GROUP BY 1, 2)
    SELECT CAST(to_timestamp(start_us // 1000000) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           CAST((SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 * 1000000) // COUNT(*) AS BIGINT) AS bounce_ppm
    FROM per
    GROUP BY 1
    ORDER BY day
    """,
)
def ts_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-extension — daily BOUNCE RATE: sessionize each user's stream
    with a {g}-minute inactivity gap (lag-flag + running sum, the
    `win_islands` primitive), call a single-event session a bounce,
    and roll up per session-start day — the engagement topline next
    to `ts_active_users`' volume topline (`sessionize_path` walks the
    session's contents, `sessionize_adaptive` tunes the gap; this key
    reads the sessions' SHAPE).

    Exactness: timestamps are exact int64 micros; session ids are
    integer prefix sums; the rate is integer ppm via one DIV — no
    float anywhere.

    100 TB: one hash exchange on user_id serves the lag and the
    running sum; the session rollup reuses the same partitioning
    (user_id ⊂ the session key); the day rollup is map-side.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    lag = F.lag("us").over(w)
    flagged = ev.select(
        "user_id",
        "us",
        F.when(
            lag.isNull() | ((F.col("us") - lag) > _BR_GAP_S * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = flagged.select(
        "user_id",
        "us",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("us").cast("long").alias("start_us"),
    )
    return (
        per.groupBy(
            F.to_date(
                F.timestamp_seconds(F.expr("start_us DIV 1000000"))
            ).alias("day")
        )
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounces"),
            F.expr(
                "CAST((SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
                " * 1000000) DIV COUNT(*) AS BIGINT)"
            ).alias("bounce_ppm"),
        )
        .orderBy("day")
    )


ts_bounce_rate.__doc__ = ts_bounce_rate.__doc__.format(
    g=_BR_GAP_S // 60
)


# --------------------------------------------------------------------------
# ts_burstiness — Goh-Barabási burstiness + daily Fano factor
# --------------------------------------------------------------------------


@query(
    "ts_burstiness",
    oracle="""
    WITH ev AS (
        SELECT event_type, epoch_us(ts) AS us FROM events),
    gaps AS (
        SELECT event_type,
               (us - LAG(us) OVER (PARTITION BY event_type ORDER BY us))
                   // 1000 AS gap_ms
        FROM ev),
    gm AS (
        SELECT event_type,
               CAST(COUNT(gap_ms) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_ms) AS BIGINT) AS s1,
               CAST(SUM(gap_ms * gap_ms) AS BIGINT) AS s2
        FROM gaps WHERE gap_ms IS NOT NULL GROUP BY event_type),
    daily AS (
        SELECT event_type, CAST(to_timestamp(us // 1000000) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM ev GROUP BY 1, 2),
    dm AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(c) AS BIGINT) AS c1,
               CAST(SUM(c * c) AS BIGINT) AS c2
        FROM daily GROUP BY event_type)
    SELECT g.event_type, g.n_gaps,
           CAST(g.s1 // g.n_gaps AS BIGINT) AS mean_gap_ms,
           FLOOR((SQRT((CAST(g.n_gaps AS DOUBLE) * g.s2
                        - CAST(g.s1 AS DOUBLE) * g.s1))
                  - CAST(g.s1 AS DOUBLE))
                 / (SQRT((CAST(g.n_gaps AS DOUBLE) * g.s2
                          - CAST(g.s1 AS DOUBLE) * g.s1))
                    + CAST(g.s1 AS DOUBLE))
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS burstiness,
           FLOOR((CAST(d.n_days AS DOUBLE) * d.c2
                  - CAST(d.c1 AS DOUBLE) * d.c1)
                 / CAST(d.n_days AS DOUBLE)
                 / CAST(d.c1 AS DOUBLE)
                 * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS fano_daily
    FROM gm g JOIN dm d ON d.event_type = g.event_type
    ORDER BY g.event_type
    """,
)
def ts_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-extension — BURSTINESS per event type: the Goh-Barabási
    coefficient B = (σ−μ)/(σ+μ) over inter-arrival gaps (−1 = perfect
    clock, 0 = Poisson, →1 = extreme bursts) plus the daily-count FANO
    factor (variance/mean; 1 = Poisson) — the two standard "is this
    stream clocked, random, or bursty?" diagnostics behind capacity
    planning and anomaly thresholds (`ts_interarrival` reports the
    cadence percentiles; this key classifies the PROCESS).

    Exactness trick: σ√n cancellation — B = (√(nΣx²−(Σx)²) − Σx·?)…
    written directly on the co-moment sums: both σ and μ scale by the
    same factor inside the ratio, so B computes from the RAW sums
    (√(n·s2−s1²) vs s1) with no per-row float; gaps downscale to
    exact integer MILLISECONDS so Σgap² stays in int64 at any density
    (denser stream → smaller gaps → smaller Σgap²).

    100 TB: one hash exchange on event_type for the lag; both moment
    sets collapse map-side to |types| rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("event_type").orderBy("us")
    gaps = ev.select(
        "event_type",
        F.expr("(us - LAG(us) OVER (PARTITION BY event_type ORDER BY us))"
               " DIV 1000").alias("gap_ms"),
    )
    gm = gaps.where(F.col("gap_ms").isNotNull()).groupBy(
        "event_type"
    ).agg(
        F.count("gap_ms").cast("long").alias("n_gaps"),
        F.sum("gap_ms").cast("long").alias("s1"),
        F.sum(F.col("gap_ms") * F.col("gap_ms")).cast("long").alias("s2"),
    )
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.timestamp_seconds(F.expr("us DIV 1000000"))).alias(
            "d"
        ),
    ).agg(F.count("*").cast("long").alias("c"))
    dm = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("c1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("c2"),
    )
    sig = F.sqrt(
        F.col("n_gaps").cast("double") * F.col("s2")
        - F.col("s1").cast("double") * F.col("s1")
    )
    s1d = F.col("s1").cast("double")
    fano = (
        (
            F.col("n_days").cast("double") * F.col("c2")
            - F.col("c1").cast("double") * F.col("c1")
        )
        / F.col("n_days").cast("double")
        / F.col("c1").cast("double")
    )
    return (
        gm.join(dm, "event_type")
        .select(
            "event_type",
            "n_gaps",
            F.expr("CAST(s1 DIV n_gaps AS BIGINT)").alias("mean_gap_ms"),
            roundn((sig - s1d) / (sig + s1d), 6).alias("burstiness"),
            roundn(fano, 6).alias("fano_daily"),
        )
        .orderBy("event_type")
    )
