"""Stats wave 2: rank-based hypothesis testing and survival analysis.

Two standing analytics workloads the stats tier
(`hypothesis_ttest`/`hypothesis_chisq`, plans/stats.py) didn't cover:

- **hypothesis_mannwhitney** — the Mann–Whitney U (Wilcoxon rank-sum)
  test: does the 'click' value distribution stochastically dominate
  'view'? The non-parametric sibling of `hypothesis_ttest` — the one to
  reach for when the metric is skewed (revenue-like metrics always
  are). Tie-corrected normal approximation plus the rank-biserial
  effect size;
- **survival_kaplan_meier** — the Kaplan–Meier product-limit estimator
  over time-to-first-purchase per user, with ADMINISTRATIVE (Type-I)
  censoring at a fixed 72-hour horizon: users who hadn't purchased
  within the horizon contribute risk-time but no event, exactly how a
  conversion/churn curve must count an unfinished observation window.

Exactness: both tests run on integer cents / integer hour grids, so tie
groups and event times are exact. Average ranks are multiples of 0.5
(exact in doubles); U, the tie term Σ(t³−t), and every (d, n) risk-set
count are exact integers. The only inexact steps — the z denominator's
sqrt and the KM product — are evaluated by the IDENTICAL expression
tree in both engines (the KM survival curve is a LEFT FOLD of the
per-step factors in ascending event-time order on both sides, so the
double rounding sequence is bit-identical) and rounded at projection.

100 TB scale:
- mannwhitney: one filtered scan → per-VALUE partial aggregate. The
  rank window runs over the distinct-value table, whose size is bounded
  by the metric's cents grid (the value DOMAIN), not the row count —
  the same boundedness argument as `histogram_values`.
- kaplan_meier: one scan → per-user aggregate (map-side combined) →
  per-HOUR aggregate; every window after that runs over the event-time
  table, bounded by the horizon (≤ 73 rows regardless of input size).
  The O(k²) prefix-product subqueries cost nothing at k ≤ 73.

Reference parity: the reference's curated tier feeds BI/analytics
consumers (readme:10, dags/pipeline_orchestration_dag.py:101-143);
these are the experiment-readout and conversion-curve queries such a
tier serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import fan_out, load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.operators.scale import global_rank
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: KM administrative-censoring horizon (hours since first event)
_HORIZON_H = 72


@query(
    "hypothesis_mannwhitney",
    oracle=f"""
    WITH s AS (
        SELECT CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT) AS v,
               (event_type = 'click') AS g1
        FROM events WHERE event_type IN ('click', 'view')),
    per_v AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt1
        FROM s GROUP BY v),
    ranked AS (
        SELECT v, cnt, cnt1,
               SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - cnt AS before,
               (SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - cnt) + (cnt + 1.0e0) / 2.0e0 AS avg_rank
        FROM per_v),
    agg AS (
        SELECT SUM(cnt1 * avg_rank) AS r1,
               CAST(SUM(cnt1) AS BIGINT) AS n1,
               CAST(SUM(cnt - cnt1) AS BIGINT) AS n2,
               CAST(SUM(cnt) AS BIGINT) AS n,
               SUM(cnt * cnt * cnt - cnt) AS tie_t,
               CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tied_values
        FROM ranked)
    SELECT n1, n2, n_tied_values,
           r1 - n1 * (n1 + 1.0e0) / 2.0e0 AS u1,
           {sql_roundn(
               "(r1 - n1 * (n1 + 1.0e0) / 2.0e0 - n1 * n2 / 2.0e0)"
               " / SQRT(n1 * 1.0e0 * n2 / 12.0e0"
               "        * ((n + 1.0e0)"
               "           - tie_t / (n * (n - 1.0e0))))", 4
           )} AS z_stat,
           {sql_roundn(
               "1.0e0 - 2.0e0 * (r1 - n1 * (n1 + 1.0e0) / 2.0e0)"
               " / (n1 * 1.0e0 * n2)", 4
           )} AS rank_biserial
    FROM agg
    """,
)
def hypothesis_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-extension — tie-corrected Mann–Whitney U ('click' vs
    'view' on value cents): average ranks from a cumulative count over
    the distinct-value table, U₁ = R₁ − n₁(n₁+1)/2, z with the
    Σ(t³−t) tie correction, rank-biserial r = 1 − 2U₁/(n₁n₂)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    s = ev.select(
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
        (F.col("event_type") == "click").alias("g1"),
    )
    per_v = s.groupBy("v").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("cnt1"),
    )
    # cumulative over the distinct-VALUE table: a continuous metric's
    # cents grid grows with the data until it saturates, so the
    # cumulative runs two-phase (global_rank: range exchange + __pid
    # offsets) instead of a bare Window.orderBy — sp_audit r5 measured
    # the old single-reducer exchange at 389→3310 rows across SFs
    ranked = global_rank(
        per_v, [F.col("v")], rank_col="__rn",
        cumsum_col="__cum", value_col="cnt",
    ).select(
        "cnt",
        "cnt1",
        (F.col("__cum") - F.col("cnt")).alias("before"),
    ).withColumn(
        "avg_rank", F.col("before") + (F.col("cnt") + F.lit(1.0)) / F.lit(2.0)
    )
    agg = ranked.agg(
        F.sum(F.col("cnt1") * F.col("avg_rank")).alias("r1"),
        F.sum("cnt1").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt1")).cast("long").alias("n2"),
        F.sum("cnt").cast("long").alias("n"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie_t"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_tied_values"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + F.lit(1.0)) / F.lit(2.0)
    mu = F.col("n1") * F.col("n2") / F.lit(2.0)
    sigma2 = (
        F.col("n1") * F.lit(1.0) * F.col("n2") / F.lit(12.0)
        * (
            (F.col("n") + F.lit(1.0))
            - F.col("tie_t") / (F.col("n") * (F.col("n") - F.lit(1.0)))
        )
    )
    return agg.select(
        "n1",
        "n2",
        "n_tied_values",
        u1.alias("u1"),
        roundn((u1 - mu) / F.sqrt(sigma2), 4).alias("z_stat"),
        roundn(
            F.lit(1.0) - F.lit(2.0) * u1 / (F.col("n1") * F.lit(1.0) * F.col("n2")),
            4,
        ).alias("rank_biserial"),
    )


@query(
    "survival_kaplan_meier",
    oracle=f"""
    WITH u AS (
        SELECT user_id, MIN(ts) AS f,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events GROUP BY 1),
    t AS (
        SELECT user_id,
               CASE WHEN fp IS NULL THEN NULL
                    ELSE CAST(FLOOR(date_diff('second', f, fp) / 3600.0e0)
                              AS BIGINT) END AS t_raw
        FROM u),
    obs AS (
        SELECT CASE WHEN t_raw IS NOT NULL AND t_raw <= {_HORIZON_H}
                    THEN t_raw ELSE {_HORIZON_H} END AS t,
               (t_raw IS NOT NULL AND t_raw <= {_HORIZON_H}) AS observed
        FROM t),
    by_t AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
                   AS d
        FROM obs GROUP BY 1),
    risk AS (
        SELECT t, d,
               SUM(n_all) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS n_risk
        FROM by_t),
    km AS (
        SELECT t, d, CAST(n_risk AS BIGINT) AS n_risk,
               1.0e0 - d * 1.0e0 / n_risk AS factor
        FROM risk WHERE d > 0)
    SELECT t AS t_hours, n_risk, d AS n_events,
           {sql_roundn(
               "list_reduce(list_prepend(CAST(1.0 AS DOUBLE),"
               " (SELECT list(k2.factor ORDER BY k2.t) FROM km k2"
               "  WHERE k2.t <= km.t)), (a, b) -> a * b)", 6
           )} AS s_km
    FROM km ORDER BY t
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-extension — Kaplan–Meier product-limit curve of
    time-to-first-purchase (hours since the user's first event),
    administratively censored at 72 h.

    S(t) = Π_{{t_i ≤ t}} (1 − dᵢ/nᵢ) evaluated as a LEFT FOLD over the
    ascending event-time factors — `collect_list` over a running
    rows-frame window preserves frame order, and the DuckDB oracle
    folds the identical ordered list, so both engines execute the same
    IEEE multiply sequence. Risk sets come from a descending cumulative
    sum (n_t = users with t_u ≥ t; same-time censorings stay at risk,
    the standard KM convention)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("f"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "fp"
        ),
    )
    sec_diff = F.unix_timestamp("fp") - F.unix_timestamp("f")
    t_raw = F.floor(sec_diff / F.lit(3600.0)).cast("long")
    obs = u.select(
        F.when(
            F.col("fp").isNotNull() & (t_raw <= _HORIZON_H), t_raw
        )
        .otherwise(F.lit(_HORIZON_H))
        .alias("t"),
        (F.col("fp").isNotNull() & (t_raw <= _HORIZON_H)).alias("observed"),
    )
    by_t = obs.groupBy("t").agg(
        F.count("*").alias("n_all"),
        F.sum(F.when(F.col("observed"), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    # windows over the EVENT-TIME table — ≤ horizon+1 rows at any scale
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = by_t.select(
        "t", "d", F.sum("n_all").over(w_desc).cast("long").alias("n_risk")
    )
    km = risk.filter(F.col("d") > 0).withColumn(
        "factor", F.lit(1.0) - F.col("d") * F.lit(1.0) / F.col("n_risk")
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    s_km = F.aggregate(
        F.collect_list("factor").over(w_asc),
        F.lit(1.0),
        lambda a, x: a * x,
    )
    return km.select(
        F.col("t").alias("t_hours"),
        "n_risk",
        F.col("d").alias("n_events"),
        roundn(s_km, 6).alias("s_km"),
    ).orderBy("t_hours")


# ---------------------------------------------------------------------------
# distributed Gram matrix over the embedding column (r3i wave)
# ---------------------------------------------------------------------------

@query(
    "embedding_gram_matrix",
    oracle="""
    WITH q AS (
        SELECT list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0e0 + 0.5e0)
                             AS BIGINT)) AS ql
        FROM embeddings),
    pairs AS (
        SELECT UNNEST(flatten(list_transform(range(1, 65),
                   i -> list_transform(range(i, 65),
                       j -> struct_pack(i := i, j := j,
                                        p := ql[i] * ql[j]))))) AS u
        FROM q)
    SELECT CAST(u.i AS INT) AS i, CAST(u.j AS INT) AS j,
           CAST(SUM(u.p) AS BIGINT) AS gram_q,
           CAST(SUM(u.p) AS DOUBLE) / 1000000.0e0 AS gram
    FROM pairs GROUP BY u.i, u.j
    ORDER BY i, j
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix XᵀX over the 64-dim embedding column
    (upper triangle, 2080 cells) — the one-pass building block behind
    PCA, covariance, linear probes, and whitening at corpus scale.

    Embeddings are QUANTIZED to milli-units first (float32→double is
    exact, the 1e-3 grid is the fixture's resolution), so every cell is
    an exact int64 sum — order-independent, engine-portable — and the
    double view divides that exact integer once at projection. This is
    the same exact-grid discipline the money pipeline uses for cents.

    100 TB: NO self-join — each row LATERALLY emits its own 2080
    products (flatten of a triangular transform), so the only exchange
    is the final 2080-cell hash aggregate with map-side partials;
    the classic outer-product-partial-sum pattern (each partition
    computes a partial Gram, partials add). The numpy/`mapInPandas`
    BLAS formulation is the constant-factor upgrade at frontier scale;
    this relational form is the oracle-pairable reference."""
    emb = load_table(spark, sf_dir, "embeddings")
    ql = F.expr(
        "transform(embedding,"
        " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0D + 0.5D) AS BIGINT))"
    )
    # 2080 lateral products per row: spread the narrow vector column
    # across cores before the explode (no-op at production splits)
    pairs = fan_out(emb.select(ql.alias("ql"))).select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, 64),"
                " i -> transform(sequence(i, 64),"
                " j -> named_struct('i', i, 'j', j,"
                " 'p', element_at(ql, i) * element_at(ql, j)))))"
            )
        ).alias("u")
    )
    return (
        pairs.groupBy(
            F.col("u.i").cast("int").alias("i"),
            F.col("u.j").cast("int").alias("j"),
        )
        .agg(F.sum("u.p").alias("gram_q"))
        .select(
            "i",
            "j",
            F.col("gram_q").cast("long").alias("gram_q"),
            (F.col("gram_q").cast("double") / F.lit(1000000.0)).alias("gram"),
        )
        .orderBy("i", "j")
    )


# ---------------------------------------------------------------------------
# power iteration on the Gram matrix (r3j wave)
# ---------------------------------------------------------------------------

_GRAM_SQL = """
    q AS (
        SELECT list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0e0 + 0.5e0)
                             AS BIGINT)) AS ql
        FROM embeddings),
    pairs AS (
        SELECT UNNEST(flatten(list_transform(range(1, 65),
                   i -> list_transform(range(i, 65),
                       j -> struct_pack(i := i, j := j,
                                        p := ql[i] * ql[j]))))) AS u
        FROM q),
    gup AS (
        SELECT CAST(u.i AS INT) AS i, CAST(u.j AS INT) AS j,
               CAST(SUM(u.p) AS DOUBLE) / 1000000.0e0 AS g
        FROM pairs GROUP BY u.i, u.j),
    gfull AS (
        SELECT i, j, g FROM gup
        UNION ALL
        SELECT j AS i, i AS j, g FROM gup WHERE i <> j)
"""


@query(
    "embedding_power_iteration",
    oracle=f"""
    WITH {_GRAM_SQL},
    w1 AS (
        SELECT gi.i,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   (SELECT list(g.g * 0.125e0 ORDER BY g.j)
                    FROM gfull g WHERE g.i = gi.i)),
                   (a, b) -> a + b) AS w
        FROM (SELECT DISTINCT i FROM gfull) gi),
    n1 AS (
        SELECT SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   (SELECT list(w ORDER BY i) FROM w1)),
                   (a, b) -> a + b * b)) AS nrm),
    v1 AS (SELECT i, w / (SELECT nrm FROM n1) AS v FROM w1),
    w2 AS (
        SELECT gi.i,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   (SELECT list(g.g * v1.v ORDER BY g.j)
                    FROM gfull g JOIN v1 ON v1.i = g.j
                    WHERE g.i = gi.i)),
                   (a, b) -> a + b) AS w
        FROM (SELECT DISTINCT i FROM gfull) gi),
    fin AS (
        SELECT w2.i, w2.w, v1.v AS v1v FROM w2 JOIN v1 ON v1.i = w2.i),
    s AS (
        SELECT SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   (SELECT list(w ORDER BY i) FROM fin)),
                   (a, b) -> a + b * b)) AS nrm2,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   (SELECT list(v1v * w ORDER BY i) FROM fin)),
                   (a, b) -> a + b) AS lam)
    SELECT fin.i,
           {sql_roundn("fin.w / s.nrm2", 6)} AS eigvec,
           {sql_roundn("s.lam", 4)} AS lambda_est
    FROM fin, s ORDER BY fin.i
    """,
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled power-method iterations on the embedding Gram
    matrix: v₀ = uniform (1/8 each — exact dyadic, unit norm),
    w = G·v via per-component folds, normalize, repeat; emits the
    64-component eigenvector estimate and the Rayleigh quotient
    v₁·(G·v₁) — the top principal direction, the PCA/spectral step
    `embedding_gram_matrix` exists to feed (and kmeans_iterate's
    unrolled-iteration discipline applied to linear algebra).

    Determinism: matrix-vector products and norms are ORDERED LEFT
    FOLDS (sort_array / list(ORDER BY)) — never a float SUM whose
    addend order the engine chooses — so both engines execute the
    identical IEEE sequence; the Gram input is exact quantized int64
    scaled once. Scalar normalizers ride unpartitioned WINDOWS over
    the 64-row state (the 592ba63 rule), not scalar cross joins.

    100 TB: G is the 4096-cell broadcast-sized aggregate of one corpus
    pass; every iteration is component-domain work (64 rows), free at
    any data scale. More iterations = more unrolled stages, exactly
    like kmeans_iterate."""
    emb = load_table(spark, sf_dir, "embeddings")
    ql = F.expr(
        "transform(embedding,"
        " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0D + 0.5D) AS BIGINT))"
    )
    # 2080 lateral products per row: spread the narrow vector column
    # across cores before the explode (no-op at production splits)
    pairs = fan_out(emb.select(ql.alias("ql"))).select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, 64),"
                " i -> transform(sequence(i, 64),"
                " j -> named_struct('i', i, 'j', j,"
                " 'p', element_at(ql, i) * element_at(ql, j)))))"
            )
        ).alias("u")
    )
    gup = (
        pairs.groupBy(
            F.col("u.i").cast("int").alias("i"),
            F.col("u.j").cast("int").alias("j"),
        )
        .agg((F.sum("u.p").cast("double") / F.lit(1000000.0)).alias("g"))
    )
    gup = gup.localCheckpoint(eager=False)  # both triangle copies + 2 matvecs
    gfull = gup.unionAll(
        gup.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "g"
        )
    )
    gfull = gfull.localCheckpoint(eager=False)

    def matvec_fold(term_col):
        """Σ over j in ascending order of the per-cell term column."""
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct(F.col("j"), term_col.alias("t")))),
            F.lit(0.0),
            lambda a, x: a + x.getField("t"),
        )

    w1 = gfull.groupBy("i").agg(
        matvec_fold(F.col("g") * F.lit(0.125)).alias("w")
    )
    wfull = Window.partitionBy()
    nrm1 = F.sqrt(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("i"), F.col("w"))).over(wfull)
            ),
            F.lit(0.0),
            lambda a, x: a + x.getField("w") * x.getField("w"),
        )
    )
    v1 = w1.select("i", (F.col("w") / nrm1).alias("v"))
    w2 = (
        gfull.join(
            F.broadcast(v1.select(F.col("i").alias("j"), "v")), "j"
        )
        .groupBy("i")
        .agg(matvec_fold(F.col("g") * F.col("v")).alias("w"))
    )
    fin = w2.join(F.broadcast(v1.withColumnRenamed("v", "v1v")), "i")
    nrm2 = F.sqrt(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("i"), F.col("w"))).over(wfull)
            ),
            F.lit(0.0),
            lambda a, x: a + x.getField("w") * x.getField("w"),
        )
    )
    lam = F.aggregate(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("i"), (F.col("v1v") * F.col("w")).alias("t"))
            ).over(wfull)
        ),
        F.lit(0.0),
        lambda a, x: a + x.getField("t"),
    )
    return fin.select(
        "i",
        roundn(F.col("w") / nrm2, 6).alias("eigvec"),
        roundn(lam, 4).alias("lambda_est"),
    ).orderBy("i")


# ---------------------------------------------------------------------------
# Spearman rank correlation (r3p wave)
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = f"""
WITH per_cust AS (
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS x,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                         AS BIGINT)) AS BIGINT) AS y
    FROM orders GROUP BY 1),
vx AS (
    SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM per_cust GROUP BY 1),
rx AS (
    SELECT x,
           2 * (SUM(cnt) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
               + cnt + 1 AS sx,
           cnt AS cnt_x
    FROM vx),
vy AS (
    SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM per_cust GROUP BY 1),
ry AS (
    SELECT y,
           2 * (SUM(cnt) OVER (ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
               + cnt + 1 AS sy
    FROM vy),
pairs AS (
    SELECT rx.sx, ry.sy
    FROM per_cust p JOIN rx ON rx.x = p.x JOIN ry ON ry.y = p.y),
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(sx) AS BIGINT) AS s_x,
           CAST(SUM(sy) AS BIGINT) AS s_y,
           CAST(SUM(sx * sx) AS BIGINT) AS s_xx,
           CAST(SUM(sy * sy) AS BIGINT) AS s_yy,
           CAST(SUM(sx * sy) AS BIGINT) AS s_xy
    FROM pairs),
ties AS (
    SELECT CAST(SUM(CASE WHEN cnt_x > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tied_x
    FROM rx)
SELECT sums.n, ties.n_tied_x,
       {sql_roundn(
           "(1.0e0 * n * s_xy - 1.0e0 * s_x * s_y)"
           " / (SQRT(1.0e0 * n * s_xx - 1.0e0 * s_x * s_x)"
           "    * SQRT(1.0e0 * n * s_yy - 1.0e0 * s_y * s_y))", 6
       )} AS rho
FROM sums, ties
"""


@query("hypothesis_spearman", oracle=_SPEARMAN_ORACLE)
def hypothesis_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-extension — tie-corrected Spearman rank correlation
    between per-customer order FREQUENCY and lifetime SPEND (exact
    cents): Pearson over average ranks, the correct form under ties
    (frequency is massively tied). The monotone-association readout
    beside hypothesis_mannwhitney's two-sample comparison.

    Exactness: average ranks are multiples of 0.5, so DOUBLED ranks
    s = 2·rank_min + (t−1) + 1 = 2·cum_before + t + 1 are exact
    BIGINTs straight out of the cumulative count over the per-VALUE
    table — no float ranks anywhere; doubling cancels in the Pearson
    ratio. All five sums are exact int64 (bounded by 4n³ — safe
    through n ≈ 10⁶ customers); only the final ratio runs in doubles,
    as ONE identical expression tree on both engines.

    100 TB: rank cumulatives run two-phase over the two distinct-VALUE
    tables (spend values are near one-per-customer — entity-sized, so
    global_rank's range-exchange form, not a bare global window); the
    tiny frequency-rank table broadcasts, the spend-rank table
    equi-joins on the shuffle; the sums are one map-side combined
    aggregate. Nothing global-sorts or driver-ships the raw rows."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("x"), F.sum(cents).alias("y")
    )
    per_cust = per_cust.localCheckpoint(eager=False)  # 3 consumers

    def doubled_ranks(col):
        # spend cents are near-unique per customer, so this distinct-
        # VALUE table is entity-sized — cumulate two-phase
        # (sp_audit r5: 150→1500 rows through the old bare window)
        pv = per_cust.groupBy(col).agg(F.count("*").alias("cnt"))
        return global_rank(
            pv, [F.col(col)], rank_col="__rn",
            cumsum_col="__cum", value_col="cnt",
        ).select(
            col,
            (
                2 * (F.col("__cum") - F.col("cnt"))
                + F.col("cnt")
                + 1
            ).alias(f"s_{col}"),
            F.col("cnt").alias(f"cnt_{col}"),
        )

    rx = doubled_ranks("x").localCheckpoint(eager=False)  # ranks + ties
    ry = doubled_ranks("y")
    # rx (distinct order FREQUENCIES — a handful of values) broadcasts;
    # ry (distinct spends — near one per customer) is entity-sized and
    # must equi-join on the shuffle, never ride a broadcast hint
    pairs = per_cust.join(F.broadcast(rx.select("x", "s_x")), "x").join(
        ry.select("y", "s_y"), "y"
    )
    sums = pairs.agg(
        F.count("*").alias("n"),
        F.sum("s_x").alias("sum_x"),
        F.sum("s_y").alias("sum_y"),
        F.sum(F.col("s_x") * F.col("s_x")).alias("s_xx"),
        F.sum(F.col("s_y") * F.col("s_y")).alias("s_yy"),
        F.sum(F.col("s_x") * F.col("s_y")).alias("s_xy"),
    )
    ties = rx.agg(
        F.sum(F.when(F.col("cnt_x") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_tied_x")
    )
    one = F.lit(1.0)
    rho = (
        one * F.col("n") * F.col("s_xy") - one * F.col("sum_x") * F.col("sum_y")
    ) / (
        F.sqrt(one * F.col("n") * F.col("s_xx")
               - one * F.col("sum_x") * F.col("sum_x"))
        * F.sqrt(one * F.col("n") * F.col("s_yy")
                 - one * F.col("sum_y") * F.col("sum_y"))
    )
    return sums.crossJoin(F.broadcast(ties)).select(
        "n", "n_tied_x", roundn(rho, 6).alias("rho")
    )


# ---------------------------------------------------------------------------
# two-sample Kolmogorov–Smirnov (r3p wave)
# ---------------------------------------------------------------------------

#: KS critical coefficient c(α) at α=0.05 (two-sided asymptotic)
_KS_C05 = 1.358


def _ks_oracle() -> str:
    return f"""
    WITH s AS (
        SELECT CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT) AS v,
               (event_type = 'click') AS g1
        FROM events WHERE event_type IN ('click', 'view')),
    per_v AS (
        SELECT v,
               CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
        FROM s GROUP BY v),
    cum AS (
        SELECT SUM(c1) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k1,
               SUM(c2) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k2
        FROM per_v),
    tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
        FROM per_v),
    dm AS (
        SELECT CAST(MAX(ABS(k1 * tot.n2 - k2 * tot.n1)) AS BIGINT) AS d_num
        FROM cum, tot)
    SELECT tot.n1, tot.n2, dm.d_num,
           {sql_roundn("1.0e0 * d_num / (1.0e0 * n1 * n2)", 6)} AS ks_d,
           {sql_roundn(
               "1.0e0 * d_num / (1.0e0 * n1 * n2)"
               " * SQRT(1.0e0 * n1 * n2 / (1.0e0 * n1 + n2))", 4
           )} AS ks_scaled,
           (1.0e0 * d_num / (1.0e0 * n1 * n2)
            * SQRT(1.0e0 * n1 * n2 / (1.0e0 * n1 + n2))
            > {_KS_C05}e0) AS reject_05
    FROM dm, tot
    """


@query("hypothesis_ks2", oracle=_ks_oracle())
def hypothesis_ks2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-extension — two-sample Kolmogorov–Smirnov test ('click'
    vs 'view' value distributions, exact cents grid): D = max pointwise
    ECDF gap over the pooled distinct values, the distribution-SHAPE
    test beside hypothesis_mannwhitney's location shift (KS also sees
    variance/shape changes a rank-sum misses — the A/B guardrail for
    "same conversion value distribution?").

    Exactness: the gap is carried as the exact INTEGER cross-product
    |k1·n2 − k2·n1| (D's numerator over the common denominator n1·n2)
    — the max is decided in integer space, no float comparisons. Only
    the final D, the √(n1n2/(n1+n2)) scaling, and the α=0.05 verdict
    against the asymptotic critical value {_KS_C05} run in doubles, as
    identical expression trees on both engines (the MW z-stat
    discipline).

    100 TB: one filtered scan → per-VALUE aggregate; both ECDF
    cumulatives run in ONE two-phase global_rank pass (the distinct
    cents grid grows with data until saturation — never a single
    reducer), totals ride a one-row broadcast."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    s = ev.select(
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
        (F.col("event_type") == "click").alias("g1"),
    )
    per_v = s.groupBy("v").agg(
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("g1"), 0).otherwise(1)).cast("long").alias("c2"),
    )
    per_v = per_v.localCheckpoint(eager=False)  # cum + totals consumers
    # BOTH group ECDFs cumulate in one two-phase pass (global_rank's
    # multi-cumsum form) — the pooled distinct-value grid grows with
    # the data (sp_audit r5: 389→3310 rows through the old bare
    # Window.orderBy), so no single reducer may carry it
    cum = global_rank(
        per_v, [F.col("v")], rank_col="__rn",
        cumsums=[("c1", "k1"), ("c2", "k2")],
    ).select("k1", "k2")
    tot = per_v.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    dm = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(F.col("k1") * F.col("n2") - F.col("k2") * F.col("n1"))
        ).alias("d_num")
    )
    one = F.lit(1.0)
    d = one * F.col("d_num") / (one * F.col("n1") * F.col("n2"))
    scaled = d * F.sqrt(
        one * F.col("n1") * F.col("n2") / (one * F.col("n1") + F.col("n2"))
    )
    return dm.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        "d_num",
        roundn(d, 6).alias("ks_d"),
        roundn(scaled, 4).alias("ks_scaled"),
        (scaled > F.lit(_KS_C05)).alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# mergeable moments — Chan partial-aggregate combine (r3w wave)
# ---------------------------------------------------------------------------

_MOM_ORACLE = f"""
WITH s AS (
    SELECT c_nationkey AS shard,
           CAST(FLOOR(c_acctbal * 100.0e0 + 0.5e0) AS BIGINT) AS v
    FROM customer),
p AS (
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS BIGINT) AS sx,
           CAST(SUM(v * v) AS BIGINT) AS sx2
    FROM s GROUP BY shard),
pm AS (
    SELECT shard, n,
           1.0e0 * sx / n AS mean,
           1.0e0 * sx2 - (1.0e0 * sx) * sx / n AS m2
    FROM p),
fold AS (
    SELECT list_reduce(
        list_prepend(
            list_value(0.0e0, 0.0e0, 0.0e0),
            (SELECT list(list_value(1.0e0 * n, mean, m2) ORDER BY shard)
             FROM pm)),
        (acc, e) -> CASE WHEN acc[1] = 0.0e0 THEN e
            ELSE list_value(
                acc[1] + e[1],
                acc[2] + (e[2] - acc[2]) * e[1] / (acc[1] + e[1]),
                acc[3] + e[3]
                    + (e[2] - acc[2]) * (e[2] - acc[2]) * acc[1] * e[1]
                      / (acc[1] + e[1]))
            END) AS st
    FROM (SELECT 1)),
direct AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_shards,
           1.0e0 * SUM(sx) / SUM(n) AS mean_d,
           (1.0e0 * SUM(sx2) - (1.0e0 * SUM(sx)) * SUM(sx) / SUM(n))
               / SUM(n) AS var_d
    FROM p)
SELECT d.n_total, d.n_shards,
       {sql_roundn("f.st[2]", 6)} AS mean_merged,
       {sql_roundn("f.st[3] / d.n_total", 4)} AS var_merged,
       {sql_roundn("d.var_d", 4)} AS var_direct,
       {sql_roundn("ABS(f.st[3] / d.n_total - d.var_d)", 6)} AS abs_drift
FROM direct d, fold f
"""


@query("stats_moments_merge", oracle=_MOM_ORACLE)
def stats_moments_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE MOMENTS — the distributed-aggregation law itself:
    per-nation partials (n, mean, M2) over customer balances combine
    pairwise with Chan's parallel update (mean += δ·n_B/n_AB;
    M2_AB = M2_A + M2_B + δ²·n_A·n_B/n_AB) in an ordered fold over the
    25 shards, and the merged variance is reported BESIDE the direct
    exact-integer-sums variance with their |drift| — the algebraic
    equality every map-side combine / sketch rollup / multi-datacenter
    rollup silently relies on, here made driver-visible (drift ≈ 0 at
    this scale; Chan's form exists because the naive Σx²−(Σx)²/n
    cancels catastrophically when mean ≫ std).

    Exactness discipline: per-shard n/Σx/Σx² are exact int64 (cents
    bounded so Σx² < 2⁶³ through sf 1); mean/M2 and the fold run in
    doubles as IDENTICAL expression trees with list-state accumulators
    on both engines (the ts_holt discipline — DuckDB struct_pack
    accumulators mutate mid-expression, so state rides a LIST), folded
    in shard-key order for a bit-identical IEEE sequence.

    100 TB: partials are one map-side-combined groupBy; the fold input
    is shard-count-sized (25 rows). This IS how var/std distribute —
    the key documents and verifies the mechanism rather than hiding it
    inside agg_moments' built-ins."""
    c = load_table(spark, sf_dir, "customer")
    s = c.select(
        F.col("c_nationkey").alias("shard"),
        F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    p = s.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sx"),
        F.sum(F.col("v") * F.col("v")).alias("sx2"),
    )
    p = p.localCheckpoint(eager=False)  # fold + direct consumers
    one = F.lit(1.0)
    pm = p.select(
        "shard",
        (one * F.col("n")).alias("n_d"),
        (one * F.col("sx") / F.col("n")).alias("mean"),
        (
            one * F.col("sx2")
            - (one * F.col("sx")) * F.col("sx") / F.col("n")
        ).alias("m2"),
    )
    parr = pm.agg(
        F.array_sort(
            F.collect_list(F.struct("shard", "n_d", "mean", "m2"))
        ).alias("arr")
    )
    st = F.aggregate(
        F.transform(
            F.col("arr"),
            lambda x: F.array(
                x.getField("n_d"), x.getField("mean"), x.getField("m2")
            ),
        ),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)),
        lambda acc, e: F.when(acc.getItem(0) == 0.0, e).otherwise(
            F.array(
                acc.getItem(0) + e.getItem(0),
                acc.getItem(1)
                + (e.getItem(1) - acc.getItem(1))
                * e.getItem(0)
                / (acc.getItem(0) + e.getItem(0)),
                acc.getItem(2)
                + e.getItem(2)
                + (e.getItem(1) - acc.getItem(1))
                * (e.getItem(1) - acc.getItem(1))
                * acc.getItem(0)
                * e.getItem(0)
                / (acc.getItem(0) + e.getItem(0)),
            )
        ),
    )
    fold = parr.select(st.alias("st"))
    direct = p.agg(
        F.sum("n").alias("n_total"),
        F.count("*").alias("n_shards"),
        (one * F.sum("sx") / F.sum("n")).alias("mean_d"),
        (
            (
                one * F.sum("sx2")
                - (one * F.sum("sx")) * F.sum("sx") / F.sum("n")
            )
            / F.sum("n")
        ).alias("var_d"),
    )
    return direct.crossJoin(F.broadcast(fold)).select(
        "n_total",
        "n_shards",
        roundn(F.col("st").getItem(1), 6).alias("mean_merged"),
        roundn(F.col("st").getItem(2) / F.col("n_total"), 4).alias(
            "var_merged"
        ),
        roundn(F.col("var_d"), 4).alias("var_direct"),
        roundn(
            F.abs(F.col("st").getItem(2) / F.col("n_total") - F.col("var_d")),
            6,
        ).alias("abs_drift"),
    )


# ---------------------------------------------------------------------------
# Wilson score intervals (r4g wave)
# ---------------------------------------------------------------------------

#: z for the 95% two-sided interval, shared 6-dp literal (qnorm is libm)
_WILSON_Z = 1.959964


def _wilson_oracle() -> str:
    z = _WILSON_Z
    return f"""
    WITH g AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM orders GROUP BY 1)
    SELECT o_orderpriority, n, k,
           {sql_roundn("k * 1.0e0 / n", 6)} AS rate,
           {sql_roundn(
               f"(k * 1.0e0 / n + {z}e0 * {z}e0 / (2.0e0 * n)"
               f" - {z}e0 * SQRT((k * 1.0e0 / n) * (1.0e0 - k * 1.0e0 / n)"
               f"   / n + {z}e0 * {z}e0 / (4.0e0 * n * n)))"
               f" / (1.0e0 + {z}e0 * {z}e0 / n)", 6
           )} AS ci_lo,
           {sql_roundn(
               f"(k * 1.0e0 / n + {z}e0 * {z}e0 / (2.0e0 * n)"
               f" + {z}e0 * SQRT((k * 1.0e0 / n) * (1.0e0 - k * 1.0e0 / n)"
               f"   / n + {z}e0 * {z}e0 / (4.0e0 * n * n)))"
               f" / (1.0e0 + {z}e0 * {z}e0 / n)", 6
           )} AS ci_hi
    FROM g ORDER BY o_orderpriority
    """


@query("stats_wilson_interval", oracle=_wilson_oracle())
def stats_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON score 95% confidence interval for the fulfilled-order
    rate per priority class — the proportion CI that stays inside
    [0, 1] and behaves at k = 0 or k = n, where the naive Wald
    interval p ± z√(p(1−p)/n) collapses (pinned by test: k=0 still
    yields ci_hi > 0). The dashboard-rate companion to
    hypothesis_chisq's homogeneity test: chisq says WHETHER classes
    differ, the intervals say by how much with what certainty.

    Exactness: n and k are exact ints; z is a shared 6-dp literal
    (the Benford log-literal discipline — qnorm is libm); the interval
    is one identical expression tree per bound, 6-dp floor-rounded.

    100 TB: one map-side-combined aggregate; the interval math is
    per-group scalar arithmetic on a class-cardinality-sized table."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    one = F.lit(1.0)
    z = F.lit(_WILSON_Z)
    p = F.col("k") * one / F.col("n")
    z2n = z * z / F.col("n")
    center = p + z * z / (F.lit(2.0) * F.col("n"))
    halfw = z * F.sqrt(
        p * (one - p) / F.col("n")
        + z * z / (F.lit(4.0) * F.col("n") * F.col("n"))
    )
    denom = one + z2n
    return g.select(
        "o_orderpriority",
        "n",
        "k",
        roundn(p, 6).alias("rate"),
        roundn((center - halfw) / denom, 6).alias("ci_lo"),
        roundn((center + halfw) / denom, 6).alias("ci_hi"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# one-way ANOVA (r4j wave)
# ---------------------------------------------------------------------------

#: F critical value at alpha=0.05 for df1=6, df2=inf — shared literal
#: (the quantile function is libm; day counts make df2 effectively large)
_ANOVA_FCRIT = 2.099070


def _anova_oracle() -> str:
    return f"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1),
    g AS (
        SELECT CAST(dayofweek(day) AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS BIGINT) AS s2
        FROM d GROUP BY 1),
    t AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(s) AS BIGINT) AS st,
               CAST(SUM(s2) AS BIGINT) AS s2t,
               SUM(CAST(FLOOR(s * 1.0e0 * s / n / 10000.0e0 + 0.5e0)
                        AS BIGINT)) * 10000.0e0 AS sq
        FROM g)
    SELECT nn AS n_days, k AS n_groups,
           {sql_roundn(
               "((sq - st * 1.0e0 * st / nn) / (k - 1))"
               " / NULLIF(GREATEST(s2t - sq, 0.0e0) / (nn - k), 0.0e0)", 4
           )} AS f_stat,
           COALESCE(((sq - st * 1.0e0 * st / nn) / (k - 1))
               / NULLIF(GREATEST(s2t - sq, 0.0e0) / (nn - k), 0.0e0)
                   > {_ANOVA_FCRIT}e0,
               (sq - st * 1.0e0 * st / nn) / (k - 1) > 0.0e0) AS reject_05
    FROM t
    """


@query("hypothesis_anova", oracle=_anova_oracle())
def hypothesis_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA across the seven weekday groups of daily revenue —
    the k-group mean comparison that completes the hypothesis tier
    (chisq: categorical; t/MW: two groups; KS: shape; Spearman:
    association; ANOVA: do ANY of k group means differ). F =
    (SSB/(k−1)) / (SSW/(N−k)) with both sums of squares assembled from
    per-group exact-int (n, Σx, Σx²): SSB = Σ S_g²/n_g − S²/N, SSW =
    ΣΣx² − Σ S_g²/n_g — the one-pass textbook decomposition, no
    per-row mean subtraction.

    Exactness: all per-group sums exact int64 (day-grain cents); the
    S_g²/n_g terms and the final F run as identical trees (the MW
    z-stat discipline), and the cross-group Σ S_g²/n_g is QUANTIZED to
    integer 10⁴-cent² units per group BEFORE summation so the 7-term
    sum is order-free (the μ-quantization discipline — a raw float sum
    over groups would be partition-order-dependent); the α=0.05
    verdict compares against a shared F-crit
    literal (quantiles are libm; df2 ≈ N−7 is effectively ∞ at any
    realistic day count, noted).

    100 TB: one day-grain aggregate, one 7-row group table, one scalar
    readout — nothing scales with row count past the first combine."""
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
    g = d.groupBy(F.dayofweek("day").cast("long").alias("dow")).agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    one = F.lit(1.0)
    t = g.agg(
        F.sum("n").alias("nn"),
        F.count("*").alias("k"),
        F.sum("s").alias("st"),
        F.sum("s2").alias("s2t"),
        (
            F.sum(
                F.floor(
                    F.col("s") * one * F.col("s") / F.col("n")
                    / F.lit(10000.0)
                    + F.lit(0.5)
                ).cast("long")
            )
            * F.lit(10000.0)
        ).alias("sq"),
    )
    ssb = (F.col("sq") - F.col("st") * one * F.col("st") / F.col("nn")) / (
        F.col("k") - 1
    )
    # GREATEST clamp: sq is quantized per group, so in a near-zero-SSW
    # dataset s2t − sq can land a hair NEGATIVE — without the clamp that
    # slips past NULLIF(·, 0) and yields a negative F / false verdict
    ssw = F.greatest(F.col("s2t") - F.col("sq"), F.lit(0.0)) / (
        F.col("nn") - F.col("k")
    )
    # a zero within-group variance is the degenerate boundary: F is
    # undefined (NULL); the verdict then falls back to "any between-
    # group variance at all" — identical COALESCE on both engines
    fstat = ssb / F.nullif(ssw, F.lit(0.0))
    return t.select(
        F.col("nn").alias("n_days"),
        F.col("k").alias("n_groups"),
        roundn(fstat, 4).alias("f_stat"),
        F.coalesce(
            fstat > F.lit(_ANOVA_FCRIT), ssb > F.lit(0.0)
        ).alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b (r6r wave) — the rank-correlation twin of Spearman
# ---------------------------------------------------------------------------

_KENDALL_ORACLE = f"""
WITH per_nation AS (
    SELECT c.c_nationkey AS nk,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS x,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0e0 + 0.5e0)
                         AS BIGINT)) AS BIGINT) AS y
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1),
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
    FROM per_nation a JOIN per_nation b ON a.nk < b.nk)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM per_nation) AS n,
       c AS concordant, d AS discordant, tx AS ties_x, ty AS ties_y,
       {{tau}} AS tau_b
FROM pairs
""".format(tau=(
    "FLOOR((c - d) * 1.0e0"
    " / sqrt(CAST((n0 - tx - txy) AS DOUBLE) * (n0 - ty - txy))"
    " * 1000000.0e0 + 0.5e0) / 1000000.0e0"
))


@query("hypothesis_kendall", oracle=_KENDALL_ORACLE)
def hypothesis_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier — KENDALL'S τ-b, the rank-correlation twin of
    hypothesis_spearman with a different robustness trade: τ counts
    CONCORDANT minus DISCORDANT pairs (probability interpretation:
    P(agree) − P(disagree)), with the τ-b tie correction in both
    margins — the estimator of choice when the n is small and every
    pair is interpretable, here over the 25-nation (customer count,
    revenue) profile. Spearman squares rank gaps (one wild rank moves
    it a lot); τ's pair counting moves by at most 2/n(n−1) per swap.

    Exactness: concordant/discordant/tie counts are exact integers
    from a dimension-bounded pair join; τ-b's one sqrt + division is a
    single identical double expression rounded at 6 dp.

    100 TB: the per-nation profile is one fact-table aggregate
    (map-side combine); the pair join is |nations|² = 300 pairs —
    fixed-dimension state forever. For entity-grain τ at scale the
    documented swap is the O(n log n) merge-sort inversion count
    (Knight's algorithm) over a rank-bucketed two-phase layout."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_nation = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count_distinct("c_custkey").cast("long").alias("x"),
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                .cast("bigint")
            ).cast("long").alias("y"),
        )
    )
    per_nation = per_nation.localCheckpoint(eager=False)  # pair sides + n
    a, b = per_nation.alias("a"), per_nation.alias("b")
    ax, bx = F.col("a.x"), F.col("b.x")
    ay, by = F.col("a.y"), F.col("b.y")
    pairs = a.join(F.broadcast(b), F.col("a.nk") < F.col("b.nk")).agg(
        F.sum(
            F.when(((ax < bx) & (ay < by)) | ((ax > bx) & (ay > by)), 1)
            .otherwise(0)
        ).cast("long").alias("c"),
        F.sum(
            F.when(((ax < bx) & (ay > by)) | ((ax > bx) & (ay < by)), 1)
            .otherwise(0)
        ).cast("long").alias("d"),
        F.sum(F.when((ax == bx) & (ay != by), 1).otherwise(0))
        .cast("long").alias("tx"),
        F.sum(F.when((ay == by) & (ax != bx), 1).otherwise(0))
        .cast("long").alias("ty"),
        F.sum(F.when((ax == bx) & (ay == by), 1).otherwise(0))
        .cast("long").alias("txy"),
        F.count("*").cast("long").alias("n0"),
    )
    nrow = per_nation.agg(F.count("*").cast("long").alias("n"))
    tau = F.floor(
        (F.col("c") - F.col("d"))
        * F.lit(1.0)
        / F.sqrt(
            (F.col("n0") - F.col("tx") - F.col("txy")).cast("double")
            * (F.col("n0") - F.col("ty") - F.col("txy"))
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    return pairs.crossJoin(F.broadcast(nrow)).select(
        "n",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("tx").alias("ties_x"),
        F.col("ty").alias("ties_y"),
        tau.alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# trimmed mean (r6r wave) — the robust location aggregate
# ---------------------------------------------------------------------------

#: trim fraction numerator/denominator (10% per tail)
_TM_NUM, _TM_DEN = 1, 10


@query(
    "agg_trimmed_mean",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT)
                   AS cents,
               o_orderkey
        FROM orders),
    ranked AS (
        SELECT o_orderpriority, cents,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY cents, o_orderkey) AS i,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n,
               SUM(cents) OVER (PARTITION BY o_orderpriority) AS tot
        FROM base),
    kept AS (
        SELECT o_orderpriority, cents, n, tot
        FROM ranked
        WHERE i > n * {_TM_NUM} // {_TM_DEN}
          AND i <= n - n * {_TM_NUM} // {_TM_DEN})
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           FLOOR(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0e0
                 * 100.0e0 + 0.5e0) / 100.0e0 AS trimmed_mean,
           FLOOR(CAST(MAX(tot) AS DOUBLE) / MAX(n) / 100.0e0
                 * 100.0e0 + 0.5e0) / 100.0e0 AS raw_mean
    FROM kept
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension — 10% TRIMMED MEAN per order priority: drop the
    bottom and top ⌊n/10⌋ by exact rank (value, orderkey tie-break)
    and average the middle 80% — the robust location estimate between
    the mean (0% breakdown) and the median (50%, but noisy on small
    groups), and the standard readout for spend/latency dashboards
    where a few whale orders or timeouts swamp the mean. Emitted
    beside the raw mean so the gap IS the outlier-mass diagnostic.

    Exactness: integer cents and integer rank cutoffs (⌊n/10⌋ both
    engines via integer division); per-group sums exact int64; one
    rounded division per mean.

    100 TB: the rank window shuffles once per priority partition —
    same profile as agg_weighted_median, and the SAME two-pass binning
    swap applies verbatim when a group outgrows a partition (locate
    the two cutoff bins bin-grain, rank row-grain only inside those
    two bins, aggregate the fully-kept bins without ranking)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint").alias("cents"),
        "o_orderkey",
    )
    wr = Window.partitionBy("o_orderpriority").orderBy(
        "cents", "o_orderkey"
    )
    wp = Window.partitionBy("o_orderpriority")
    ranked = base.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("cents").over(wp).alias("tot"),
    )
    k = (F.col("n") * _TM_NUM / _TM_DEN).cast("bigint")
    kept = ranked.filter(
        (F.col("i") > k) & (F.col("i") <= F.col("n") - k)
    )
    return (
        kept.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.count("*").cast("long").alias("n_kept"),
            (
                F.floor(
                    F.sum("cents").cast("double")
                    / F.count("*")
                    / F.lit(100.0)
                    * F.lit(100.0)
                    + F.lit(0.5)
                )
                / F.lit(100.0)
            ).alias("trimmed_mean"),
            (
                F.floor(
                    F.max("tot").cast("double")
                    / F.max("n")
                    / F.lit(100.0)
                    * F.lit(100.0)
                    + F.lit(0.5)
                )
                / F.lit(100.0)
            ).alias("raw_mean"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe variance-homogeneity test (r6u wave)
# ---------------------------------------------------------------------------


def _levene_oracle() -> str:
    return f"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0e0 + 0.5e0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1),
    m AS (
        SELECT CAST(dayofweek(day) AS BIGINT) AS dow,
               quantile_cont(cents, 0.5) AS med
        FROM d GROUP BY 1),
    z AS (
        SELECT CAST(dayofweek(d.day) AS BIGINT) AS dow,
               CAST(ABS(2.0e0 * d.cents - 2.0e0 * m.med) AS BIGINT) AS w
        FROM d JOIN m ON m.dow = CAST(dayofweek(d.day) AS BIGINT)),
    g AS (
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(w) AS BIGINT) AS s,
               CAST(SUM(w * w) AS BIGINT) AS s2
        FROM z GROUP BY 1),
    t AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(s) AS BIGINT) AS st,
               CAST(SUM(s2) AS BIGINT) AS s2t,
               SUM(CAST(FLOOR(s * 1.0e0 * s / n / 10000.0e0 + 0.5e0)
                        AS BIGINT)) * 10000.0e0 AS sq
        FROM g)
    SELECT nn AS n_days, k AS n_groups,
           {sql_roundn(
               "((sq - st * 1.0e0 * st / nn) / (k - 1))"
               " / NULLIF(GREATEST(s2t - sq, 0.0e0) / (nn - k), 0.0e0)", 4
           )} AS f_bf,
           COALESCE(((sq - st * 1.0e0 * st / nn) / (k - 1))
               / NULLIF(GREATEST(s2t - sq, 0.0e0) / (nn - k), 0.0e0)
                   > {_ANOVA_FCRIT}e0,
               (sq - st * 1.0e0 * st / nn) / (k - 1) > 0.0e0)
               AS reject_05
    FROM t
    """


@query("stats_levene_bf", oracle=_levene_oracle())
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypothesis tier — BROWN–FORSYTHE variance homogeneity (Levene's
    test with MEDIAN centers, the robust form): the assumption check in
    FRONT of hypothesis_ttest / hypothesis_anova, whose equal-variance
    premise nobody verifies — one-way ANOVA applied to the absolute
    deviations z = |x − median(group)| over the same day-of-week groups
    as hypothesis_anova, so the pair reads as mean-difference test +
    its guard. Median centering (vs Levene's mean) keeps the test
    level-robust under heavy tails — exactly the daily-revenue shape.

    Exactness: FULLY integer moments — w = |2x − 2·median| is exact
    int64 (cents are ints, so 2·median is an integer-valued double
    even at even-count midpoints), and F is scale-invariant so the
    doubling cancels; the shared ANOVA between/within decomposition
    quantizes per-group s²/n the same way; one double division at the
    readout against the same F critical literal.

    100 TB: day collapse map-side; the median is per-dow percentile
    over calendar-bounded groups; z and its moments are one more
    day-grain pass — nothing event-grain past the first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
                "bigint"
            )
        ).cast("long").alias("cents")
    )
    d = d.withColumn("dow", F.dayofweek("day").cast("long"))
    d = d.localCheckpoint(eager=False)  # the median pass + the z pass
    m = d.groupBy("dow").agg(
        F.expr("percentile(cents, 0.5d)").alias("med")
    )
    z = d.join(F.broadcast(m), "dow").select(
        "dow",
        F.abs(F.lit(2.0) * F.col("cents") - F.lit(2.0) * F.col("med"))
        .cast("bigint").alias("w"),
    )
    g = z.groupBy("dow").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("w").cast("long").alias("s"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("s2"),
    )
    t = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count("*").cast("long").alias("k"),
        F.sum("s").cast("long").alias("st"),
        F.sum("s2").cast("long").alias("s2t"),
        (
            F.sum(
                F.floor(
                    F.col("s") * F.lit(1.0) * F.col("s") / F.col("n")
                    / F.lit(10000.0)
                    + F.lit(0.5)
                ).cast("long")
            )
            * F.lit(10000.0)
        ).alias("sq"),
    )
    between = (F.col("sq") - F.col("st") * F.lit(1.0) * F.col("st") / F.col("nn")) / (
        F.col("k") - 1
    )
    within = F.greatest(
        F.col("s2t") - F.col("sq"), F.lit(0.0)
    ) / (F.col("nn") - F.col("k"))
    f = between / F.nullif(within, F.lit(0.0))
    return t.select(
        F.col("nn").alias("n_days"),
        F.col("k").alias("n_groups"),
        roundn(f, 4).alias("f_bf"),
        F.coalesce(f > _ANOVA_FCRIT, between > 0).alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# the mean triple (r6u wave)
# ---------------------------------------------------------------------------


@query(
    "agg_mean_inequality",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT)
                   AS cents
        FROM orders),
    q AS (
        SELECT o_orderpriority, cents,
               CAST(FLOOR(ln(CAST(cents AS DOUBLE)) * 1000000000.0e0
                          + 0.5e0) AS BIGINT) AS lq,
               CAST(FLOOR(1.0e15 / cents + 0.5e0) AS BIGINT) AS rq
        FROM base),
    g AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(lq) AS BIGINT) AS sl,
               CAST(SUM(rq) AS BIGINT) AS sr
        FROM q GROUP BY 1)
    SELECT o_orderpriority, n,
           {sql_roundn("CAST(s AS DOUBLE) / n / 100.0e0", 2)} AS mean_arith,
           {sql_roundn(
               "exp(CAST(sl AS DOUBLE) / n / 1000000000.0e0) / 100.0e0",
               2)} AS mean_geom,
           {sql_roundn(
               "CAST(n AS DOUBLE) / (CAST(sr AS DOUBLE) / 1.0e15)"
               " / 100.0e0", 2)} AS mean_harm
    FROM g
    ORDER BY o_orderpriority
    """,
)
def agg_mean_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extension — the MEAN TRIPLE per order priority: arithmetic,
    geometric (exp of mean log — the right average for multiplicative
    quantities: growth rates, price relatives) and harmonic (the right
    average for rates: per-unit costs, throughput) side by side. The
    AM ≥ GM ≥ HM inequality is a structural law of the output
    (test-pinned with equality iff the group is constant), and the
    AM/GM gap is a one-number dispersion diagnostic dashboards use
    where a variance would need explaining.

    Exactness: per-row ln(cents) quantizes to integer NANO-units and
    1/cents to 1e-15 units BEFORE summing (the micro-bits discipline —
    summation order cannot move either total; reciprocal sums stay
    under int64 through sf100); exp of the already-quantized mean and
    the two divisions are the only unquantized doubles, each rounded
    at 2 dp.

    100 TB: one map-side-combinable aggregate; group-cardinality
    state. The reciprocal quantization grain trades 1e-15 absolute
    error per row for order-freedom — document the grain when porting
    to value domains far from [9e2, 6e5] cents."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")
    q = o.select(
        "o_orderpriority",
        cents.alias("cents"),
    ).select(
        "o_orderpriority",
        "cents",
        F.floor(
            F.log(F.col("cents").cast("double")) * F.lit(1000000000.0)
            + F.lit(0.5)
        ).cast("long").alias("lq"),
        F.floor(F.lit(1.0e15) / F.col("cents") + F.lit(0.5))
        .cast("long").alias("rq"),
    )
    g = q.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum("lq").cast("long").alias("sl"),
        F.sum("rq").cast("long").alias("sr"),
    )
    return g.select(
        "o_orderpriority",
        "n",
        roundn(
            F.col("s").cast("double") / F.col("n") / F.lit(100.0), 2
        ).alias("mean_arith"),
        roundn(
            F.exp(
                F.col("sl").cast("double") / F.col("n") / F.lit(1000000000.0)
            )
            / F.lit(100.0),
            2,
        ).alias("mean_geom"),
        roundn(
            F.col("n").cast("double")
            / (F.col("sr").cast("double") / F.lit(1.0e15))
            / F.lit(100.0),
            2,
        ).alias("mean_harm"),
    ).orderBy("o_orderpriority")
