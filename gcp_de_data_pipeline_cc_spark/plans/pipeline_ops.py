"""Training-data pipeline utilities beyond the reference's own surface:
deterministic dataset splitting, cohort retention, and column profiling —
the ops a corpus-production pipeline runs between ingest (S*) and the
curated tier (C*).

Scale notes (100 TB): the split is a stateless per-row hash — no shuffle,
no RNG state, stable under re-runs and late-arriving data (the property
that matters when a 100 TB corpus is split incrementally). Retention is
one groupBy(user) + one groupBy(cohort, offset) — both shuffles carry
only key + counter width. Profiling aggregates every column in a single
scan (one pass over 100 TB, not one per column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query


@query(
    "split_train_test",
    oracle="""
    WITH tagged AS (
        SELECT CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                    THEN 'test'
                    WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '34'
                    THEN 'validation'
                    ELSE 'train' END AS split,
               n_chars
        FROM documents)
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM tagged
    GROUP BY split
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/validation/test split by md5(doc_id)
    hex prefix — the two leading hex chars partition the id space into
    256 stable buckets ('00'..'19' test, '1a'..'33' validation, rest
    train). Pure per-row projection: re-runs, backfills, and incremental
    loads land every document in the same split with no sampling RNG."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(prefix < "1a", "test")
        .when(prefix < "34", "validation")
        .otherwise("train")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort_week
        FROM events
        GROUP BY user_id)
    SELECT cohort_week,
           CAST(datediff('day', cohort_week,
                         CAST(date_trunc('week', ts) AS TIMESTAMP)) / 7
                AS INT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    distinct actives counted per week offset. Week offsets are exact
    multiples of 7 days (both sides truncate to week boundaries first),
    so the integer division is engine-stable."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("activity_week")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min("activity_week").alias("cohort_week")
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_PROFILE_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


@query(
    "profile_table",
    oracle="""
    SELECT 'c_custkey' AS column_name, COUNT(c_custkey) AS n_nonnull,
           COUNT(DISTINCT c_custkey) AS n_distinct,
           CAST(MIN(c_custkey) AS VARCHAR) AS min_value,
           CAST(MAX(c_custkey) AS VARCHAR) AS max_value
    FROM customer
    UNION ALL
    SELECT 'c_name', COUNT(c_name), COUNT(DISTINCT c_name),
           CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', COUNT(c_nationkey), COUNT(DISTINCT c_nationkey),
           CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', COUNT(c_acctbal), COUNT(DISTINCT c_acctbal),
           CAST(MIN(c_acctbal) AS VARCHAR), CAST(MAX(c_acctbal) AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(c_mktsegment), COUNT(DISTINCT c_mktsegment),
           CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR)
    FROM customer
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (QC / data-contract building block): non-null
    count, exact distinct count, min and max per column, min/max cast to
    string for the uniform report schema.

    All columns profile in ONE scan: a single wide aggregate computes
    every per-column statistic, then a literal-keyed stack pivots the row
    to (column, stats) — versus the naive per-column UNION of scans the
    oracle spells out (fine for DuckDB at sf0.01; 5× the I/O at 100 TB)."""
    c = load_table(spark, sf_dir, "customer")
    aggs = []
    for col in _PROFILE_COLS:
        aggs += [
            F.count(col).alias(f"{col}__n"),
            F.countDistinct(col).alias(f"{col}__d"),
            F.min(col).cast("string").alias(f"{col}__min"),
            F.max(col).cast("string").alias(f"{col}__max"),
        ]
    wide = c.agg(*aggs)
    stacked = F.explode(
        F.array(*[
            F.struct(
                F.lit(col).alias("column_name"),
                F.col(f"{col}__n").alias("n_nonnull"),
                F.col(f"{col}__d").alias("n_distinct"),
                F.col(f"{col}__min").alias("min_value"),
                F.col(f"{col}__max").alias("max_value"),
            )
            for col in _PROFILE_COLS
        ])
    )
    return wide.select(stacked.alias("s")).select("s.*")


@query(
    "sample_stratified",
    oracle="""
    SELECT lang, COUNT(*) AS n_sampled
    FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
               ELSE TRUE END
    GROUP BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus rebalancing: downsample the dominant language to
    ~25% ('00'..'3f' of the 256 md5-prefix buckets), keep the rest —
    the deterministic-hash analog of ``sampleBy`` (same stability
    properties as split_train_test: per-row, no RNG, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    keep = F.when(F.col("lang") == "en", prefix < "40").otherwise(F.lit(True))
    return docs.filter(keep).groupBy("lang").agg(F.count("*").alias("n_sampled"))


@query(
    "histogram_values",
    oracle="""
    SELECT CAST(FLOOR(value / 25.0) AS INT) AS bucket,
           FLOOR(value / 25.0) * 25.0 AS bucket_start,
           COUNT(*) AS n_events,
           FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (profiling / drift detection): floor-bucket
    the measure, one partial-aggregated groupBy — the deterministic
    alternative to ``histogram_numeric``'s data-dependent bins."""
    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 25.0)
    return ev.groupBy(
        bucket.cast("int").alias("bucket"),
        (bucket * 25.0).alias("bucket_start"),
    ).agg(
        F.count("*").alias("n_events"),
        roundn(F.sum("value")).alias("sum_value"),
    )


@query(
    "text_bigrams",
    oracle="""
    SELECT bigram, COUNT(*) AS n
    FROM (SELECT UNNEST(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i+1])) AS bigram
          FROM (SELECT string_split(text, ' ') AS t FROM documents)
          WHERE len(t) >= 2)
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 25
    """,
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/C6-extension — corpus bigram frequencies (the vocabulary step
    before BPE-style merges): adjacent-token pairing via a sequence
    transform, explode, count, global top-25."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(25)
    )


@query(
    "sample_hash_topk",
    oracle="""
    WITH r AS (
        SELECT event_type, event_id,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rn
        FROM events)
    SELECT event_type, event_id, CAST(rn AS INT) AS rn
    FROM r WHERE rn <= 5
    """,
)
def sample_hash_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sample: rank rows by md5(id) within each
    group and keep the first 5 — a reproducible stand-in for reservoir
    sampling (same sample on every run, engine, and partitioning, which
    `TABLESAMPLE`/`rand()` cannot give). md5 hex strings compare
    identically on both engines. The rank window is WindowGroupLimit-
    pruned: each map task keeps ≤5 rows per group before the shuffle,
    so the exchange carries O(groups·k), not the table."""
    ev = load_table(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.md5(F.col("event_id").cast("string")), "event_id"
        )
    )
    return (
        ev.select("event_type", "event_id", rn.alias("rn"))
        .filter(F.col("rn") <= 5)
    )


# ---------------------------------------------------------------------------
# collocation lift (r4b wave)
# ---------------------------------------------------------------------------

_COLL_MIN_N = 5
_COLL_TOP = 20

_COLL_ORACLE = f"""
WITH t AS (
    SELECT string_split(text, ' ') AS t FROM documents
    WHERE len(string_split(text, ' ')) >= 2),
uni AS (
    SELECT UNNEST(t) AS tok FROM t),
u AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY tok),
ut AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM u),
bg AS (
    SELECT UNNEST(list_transform(range(1, len(t)),
                  i -> t[i] || ' ' || t[i + 1])) AS bigram
    FROM t),
b AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bg
      GROUP BY bigram HAVING COUNT(*) >= {_COLL_MIN_N}),
bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bigrams FROM bg),
scored AS (
    SELECT b.bigram, b.n_xy,
           ux.c AS n_x, uy.c AS n_y,
           b.n_xy * 1.0e0 / bt.n_bigrams
               / (ux.c * 1.0e0 / ut.total)
               / (uy.c * 1.0e0 / ut.total) AS lift
    FROM b
    JOIN u ux ON ux.tok = string_split(b.bigram, ' ')[1]
    JOIN u uy ON uy.tok = string_split(b.bigram, ' ')[2], bt, ut)
SELECT bigram, n_xy, n_x, n_y,
       FLOOR(lift * 10000.0e0 + 0.5e0) / 10000.0e0 AS lift
FROM scored
ORDER BY lift DESC, bigram
LIMIT {_COLL_TOP}
"""


@query("text_collocations", oracle=_COLL_ORACLE)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6-extension — COLLOCATION mining: bigrams at support ≥{m}
    scored by LIFT P(xy)/(P(x)·P(y)) — the PMI family with the exact
    rational ratio instead of its logarithm (same ranking, zero libm),
    top-{t}. Lift ≫ 1 = words that co-occur far beyond their unigram
    frequencies predict — the multiword-expression signal
    (text_bigrams counts; this one NORMALIZES, which is what separates
    "of the" from a genuine collocation).

    Exactness: all counts exact ints; the lift is one identical
    expression tree over them, 4-dp floor-rounded; ties break on the
    bigram string.

    100 TB: unigram and bigram censuses are two explode+groupBy passes
    over the same token arrays (map-side combined); the unigram table
    joined back is vocabulary-sized and broadcast; the final heap is
    TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    t = t.localCheckpoint(eager=False)  # unigram + bigram censuses
    uni = t.select(F.explode("t").alias("tok"))
    u = uni.groupBy("tok").agg(F.count("*").alias("c"))
    u = u.localCheckpoint(eager=False)  # both sides + total
    ut = u.agg(F.sum("c").alias("total"))
    bg = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("bigram")
    )
    bg = bg.localCheckpoint(eager=False)  # census + total
    b = (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("n_xy"))
        .filter(F.col("n_xy") >= _COLL_MIN_N)
    )
    bt = bg.agg(F.count("*").alias("n_bigrams"))
    one = F.lit(1.0)
    scored = (
        b.withColumn("x", F.split("bigram", " ")[0])
        .withColumn("y", F.split("bigram", " ")[1])
        .join(
            F.broadcast(u.select(F.col("tok").alias("x"), F.col("c").alias("n_x"))),
            "x",
        )
        .join(
            F.broadcast(u.select(F.col("tok").alias("y"), F.col("c").alias("n_y"))),
            "y",
        )
        .crossJoin(F.broadcast(bt))
        .crossJoin(F.broadcast(ut))
        .select(
            "bigram",
            "n_xy",
            "n_x",
            "n_y",
            (
                F.col("n_xy") * one / F.col("n_bigrams")
                / (F.col("n_x") * one / F.col("total"))
                / (F.col("n_y") * one / F.col("total"))
            ).alias("lift_raw"),
        )
    )
    return (
        scored.orderBy(F.desc("lift_raw"), "bigram")
        .limit(_COLL_TOP)
        .select(
            "bigram",
            "n_xy",
            "n_x",
            "n_y",
            roundn(F.col("lift_raw"), 4).alias("lift"),
        )
    )


text_collocations.__doc__ = text_collocations.__doc__.format(
    m=_COLL_MIN_N, t=_COLL_TOP
)


# ---------------------------------------------------------------------------
# Neyman (optimal stratified) sample allocation (r5r wave)
# ---------------------------------------------------------------------------

#: audit-sample budget to allocate across strata
_NEY_B = 10_000


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
        SELECT o_orderpriority AS stratum,
               CAST(COUNT(*) AS BIGINT) AS n_h,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                             AS BIGINT) // 100) AS BIGINT) AS sx,
               CAST(SUM((CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                              AS BIGINT) // 100)
                        * (CAST(FLOOR(o_totalprice * 100.0e0 + 0.5e0)
                                AS BIGINT) // 100)) AS BIGINT) AS sxx
        FROM orders GROUP BY 1),
    w AS (
        SELECT stratum, n_h,
               CAST(FLOOR(CAST(n_h AS DOUBLE)
                    * sqrt((CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                              / CAST(n_h AS DOUBLE))
                           / CAST(n_h - 1 AS DOUBLE))
                    * 100.0e0 + 0.5e0) AS BIGINT) AS wq
        FROM s),
    t AS (SELECT CAST(SUM(wq) AS BIGINT) AS wtot,
                 CAST(SUM(n_h) AS BIGINT) AS ntot FROM w),
    q AS (
        SELECT w.stratum, w.n_h, w.wq,
               ({_NEY_B} * w.wq) // t.wtot AS base,
               ({_NEY_B} * w.wq) % t.wtot AS rem,
               t.wtot, t.ntot
        FROM w, t),
    r AS (SELECT CAST({_NEY_B} AS BIGINT) - SUM(base) AS n_extra FROM q),
    rk AS (
        SELECT q.*, ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rnk
        FROM q)
    SELECT rk.stratum, rk.n_h,
           CAST(rk.base + CASE WHEN rk.rnk <= r.n_extra THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_neyman,
           CAST(({_NEY_B} * rk.n_h) // rk.ntot AS BIGINT)
               AS alloc_proportional,
           FLOOR(rk.wq * 1.0e0 / rk.wtot * 1000000.0e0 + 0.5e0)
               / 1000000.0e0 AS neyman_share
    FROM rk, r
    ORDER BY rk.stratum
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling tier — NEYMAN (optimal) stratified allocation: split an
    audit-sample budget of {b:,} rows across strata proportionally to
    N_h·σ_h (population × spread) instead of N_h alone — the
    survey-statistics result that minimizes the estimator variance for
    a fixed budget, shown BESIDE the naive proportional allocation so
    the variance-driven reallocation is visible (high-variance strata
    gain, uniform strata shrink).  Hamilton largest-remainder conserves
    the budget exactly (`corpus_apportion_budget`'s discipline).

    Exactness: per-stratum (n, Σx, Σx²) are exact int64 DOLLARS (cent
    grain overflows the second moment at sf0.1 already — dollar grain
    survives 10⁸ rows/stratum, and σ's ordering precision is
    unaffected); the weight N_h·σ_h·100 is computed by a fixed scalar
    tree and floor-quantized to an integer BEFORE any cross-stratum
    arithmetic; quotas/remainders/seat ranks are exact integers.

    100 TB: one map-side pass to stratum grain; allocation on the
    strata-cardinality table with one-row broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    # the sigma weight works in DOLLARS (cents DIV 100): the cent-grain
    # second moment overflows int64 already at sf0.1 (n_h * (5e7)^2 >
    # 2^63); dollar grain keeps sxx < 2^63 past 10^8 rows/stratum while
    # the weight's ORDERING precision is unaffected (the x100 below
    # restores the scale in the quantized weight)
    dollars = F.expr(
        "CAST(FLOOR(o_totalprice * 100.0D + 0.5D) AS BIGINT) DIV 100"
    )
    s = orders.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum(dollars).cast("long").alias("sx"),
        F.sum(dollars * dollars).cast("long").alias("sxx"),
    )
    sd = F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / F.col("n_h").cast("double")
        )
        / (F.col("n_h") - 1).cast("double")
    )
    w = s.select(
        "stratum",
        "n_h",
        F.floor(
            F.col("n_h").cast("double") * sd * F.lit(100.0) + F.lit(0.5)
        )
        .cast("long")
        .alias("wq"),
    )
    w = w.localCheckpoint(eager=False)  # totals + quota consumers
    t = w.agg(
        F.sum("wq").cast("long").alias("wtot"),
        F.sum("n_h").cast("long").alias("ntot"),
    )
    b = F.lit(_NEY_B).cast("long")
    q = w.crossJoin(F.broadcast(t)).select(
        "stratum",
        "n_h",
        "wq",
        F.expr(f"CAST(({_NEY_B} * wq) DIV wtot AS LONG)").alias("base"),
        F.pmod(b * F.col("wq"), F.col("wtot")).alias("rem"),
        "wtot",
        "ntot",
    )
    q = q.localCheckpoint(eager=False)  # seats + ranking consumers
    r = q.agg((b - F.sum("base")).alias("n_extra"))
    rk = q.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("stratum"))),
    )
    extra = F.when(F.col("rnk") <= F.col("n_extra"), 1).otherwise(0)
    return (
        rk.crossJoin(F.broadcast(r))
        .select(
            "stratum",
            "n_h",
            (F.col("base") + extra).cast("long").alias("alloc_neyman"),
            F.expr(f"CAST(({_NEY_B} * n_h) DIV ntot AS LONG)").alias(
                "alloc_proportional"
            ),
            roundn(
                F.col("wq") * F.lit(1.0) / F.col("wtot").cast("double"), 6
            ).alias("neyman_share"),
        )
        .orderBy("stratum")
    )


sample_neyman_allocation.__doc__ = sample_neyman_allocation.__doc__.format(
    b=_NEY_B
)
