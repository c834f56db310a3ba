"""Round-8 wave: graph topology, training-prep sampling, and eval
metrics.

* ``graph_rich_club`` — rich-club coefficient φ(k) over the part
  co-purchase graph: do high-degree nodes preferentially link to each
  other?  The hub-interconnection diagnostic beside assortativity
  (graph_assortativity measures the correlation; φ(k) measures the
  actual subgraph density ladder).
* ``sample_class_balanced`` — deterministic class-balanced
  downsampling (every class cut to the minority count by portable
  hash rank) — the standard rebalancing step before training a
  classifier on skewed labels.
* ``eval_wer`` — word error rate via TOKEN-level edit distance: the
  vocabulary is dense-ranked to single ASCII symbols so the engines'
  native character Levenshtein computes token distance exactly.
* ``eval_brier_decomposition`` — Brier score with the exact Murphy
  decomposition (reliability − resolution + uncertainty) on binned
  forecasts, over the same planted eval log as eval_calibration_ece.

Reference parity: the reference repo (AdepuAdithya/gcp-de-data-pipeline-cc,
Airflow DAG orchestration — dags/*.py) contains no analytics engine;
these derive from the driver's analytics mandate on public formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query

# ---------------------------------------------------------------------------
# graph_rich_club
# ---------------------------------------------------------------------------

#: degree thresholds probed (the part co-purchase degree range is
#: SF-stable: basket width and part popularity are per-order domain
#: properties, not corpus-size properties — measured 42..222 at both
#: sf0.01 and sf0.1)
_RC_KS = (60, 80, 100, 120, 140, 160, 180)


def _rich_club_oracle() -> str:
    ks = ", ".join(str(k) for k in _RC_KS)
    return f"""
    WITH pl AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT DISTINCT a.l_partkey AS sa, b.l_partkey AS sb
        FROM pl a JOIN pl b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    g AS (SELECT sa AS u FROM e UNION ALL SELECT sb FROM e),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM g GROUP BY 1),
    tot AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS m),
    ks AS (SELECT UNNEST([{ks}]) AS k),
    rich AS (
        SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_rich
        FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
    re AS (
        SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS e_rich
        FROM ks
        JOIN e ON TRUE
        JOIN deg da ON da.u = e.sa AND da.d > ks.k
        JOIN deg db ON db.u = e.sb AND db.d > ks.k
        GROUP BY 1)
    SELECT rich.k, rich.n_rich, COALESCE(re.e_rich, 0) AS e_rich,
           {sql_roundn(
               "2.0e0 * COALESCE(re.e_rich, 0)"
               " / (rich.n_rich * (rich.n_rich - 1.0e0))", 6)} AS phi,
           {sql_roundn(
               "(2.0e0 * COALESCE(re.e_rich, 0)"
               " / (rich.n_rich * (rich.n_rich - 1.0e0)))"
               " / (2.0e0 * tot.m / (tot.n * (tot.n - 1.0e0)))", 6)}
               AS phi_over_density
    FROM rich LEFT JOIN re USING (k) CROSS JOIN tot
    WHERE rich.n_rich >= 2
    ORDER BY rich.k
    """


@query("graph_rich_club", oracle=_rich_club_oracle())
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph tier — RICH-CLUB coefficient (Zhou & Mondragón 2004):
    φ(k) = 2·E_k / (N_k(N_k−1)) over the subgraph of nodes with degree
    > k, for the fixed threshold ladder k ∈ {ks} on the part
    co-purchase graph — rising φ(k)/density means popular parts
    co-occur with each OTHER beyond chance (bundle structure), the
    hub-interconnection signal beside graph_assortativity's single
    correlation number.  (The degree-preserving null-model
    normalization φ_norm requires randomized rewiring — documented
    out-of-scope; φ/ρ against the whole-graph density ρ is the
    deterministic first-order version.)

    Exactness: degrees, N_k and E_k are exact integer counts over the
    DISTINCT edge relation; φ and φ/ρ are one rational expression
    rounded 6 dp; thresholds with fewer than 2 qualifying nodes drop
    in both engines.

    100 TB: edges are generated per order (Σ C(basket,2), basket-width
    bounded — never |parts|²); the degree relation is node-sized and
    broadcast to the edge scan; each threshold row is two
    map-side-combined counts."""
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select("l_orderkey", "l_partkey").distinct()
    e = (
        pl.alias("a")
        .join(
            pl.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("sa"),
            F.col("b.l_partkey").alias("sb"),
        )
        .distinct()
    )
    e = e.localCheckpoint(eager=False)  # deg + tot + per-k counts
    g = e.select(F.col("sa").alias("u")).unionAll(
        e.select(F.col("sb").alias("u"))
    )
    deg = g.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    tot = deg.agg(F.count("*").cast("long").alias("n")).crossJoin(
        e.agg(F.count("*").cast("long").alias("m"))
    )
    # the k spine is a compile-time literal ladder: explode it map-side
    # per row and filter — no threshold join plans at all
    ks_arr = F.array(*[F.lit(int(k)).cast("long") for k in _RC_KS])
    rich = (
        deg.select("d", F.explode(ks_arr).alias("k"))
        .filter(F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_rich"))
    )
    re = (
        e.join(
            F.broadcast(deg.select(F.col("u").alias("ua"),
                                   F.col("d").alias("da"))),
            F.col("sa") == F.col("ua"),
        )
        .join(
            F.broadcast(deg.select(F.col("u").alias("ub"),
                                   F.col("d").alias("db"))),
            F.col("sb") == F.col("ub"),
        )
        .select(
            F.least("da", "db").alias("dmin"),
            F.explode(ks_arr).alias("k"),
        )
        .filter(F.col("dmin") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("e_rich"))
    )
    phi = (
        F.lit(2.0)
        * F.coalesce(F.col("e_rich"), F.lit(0))
        / (F.col("n_rich") * (F.col("n_rich") - F.lit(1.0)))
    )
    dens = F.lit(2.0) * F.col("m") / (F.col("n") * (F.col("n") - F.lit(1.0)))
    return (
        rich.join(re, "k", "left")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_rich") >= 2)
        .select(
            "k",
            "n_rich",
            F.coalesce(F.col("e_rich"), F.lit(0)).cast("long").alias(
                "e_rich"
            ),
            roundn(phi, 6).alias("phi"),
            roundn(phi / dens, 6).alias("phi_over_density"),
        )
        .orderBy("k")
    )


graph_rich_club.__doc__ = graph_rich_club.__doc__.format(ks=list(_RC_KS))


# ---------------------------------------------------------------------------
# sample_class_balanced
# ---------------------------------------------------------------------------


def _balanced_oracle() -> str:
    return f"""
    WITH cnt AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_before
        FROM embeddings GROUP BY 1),
    mn AS (SELECT CAST(MIN(n_before) AS BIGINT) AS n_min FROM cnt),
    rk AS (
        SELECT label, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY label
                   ORDER BY md5('bal:' || CAST(vec_id AS VARCHAR)), vec_id)
                   AS rn
        FROM embeddings),
    sel AS (
        SELECT rk.label,
               CAST(COUNT(*) AS BIGINT) AS n_after,
               CAST(SUM(rk.vec_id) AS BIGINT) AS id_checksum
        FROM rk CROSS JOIN mn WHERE rk.rn <= mn.n_min
        GROUP BY 1)
    SELECT cnt.label, cnt.n_before, sel.n_after, sel.id_checksum
    FROM cnt JOIN sel USING (label)
    ORDER BY cnt.label
    """


@query("sample_class_balanced", oracle=_balanced_oracle())
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training prep — deterministic CLASS-BALANCED downsampling: every
    label is cut to the minority class's count, keeping each class's
    lowest portable-hash ranks (md5 of the salted id — a seeded,
    re-runnable draw, not a sample() that changes under partitioning).
    The standard rebalancing step before training on skewed labels;
    the id checksum makes the SELECTION itself (not just its size)
    part of the differential contract.

    Exactness: ranks are total-ordered by (md5, id); counts and the
    checksum are exact int64.

    100 TB: one count per class (map-side combined), one broadcast of
    the 10-row class table, one rank window partitioned per class —
    the window carries (label, hash) pairs only; at warehouse scale
    the same plan swaps the full sort for a per-class hash-threshold
    refined in two passes (documented in sample_hash_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cnt = emb.groupBy("label").agg(
        F.count("*").cast("long").alias("n_before")
    )
    mn = cnt.agg(F.min("n_before").cast("long").alias("n_min"))
    wr = Window.partitionBy("label").orderBy(
        F.md5(F.concat(F.lit("bal:"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    sel = (
        emb.select("label", "vec_id")
        .withColumn("rn", F.row_number().over(wr))
        .crossJoin(F.broadcast(mn))
        .filter(F.col("rn") <= F.col("n_min"))
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_after"),
            F.sum("vec_id").cast("long").alias("id_checksum"),
        )
    )
    return (
        cnt.join(sel, "label")
        .select("label", "n_before", "n_after", "id_checksum")
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# eval_wer
# ---------------------------------------------------------------------------

#: the OOV token the noisy-channel candidate substitutes (same
#: corruption as eval_bleu/eval_chrf: every 5th token)
_WER_OOV = "qz"


def _wer_oracle() -> str:
    return f"""
    WITH d AS (
        SELECT doc_id, source, string_split(text, ' ') AS t
        FROM documents WHERE len(string_split(text, ' ')) >= 1),
    tok AS (
        SELECT doc_id, source, i AS p, t[i] AS token
        FROM d, UNNEST(range(1, len(t) + 1)) AS u(i)),
    vocab AS (
        SELECT token, ROW_NUMBER() OVER (ORDER BY token) AS r
        FROM (SELECT DISTINCT token FROM tok
              UNION SELECT '{_WER_OOV}')),
    oov AS (SELECT chr(CAST(64 + r AS INT)) AS och FROM vocab
            WHERE token = '{_WER_OOV}'),
    strs AS (
        SELECT tok.doc_id, tok.source,
               CAST(COUNT(*) AS BIGINT) AS ref_len,
               string_agg(chr(CAST(64 + vocab.r AS INT)), '' ORDER BY tok.p)
                   AS ref_s,
               string_agg(CASE WHEN tok.p % 5 = 0 THEN oov.och
                               ELSE chr(CAST(64 + vocab.r AS INT)) END,
                          '' ORDER BY tok.p) AS cand_s
        FROM tok JOIN vocab USING (token) CROSS JOIN oov
        GROUP BY 1, 2),
    ed AS (
        SELECT source, ref_len,
               CAST(levenshtein(cand_s, ref_s) AS BIGINT) AS edits
        FROM strs)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ref_len) AS BIGINT) AS ref_tokens,
           CAST(SUM(edits) AS BIGINT) AS edit_ops,
           {sql_roundn("SUM(edits) * 1.0e0 / SUM(ref_len) / 1.0e0", 6)}
               AS wer
    FROM ed
    GROUP BY source
    ORDER BY source
    """


@query("eval_wer", oracle=_wer_oracle())
def eval_wer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval tier — WORD ERROR RATE: corpus WER = Σ token-level edit
    distance / Σ reference length per source, on the same noisy-channel
    candidate as eval_bleu/eval_chrf (every 5th token → OOV), so the
    n-gram-overlap metrics and the alignment metric are directly
    comparable on identical pairs.  WER is the ASR/translation standard
    the overlap metrics cannot replace: it charges insertions and
    deletions through a real alignment, and repetitive text can align
    CHEAPER than the corruption count — which is exactly what the
    differential proves both engines agree on.

    The token→symbol trick: the corpus vocabulary (31 tokens + OOV) is
    dense-ranked to single ASCII characters, so each engine's native
    CHARACTER Levenshtein computes TOKEN-level distance exactly — no
    UDF dynamic program in the hot path.  Production vocabularies
    larger than the single-byte range shard by mapping rare tokens to
    an OOV symbol or running the banded DP as a pandas UDF
    (ts_dtw_banded's cost class); the mapping stays ASCII here so both
    engines' Levenshteins count the same units.

    Exactness: the vocabulary rank is a total order on token strings;
    distances and lengths are exact integers; WER is one division.

    100 TB: one token explode; the vocabulary is a broadcast-sized
    relation BY CONSTRUCTION of the symbol mapping; per-doc strings
    re-assemble in one sorted-struct aggregate (doc-length state); the
    Levenshtein is per-row JVM codegen."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.split("text", " ").alias("t")
    ).filter(F.size("t") >= 1)
    tok = d.select(
        "doc_id",
        "source",
        F.posexplode("t").alias("p0", "token"),
    ).select("doc_id", "source", (F.col("p0") + 1).alias("p"), "token")
    tok = tok.localCheckpoint(eager=False)  # vocab + strings
    vocab = (
        tok.select("token")
        .distinct()
        .unionAll(spark.createDataFrame([(_WER_OOV,)], "token STRING"))
        .distinct()
        .select(
            "token",
            F.row_number().over(Window.orderBy("token")).alias("r"),
        )
        .select("token", F.expr("char(64 + r)").alias("ch"))
    )
    oov = vocab.filter(F.col("token") == _WER_OOV).select(
        F.col("ch").alias("och")
    )
    strs = (
        tok.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("ref_len"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "ch"))),
                    lambda s: s["ch"],
                ),
            ).alias("ref_s"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "p",
                                F.when(
                                    F.col("p") % 5 == 0, F.col("och")
                                )
                                .otherwise(F.col("ch"))
                                .alias("cch"),
                            )
                        )
                    ),
                    lambda s: s["cch"],
                ),
            ).alias("cand_s"),
        )
    )
    ed = strs.select(
        "source",
        "ref_len",
        F.levenshtein("cand_s", "ref_s").cast("long").alias("edits"),
    )
    return (
        ed.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ref_len").cast("long").alias("ref_tokens"),
            F.sum("edits").cast("long").alias("edit_ops"),
            roundn(
                F.sum("edits") * F.lit(1.0) / F.sum("ref_len") / F.lit(1.0),
                6,
            ).alias("wer"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# eval_brier_decomposition
# ---------------------------------------------------------------------------

#: same planted eval log as eval_calibration_ece (salts c/z), binned to
#: 10 bins with MIDPOINT forecasts so the Murphy identity is EXACT
_BRIER_U48_SQL = (
    "(CAST(CAST('0x' || SUBSTR(md5('{salt}:' || CAST(o_orderkey AS VARCHAR)),"
    " 1, 12) AS BIGINT) AS DOUBLE) + 0.5) / 281474976710656.0"
)


def _brier_u48(salt: str) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(281474976710656.0)


def _brier_oracle() -> str:
    u1 = _BRIER_U48_SQL.format(salt="c")
    u2 = _BRIER_U48_SQL.format(salt="z")
    return f"""
    WITH log AS (
        SELECT LEAST(CAST(FLOOR((0.05e0 + 0.9e0 * ({u1})) * 10000.0e0
                                + 0.5e0) AS BIGINT) // 1000, 9) AS bin,
               CASE WHEN ({u2}) < GREATEST(
                        (0.05e0 + 0.9e0 * ({u1})) - 0.08e0, 0.0e0)
                    THEN 1 ELSE 0 END AS o
        FROM orders),
    b AS (
        SELECT bin, bin * 1000 + 500 AS mid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(o) AS BIGINT) AS k
        FROM log GROUP BY 1),
    t AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(k) AS BIGINT) AS kt
        FROM b),
    parts AS (
        SELECT
            CAST(SUM(b.n * b.mid * b.mid - 2 * 10000 * b.k * b.mid
                     + 100000000 * b.k) AS BIGINT) AS brier_num,
            CAST(SUM(CAST(FLOOR(
                (b.n * 1.0e0 * b.mid - 10000.0e0 * b.k)
                * (b.n * 1.0e0 * b.mid - 10000.0e0 * b.k)
                / (b.n * 100000000.0e0 * t.nt)
                * 1000000000.0e0 + 0.5e0) AS BIGINT)) AS BIGINT) AS rel_q,
            CAST(SUM(CAST(FLOOR(
                (t.nt * 1.0e0 * b.k - b.n * 1.0e0 * t.kt)
                * (t.nt * 1.0e0 * b.k - b.n * 1.0e0 * t.kt)
                / (b.n * 1.0e0 * t.nt * t.nt * t.nt)
                * 1000000000.0e0 + 0.5e0) AS BIGINT)) AS BIGINT) AS res_q
        FROM b CROSS JOIN t)
    SELECT t.nt AS n_total,
           {sql_roundn("t.kt * 1.0e0 / t.nt / 1.0e0", 6)} AS base_rate,
           {sql_roundn(
               "parts.brier_num * 1.0e0 / (100000000.0e0 * t.nt)"
               " / 1.0e0", 6)} AS brier,
           {sql_roundn("parts.rel_q / 1000000000.0e0 / 1.0e0", 6)}
               AS reliability,
           {sql_roundn("parts.res_q / 1000000000.0e0 / 1.0e0", 6)}
               AS resolution,
           {sql_roundn(
               "t.kt * 1.0e0 * (t.nt - t.kt) / (t.nt * 1.0e0 * t.nt)"
               " / 1.0e0", 6)} AS uncertainty
    FROM parts CROSS JOIN t
    """


@query("eval_brier_decomposition", oracle=_brier_oracle())
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval tier — BRIER SCORE with the exact MURPHY decomposition
    (Murphy 1973): Brier = reliability − resolution + uncertainty over
    the 10-bin forecaster (bin-midpoint confidences), on the SAME
    planted overconfident eval log as eval_calibration_ece — ECE reads
    the |gap| ladder, Brier charges it quadratically and splits the
    blame: reliability (calibration error — fixable by recalibration),
    resolution (discrimination — only a better model buys it),
    uncertainty (the base rate's floor, nobody's fault).  Binning to
    midpoints is what makes the identity EXACT (within-bin forecast
    variance is zero by construction).

    Exactness: the Brier numerator is an exact int64 over bin sums
    (n·mid² − 2·10⁴·k·mid + 10⁸·k); per-bin reliability/resolution
    terms quantize ONCE to nano-units and int-sum across the 10 fixed
    bins (the squared numerators exceed int64 at warehouse scale, so
    they evaluate in doubles with IDENTICAL expression trees on both
    engines); uncertainty is one rational expression.

    100 TB: one map-side-combined 10-group aggregate plus a one-row
    broadcast — the eval_calibration_ece cost class exactly."""
    orders = load_table(spark, sf_dir, "orders")
    u1 = _brier_u48("c")
    u2 = _brier_u48("z")
    conf = F.lit(0.05) + F.lit(0.9) * u1
    c_int = F.floor(conf * F.lit(10000.0) + F.lit(0.5)).cast("long")
    o = (u2 < F.greatest(conf - F.lit(0.08), F.lit(0.0))).cast("int")
    log = orders.select(
        F.least(c_int / F.lit(1000), F.lit(9.0)).cast("long").alias("bin"),
        o.alias("o"),
    )
    b = log.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("o").cast("long").alias("k"),
    ).withColumn("mid", (F.col("bin") * 1000 + 500).cast("long"))
    b = b.localCheckpoint(eager=False)  # totals + parts
    t = b.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("k").cast("long").alias("kt"),
    )
    bt = b.crossJoin(F.broadcast(t))
    rel_num = (
        F.col("n") * F.lit(1.0) * F.col("mid")
        - F.lit(10000.0) * F.col("k")
    )
    res_num = (
        F.col("nt") * F.lit(1.0) * F.col("k")
        - F.col("n") * F.lit(1.0) * F.col("kt")
    )
    parts = bt.agg(
        F.sum(
            F.col("n") * F.col("mid") * F.col("mid")
            - F.lit(2) * F.lit(10000) * F.col("k") * F.col("mid")
            + F.lit(100000000) * F.col("k")
        )
        .cast("long")
        .alias("brier_num"),
        F.sum(
            F.floor(
                rel_num
                * rel_num
                / (F.col("n") * F.lit(100000000.0) * F.col("nt"))
                * F.lit(1.0e9)
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("rel_q"),
        F.sum(
            F.floor(
                res_num
                * res_num
                / (
                    F.col("n")
                    * F.lit(1.0)
                    * F.col("nt")
                    * F.col("nt")
                    * F.col("nt")
                )
                * F.lit(1.0e9)
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("res_q"),
    )
    return (
        parts.crossJoin(F.broadcast(t))
        .select(
            F.col("nt").alias("n_total"),
            roundn(
                F.col("kt") * F.lit(1.0) / F.col("nt") / F.lit(1.0), 6
            ).alias("base_rate"),
            roundn(
                F.col("brier_num")
                * F.lit(1.0)
                / (F.lit(100000000.0) * F.col("nt"))
                / F.lit(1.0),
                6,
            ).alias("brier"),
            roundn(F.col("rel_q") / F.lit(1.0e9) / F.lit(1.0), 6).alias(
                "reliability"
            ),
            roundn(F.col("res_q") / F.lit(1.0e9) / F.lit(1.0), 6).alias(
                "resolution"
            ),
            roundn(
                F.col("kt")
                * F.lit(1.0)
                * (F.col("nt") - F.col("kt"))
                / (F.col("nt") * F.lit(1.0) * F.col("nt"))
                / F.lit(1.0),
                6,
            ).alias("uncertainty"),
        )
    )
