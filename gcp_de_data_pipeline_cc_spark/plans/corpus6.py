"""Language-model scoring, wave 6: interpolated Kneser–Ney.

The third rung of the LM-based quality ladder — text_perplexity
(unigram, add-one) → text_bigram_lm (bigram, add-one) → THIS (bigram,
interpolated Kneser–Ney): the smoothing every real n-gram quality
filter (CCNet's KenLM models) actually uses. Add-one butchers the
probability mass of unseen continuations; KN discounts every observed
bigram by a fixed D and redistributes that mass by CONTINUATION
fertility — "how many distinct contexts precede w" — which is why
'Francisco' (frequent but only after 'San') stops looking like a good
continuation everywhere.

Reference parity: the reference repo (Airflow DAG orchestration,
dags/*.py) has no text engine; derived from the driver's LLM-pipeline
mandate on public PySpark/SQL patterns only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.operators import text as tx
from gcp_de_data_pipeline_cc_spark.plans.registry import query

#: absolute discount (the standard KN value for count-of-count-rich data)
_KN_D = 0.75


def _kn_oracle() -> str:
    return f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pos AS MATERIALIZED (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(t)), i -> t[i])) AS ctx,
               UNNEST(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
        FROM base WHERE len(t) >= 2),
    bt AS MATERIALIZED (
        SELECT ctx, w2, CAST(COUNT(*) AS BIGINT) AS c2
        FROM pos GROUP BY 1, 2),
    cs AS MATERIALIZED (
        SELECT ctx, CAST(SUM(c2) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n1fw
        FROM bt GROUP BY 1),
    ws AS MATERIALIZED (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1bw FROM bt GROUP BY 1),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbb FROM bt),
    q AS (
        SELECT pos.doc_id,
               CAST(FLOOR(-log2(
                        (bt.c2 - {_KN_D}e0) / cs.c1
                        + {_KN_D}e0 * cs.n1fw / cs.c1
                          * (CAST(ws.n1bw AS DOUBLE) / nb.nbb))
                    * 1000000.0e0 + 0.5e0) AS BIGINT) AS bq
        FROM pos
        JOIN bt USING (ctx, w2)
        JOIN cs USING (ctx)
        JOIN ws USING (w2)
        CROSS JOIN nb)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           FLOOR(CAST(SUM(bq) AS DOUBLE) / COUNT(*) / 1000000.0e0
                 * 10000.0e0 + 0.5e0) / 10000.0e0 AS bits_per_bigram,
           POW(2.0e0,
               FLOOR(CAST(SUM(bq) AS DOUBLE) / COUNT(*) / 1000000.0e0
                     * 10000.0e0 + 0.5e0) / 10000.0e0) AS perplexity
    FROM q GROUP BY doc_id
    """


@query("text_kneser_ney", oracle=_kn_oracle())
def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM quality scoring — interpolated KNESER–NEY bigram perplexity
    per document, the smoothing real n-gram quality filters (CCNet's
    KenLM stage) deploy: p(w|c) = (c(cw)−D)/c(c) + D·N1+(c·)/c(c) ·
    N1+(·w)/N1+(··), D = {d}. The discount strips D from every seen
    bigram; the freed mass backs off to CONTINUATION probability —
    type fertility, not raw frequency — so boilerplate tokens that
    only ever follow one context stop inflating fluency. Scored on the
    corpus's own model (c(cw) ≥ 1 at every position, so the discounted
    term stays positive); same output shape as text_bigram_lm for a
    direct rung-to-rung comparison.

    Exactness: all four model relations are exact int64 counts; the
    probability is one identical double expression tree per position,
    floor-quantized to integer MICRO-BITS before the per-document sum
    (the text_bigram_lm discipline — summation order cannot move the
    total), one rounded division at readout, and the perplexity
    exponentiates the already-rounded mean.

    100 TB: the position relation is the same explode→shuffle shape as
    text_bigram_lm; bigram-TYPE stats (bt/cs/ws) are Zipf-shaped
    vocabulary-sized relations built from ONE grouped pass over the
    positions (c1 = Σc2 rolls up from bt, never a second corpus scan);
    nbb is a one-row broadcast. Scoring joins hash on 8-byte-hashable
    token keys; frequency-floor + broadcast the model at deployment
    exactly as text_perplexity documents."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", tx.tokens_col(F.col("text")).alias("t")
    ).where(F.size("t") >= 2)
    pos = (
        base.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("transform(sequence(0, size(t)-2), i -> t[i])"),
                    F.expr("transform(sequence(0, size(t)-2), i -> t[i+1])"),
                )
            ).alias("z"),
        )
        .select(
            "doc_id", F.col("z.`0`").alias("ctx"), F.col("z.`1`").alias("w2")
        )
        .localCheckpoint(eager=False)  # model build + scoring join
    )
    bt = pos.groupBy("ctx", "w2").agg(
        F.count("*").cast("long").alias("c2")
    ).localCheckpoint(eager=False)  # cs, ws, nb, scoring
    cs = bt.groupBy("ctx").agg(
        F.sum("c2").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1fw"),
    )
    ws = bt.groupBy("w2").agg(F.count("*").cast("long").alias("n1bw"))
    nb = bt.agg(F.count("*").cast("long").alias("nbb"))
    p = (
        (F.col("c2") - F.lit(_KN_D)) / F.col("c1")
        + F.lit(_KN_D) * F.col("n1fw") / F.col("c1")
        * (F.col("n1bw").cast("double") / F.col("nbb"))
    )
    bq = F.floor(-F.log2(p) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    q = (
        pos.join(bt, ["ctx", "w2"])
        .join(cs, "ctx")
        .join(ws, "w2")
        .crossJoin(F.broadcast(nb))
        .select("doc_id", bq.alias("bq"))
    )
    from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn

    mean_bits = roundn(
        F.sum("bq").cast("double") / F.count("*") / F.lit(1000000.0), 4
    )
    return q.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        mean_bits.alias("bits_per_bigram"),
        F.pow(F.lit(2.0), mean_bits).alias("perplexity"),
    )


text_kneser_ney.__doc__ = text_kneser_ney.__doc__.format(d=_KN_D)
