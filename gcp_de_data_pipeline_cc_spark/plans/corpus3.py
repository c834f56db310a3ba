"""Corpus curation wave 3: tokenizer vocabulary coverage, prefix-block
dedup, and Zipf-law corpus profiling.

Completes the pre-tokenizer audit tier of the LLM training-data
pipeline (plans/llm.py, plans/corpus2.py, plans/corpus_stats.py):

- **vocab coverage / OOV rate** — after vocab_build picks a top-K
  vocabulary, every serving pipeline needs the complementary audit: what
  fraction of each document would tokenize out-of-vocabulary? High-OOV
  docs are wrong-language, corrupted, or domain-shifted — the cheap gate
  before spending tokenizer and GPU time on them;
- **prefix dedup** — template boilerplate detection: documents sharing
  an identical leading token block (scraped pages with common headers,
  mirrored articles) that full-document exact dedup misses when tails
  diverge; the asymmetric cousin of dedup_blocks (any-position spans);
- **Zipf fit** — the corpus-level sanity profile: natural-language token
  frequencies follow freq ∝ rank^s with s ≈ −1; a slope far from −1
  flags synthetic, deduplicated-to-death, or boilerplate-dominated
  corpora. Fit by least squares on (ln rank, ln freq), i.e. the SQL:2003
  regr_* aggregates both engines implement.

Float discipline: ln/regr expression trees are identical on both sides
and rounded at final projection (functions/rounding.py); ranks and
counts are exact integers with deterministic (freq DESC, token ASC)
tie-breaks so the top-K cut is engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.operators import text as tx
from gcp_de_data_pipeline_cc_spark.plans.registry import query

# Cut sizes are sized to the fixture lexicon (31 distinct tokens — see
# TESTDATA.md word-soup generator) so both cuts are REAL at test scale:
# a 500-token vocab over a 31-token lexicon would make OOV identically
# zero and the audit vacuous. At production scale these become 32k-vocab
# / top-10k-rank parameters; the plans only depend on K ≪ vocabulary.
VOCAB_K = 20  # top-K vocabulary size for the coverage audit
ZIPF_K = 25  # head ranks fitted by the Zipf regression
PREFIX_LEN = 8  # leading tokens hashed by the prefix-dedup pass


@query(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents),
    vocab AS (
        SELECT token FROM (
            SELECT token, COUNT(*) AS c FROM tok GROUP BY 1
            ORDER BY c DESC, token ASC LIMIT {VOCAB_K})),
    scored AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) FILTER (v.token IS NULL) AS BIGINT) AS n_oov
        FROM tok t LEFT JOIN vocab v USING (token)
        GROUP BY t.doc_id)
    SELECT doc_id, n_tokens, n_oov,
           {sql_roundn("n_oov * 1.0e0 / n_tokens", 4)} AS oov_rate
    FROM scored
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit: build the top-{K} corpus vocabulary
    (frequency-ranked, deterministic freq DESC / token ASC tie-break so
    the cut is engine-portable), then score every document's token count,
    OOV count, and OOV rate against it. The standing companion to
    vocab_build — a tokenizer's vocab is only as good as the corpus
    coverage it buys, and per-doc OOV rate is the curation gate that
    catches wrong-language and corrupted documents before tokenization.

    100 TB: token counting is the shared explode→groupBy shuffle; the
    vocabulary cut is TakeOrderedAndProject (partial top-K on every
    partition, no global sort), and the coverage join broadcasts the
    K-row vocab into the exploded-token relation — one shuffle total
    beyond the count."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tx.tokens_col(F.col("text"))).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(VOCAB_K)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            roundn(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_rate"),
        )
    )


vocab_coverage.__doc__ = vocab_coverage.__doc__.replace("{K}", str(VOCAB_K))


@query(
    "dedup_prefix",
    oracle=f"""
    WITH p AS (
        SELECT doc_id,
               array_to_string(
                   list_slice(string_split(text, ' '), 1, {PREFIX_LEN}),
                   ' ') AS prefix
        FROM documents),
    g AS (
        SELECT prefix, CAST(COUNT(*) AS BIGINT) AS group_size,
               MIN(doc_id) AS keeper_doc_id
        FROM p GROUP BY 1 HAVING COUNT(*) >= 2)
    SELECT p.doc_id, g.group_size, g.keeper_doc_id,
           p.doc_id = g.keeper_doc_id AS is_keeper
    FROM p JOIN g USING (prefix)
    """,
)
def dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-block dedup: documents sharing an identical leading
    {P}-token block — the template-boilerplate signature (mirrored
    articles, scraped pages with common headers) that whole-document
    exact dedup misses once tails diverge. Emits every member of a
    shared-prefix group with its group size, the min-doc_id keeper, and
    a keep flag, matching the keeper convention of dedup_exact.

    100 TB: the prefix is a scan-side substring (no explode — slice of
    the token split, stays in codegen), and the only shuffle carries
    (prefix, doc_id); at scale the prefix string collapses to an 8-byte
    xxhash64 key exactly like dedup_ngram_hashjoin's join_on_hash
    mode. Group state is two counters — no text ever aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.slice(F.split(F.col("text"), " "), 1, PREFIX_LEN)
        ).alias("prefix"),
    )
    g = (
        p.groupBy("prefix")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("group_size") >= 2)
    )
    return p.join(g, "prefix").select(
        "doc_id",
        "group_size",
        "keeper_doc_id",
        (F.col("doc_id") == F.col("keeper_doc_id")).alias("is_keeper"),
    )


dedup_prefix.__doc__ = dedup_prefix.__doc__.replace("{P}", str(PREFIX_LEN))


@query(
    "corpus_zipf",
    oracle=f"""
    WITH cnt AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT UNNEST(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY 1),
    ranked AS (
        SELECT c,
               ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS rank
        FROM cnt),
    head AS (SELECT * FROM ranked WHERE rank <= {ZIPF_K})
    SELECT CAST((SELECT COUNT(*) FROM cnt) AS BIGINT) AS vocab_size,
           CAST(COUNT(*) AS BIGINT) AS n_fitted,
           {sql_roundn("regr_slope(ln(c * 1.0e0), ln(rank * 1.0e0))", 4)}
               AS zipf_slope,
           {sql_roundn("regr_r2(ln(c * 1.0e0), ln(rank * 1.0e0))", 4)}
               AS fit_r2
    FROM head
    """,
)
def corpus_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law corpus profile: least-squares slope of ln(freq) against
    ln(rank) over the top-{Z} token ranks, plus the fit R². Natural
    language sits near slope −1; a flat slope flags boilerplate-dominated
    or synthetic text, a cliff flags a deduplicated-to-death head — the
    one-row corpus health metric a curation pipeline tracks per snapshot.

    100 TB: token counts are the standard explode→groupBy; the rank
    window runs AFTER a TakeOrderedAndProject top-{Z} cut, so the
    single-partition row_number touches {Z} rows, never the vocabulary
    (deterministic freq DESC / token ASC order on both engines). The
    regression is a single-pass co-moment aggregate over {Z} rows, and
    vocab_size rides along as a one-row broadcast cross join."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.select(
        F.explode(tx.tokens_col(F.col("text"))).alias("token")
    ).groupBy("token").agg(F.count("*").alias("c"))
    head = (
        cnt.orderBy(F.desc("c"), F.asc("token"))
        .limit(ZIPF_K)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("c"), F.asc("token"))
            ),
        )
    )
    vocab_size = cnt.agg(F.count("*").alias("vocab_size"))
    ln_c = F.log(F.col("c").cast("double"))
    ln_r = F.log(F.col("rank").cast("double"))
    fitted = head.agg(
        F.count("*").alias("n_fitted"),
        roundn(F.regr_slope(ln_c, ln_r), 4).alias("zipf_slope"),
        roundn(F.regr_r2(ln_c, ln_r), 4).alias("fit_r2"),
    )
    return vocab_size.crossJoin(fitted).select(
        "vocab_size", "n_fitted", "zipf_slope", "fit_r2"
    )


corpus_zipf.__doc__ = corpus_zipf.__doc__.replace("{Z}", str(ZIPF_K))
