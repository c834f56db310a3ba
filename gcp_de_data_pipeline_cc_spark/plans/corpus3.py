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


SNM_WINDOW = 3  # sorted-neighborhood slide width (compare next W-1 docs)
SNM_THRESHOLD = 0.5  # token-set Jaccard at/above which a pair is emitted


@query(
    "dedup_sorted_neighborhood",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               array_to_string(
                   list_slice(string_split(text, ' '), 1, 2), ' ') AS block,
               list_distinct(string_split(text, ' ')) AS toks
        FROM documents),
    nbr AS (
        SELECT doc_id AS doc_a, toks AS toks_a, block,
               LEAD(doc_id, 1) OVER w AS doc_b1,
               LEAD(toks, 1) OVER w AS toks_b1,
               LEAD(doc_id, 2) OVER w AS doc_b2,
               LEAD(toks, 2) OVER w AS toks_b2
        FROM keyed
        WINDOW w AS (PARTITION BY block ORDER BY n_chars, doc_id)),
    pairs AS (
        SELECT doc_a, doc_b1 AS doc_b, toks_a, toks_b1 AS toks_b
        FROM nbr WHERE doc_b1 IS NOT NULL
        UNION ALL
        SELECT doc_a, doc_b2, toks_a, toks_b2
        FROM nbr WHERE doc_b2 IS NOT NULL),
    scored AS (
        SELECT doc_a, doc_b,
               CAST(length(list_intersect(toks_a, toks_b)) AS DOUBLE)
                   / (length(toks_a) + length(toks_b)
                      - length(list_intersect(toks_a, toks_b))) AS jac
        FROM pairs)
    SELECT doc_a, doc_b, {sql_roundn("jac", 4)} AS jaccard
    FROM scored WHERE jac >= {SNM_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup — the third near-dup family beside the
    shingle join (content-bucketed) and MinHash/SimHash (signature-
    bucketed): sort within a cheap blocking key (leading 2-token block,
    then length), slide a width-{W} window, and score only adjacent
    candidates with token-set Jaccard. SNM's bet is that near-dups sort
    near each other — it catches the boilerplate-family pairs prefix
    blocking finds, at linear candidate count (W−1 per doc), and is the
    classic entity-resolution screen when LSH tuning is too heavy.

    100 TB: no global sort — the sort lives INSIDE blocks (one window
    shuffle on the blocking key), and candidates are (W−1)·n, not
    Σ|block|²; the window carries distinct-token arrays, whose size is
    bounded by the lexicon. Multi-pass SNM (second sort key, union of
    pair sets) is the documented extension — same plan, different key."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("block"),
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    w = Window.partitionBy("block").orderBy("n_chars", "doc_id")
    nbr = keyed.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        *[
            c
            for i in range(1, SNM_WINDOW)
            for c in (
                F.lead("doc_id", i).over(w).alias(f"doc_b{i}"),
                F.lead("toks", i).over(w).alias(f"toks_b{i}"),
            )
        ],
    )
    pairs = None
    for i in range(1, SNM_WINDOW):
        p = nbr.filter(F.col(f"doc_b{i}").isNotNull()).select(
            "doc_a",
            F.col(f"doc_b{i}").alias("doc_b"),
            "toks_a",
            F.col(f"toks_b{i}").alias("toks_b"),
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = (
        F.size("toks_a") + F.size("toks_b")
        - F.size(F.array_intersect("toks_a", "toks_b"))
    )
    scored = pairs.select(
        "doc_a", "doc_b", (inter / union).alias("jac")
    )
    return (
        scored.filter(F.col("jac") >= SNM_THRESHOLD)
        .select("doc_a", "doc_b", roundn(F.col("jac"), 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


dedup_sorted_neighborhood.__doc__ = dedup_sorted_neighborhood.__doc__.replace(
    "{W}", str(SNM_WINDOW)
)


@query(
    "text_ttr",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types
        FROM tok GROUP BY 1),
    hapax AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_hapax
        FROM (SELECT doc_id, token FROM tok
              GROUP BY 1, 2 HAVING COUNT(*) = 1)
        GROUP BY 1)
    SELECT p.doc_id, p.n_tokens, p.n_types,
           {sql_roundn("p.n_types * 1.0e0 / p.n_tokens", 4)} AS ttr,
           COALESCE(h.n_hapax, 0) AS n_hapax,
           {sql_roundn("COALESCE(h.n_hapax, 0) * 1.0e0 / p.n_types", 4)}
               AS hapax_share
    FROM per_doc p LEFT JOIN hapax h USING (doc_id)
    """,
)
def text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity audit: per-document type-token ratio
    (distinct-token share — the standard vocabulary-richness measure)
    and hapax profile (types used exactly once in the doc, and their
    share of the doc's types). The curation signal orthogonal to
    text_repetition: templated/boilerplate docs sit at LOW TTR with few
    hapax, keyboard-mash/corrupted docs at TTR ≈ 1 — both tails are
    filter candidates before tokenizer time.

    100 TB: one explode→groupBy(doc_id, token) shuffle produces both
    the type counts and the hapax flags (HAVING count=1 is a filter on
    the same aggregate); the per-doc rollups re-aggregate doc-keyed
    rows — no second pass over text. Bounded state: distinct-token
    space per doc is lexicon-bounded.

    Fixture note: the 31-token word-soup lexicon means long docs
    saturate types at 31 and TTR falls with length — the audit's
    discriminative regime is short docs, which is also where curation
    uses it."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tx.tokens_col(F.col("text"))).alias("token")
    )
    dt = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    per_doc = dt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.count(F.when(F.col("c") == 1, 1)).alias("n_hapax"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        roundn(F.col("n_types") / F.col("n_tokens"), 4).alias("ttr"),
        "n_hapax",
        roundn(F.col("n_hapax") / F.col("n_types"), 4).alias("hapax_share"),
    )
