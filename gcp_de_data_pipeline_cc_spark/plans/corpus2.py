"""Corpus curation wave 2: language-model quality scoring, block-level
dedup, deterministic weighted sampling, containment near-dup, and an
inverted index.

Extends the LLM training-data tier (plans/llm.py, plans/corpus_stats.py)
with the remaining curation primitives a 100 TB pre-training pipeline
runs between raw crawl and tokenizer:

- **unigram perplexity** — the classic cheap LM quality filter (docs the
  corpus model finds surprising are junk or off-distribution);
- **block dedup** — the line/paragraph-level exact dedup pass (our feed
  is punctuation-free word soup, so "lines" are fixed 10-token blocks);
- **weighted sampling** — Efraimidis–Spirakis A-Res with a deterministic
  arithmetic uniform, so the sample is reproducible AND oracle-checkable;
- **containment join** — the asymmetric near-dup (doc A embedded inside
  doc B) that symmetric Jaccard under-scores;
- **inverted index** — term → sorted postings, the exact-retrieval
  baseline under the BM25/TF-IDF scorers.

All formulations are exact and engine-portable: integer counting,
identical double expression trees on both sides, rounding only at the
final projection (functions/rounding.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.operators import text as tx
from gcp_de_data_pipeline_cc_spark.plans.registry import query


@query(
    "text_perplexity",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents),
    cnt AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_corpus,
               CAST(COUNT(*) AS BIGINT) AS vocab
        FROM cnt)
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           {sql_roundn(
               "AVG(-log2((cnt.c + 1.0e0) / (tot.n_corpus + tot.vocab)))", 4)}
               AS bits_per_token,
           {sql_roundn(
               "POW(2.0e0,"
               " AVG(-log2((cnt.c + 1.0e0) / (tot.n_corpus + tot.vocab))))", 4)}
               AS perplexity
    FROM tok JOIN cnt USING (token) CROSS JOIN tot
    GROUP BY tok.doc_id
    """,
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring: train add-one-smoothed unigram
    probabilities on the corpus itself, then score every document by
    mean -log2 p(token) (bits/token) and its exponential (perplexity).
    The standard cheap LM filter a curation pipeline runs before any
    neural scorer — junk, boilerplate, and wrong-language docs sit in
    the perplexity tails.

    100 TB: token counting is the same explode→groupBy shuffle as
    text_tokens; the scoring join is keyed on token (vocabulary-sized —
    after a frequency floor it broadcasts), and the corpus totals are a
    one-row broadcast. No second corpus scan: the model and the scoring
    pass share the exploded-token relation."""
    from gcp_de_data_pipeline_cc_spark.plans.corpus_stats import (
        _signal_cached,
    )

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        tok = docs.select(
            "doc_id", F.explode(tx.tokens_col(F.col("text"))).alias("token")
        )
        cnt = tok.groupBy("token").agg(F.count("*").alias("c"))
        tot = cnt.agg(
            F.sum("c").alias("n_corpus"), F.count("*").alias("vocab")
        )
        bits = F.avg(
            -F.log2((F.col("c") + 1.0) / (F.col("n_corpus") + F.col("vocab")))
        )
        return (
            tok.join(cnt, "token")
            .crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_tokens"),
                roundn(bits, 4).alias("bits_per_token"),
                roundn(F.pow(F.lit(2.0), bits), 4).alias("perplexity"),
            )
        )

    # r10: session-shared with quality_composite_score (which consumes
    # this relation verbatim) — the corpus_stats._signal_cached pattern
    return _signal_cached(spark, sf_dir, "perplexity", build)


#: tokens per dedup block — the "line" analog for punctuation-free feeds
_BLOCK = 10

_BLOCKS_SQL = (
    # NB: // not CAST(/): DuckDB CAST(double AS BIGINT) rounds-to-nearest
    # while Spark's long cast truncates — 78 tokens must be 7 blocks
    f"list_transform(range(0, len(t) // {_BLOCK}), "
    f"i -> array_to_string(t[i * {_BLOCK} + 1 : i * {_BLOCK} + {_BLOCK}], ' '))"
)


@query(
    "dedup_blocks",
    oracle=f"""
    WITH sp AS (
        SELECT DISTINCT doc_id, UNNEST({_BLOCKS_SQL}) AS span
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= {_BLOCK}),
    shared AS (
        SELECT span, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM sp GROUP BY 1)
    SELECT sp.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN shared.n_docs >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_spans,
           {sql_roundn(
               "SUM(CASE WHEN shared.n_docs >= 2 THEN 1 ELSE 0 END)"
               " * 1.0e0 / COUNT(*)", 4)} AS dup_ratio
    FROM sp JOIN shared USING (span)
    GROUP BY sp.doc_id
    """,
)
def dedup_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level exact dedup (the line-level dedup pass of a crawl
    pipeline, adapted to a punctuation-free feed): split each document
    into non-overlapping 10-token blocks, count how many distinct
    documents each block appears in, and report the per-document share
    of blocks that are cross-document duplicates. Docs with high
    dup_ratio are template spam / boilerplate mirrors that whole-doc
    hashing misses.

    100 TB: one explode of ~n_tokens/10 spans per doc, one groupBy(span)
    carrying (span, doc_id) — at scale, hash spans to 8-byte keys first
    (same trade as dedup_ngram_hashjoin). The per-doc rollup re-keys by
    doc_id: bounded state, no driver participation."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", tx.tokens_col(F.col("text")).alias("t")
    ).filter(F.size("t") >= _BLOCK)
    sp = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (F.size("t") / _BLOCK).cast("long") - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("t"), i * _BLOCK + 1, _BLOCK)
                ),
            )
        ).alias("span"),
    ).distinct()
    shared = sp.groupBy("span").agg(F.count("*").alias("n_docs"))
    is_dup = F.when(F.col("n_docs") >= 2, 1).otherwise(0)
    return (
        sp.join(shared, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(is_dup).alias("n_dup_spans"),
            roundn(F.sum(is_dup) * 1.0 / F.count("*"), 4).alias("dup_ratio"),
        )
    )


#: Knuth multiplicative constant + a prime modulus: a deterministic
#: pseudo-uniform in (0,1) both engines compute identically in int64
_W_MULT = 2_654_435_761
_W_MOD = 1_000_003


@query(
    "sample_weighted",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ln(((doc_id * {_W_MULT}) % {_W_MOD} + 1.0e0)
                  / {_W_MOD + 1}.0e0) / n_chars AS skey
        FROM documents)
    SELECT doc_id, n_chars, {sql_roundn("skey", 6)} AS sample_key
    FROM keyed
    ORDER BY skey DESC, doc_id
    LIMIT 50
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via Efraimidis–Spirakis
    A-Res: each row draws key u^(1/w) (equivalently ln(u)/w, monotone)
    and the global top-k by key is an exact weighted sample. The uniform
    u is a deterministic multiplicative hash of doc_id, so the sample is
    reproducible run-to-run AND bit-identical across engines — the
    property a training-data lineage audit needs from its sampler.

    100 TB: per-row arithmetic (narrow, codegen) + one TakeOrderedAndProject
    top-k — partial top-50 per partition, merge at the driver; no global
    sort, no shuffle of the full table. Weight here is n_chars
    (byte-proportional sampling); any positive weight column works."""
    docs = load_table(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * _W_MULT) % _W_MOD + 1.0) / float(_W_MOD + 1)
    keyed = docs.select(
        "doc_id", "n_chars", (F.log(u) / F.col("n_chars")).alias("skey")
    )
    return (
        keyed.orderBy(F.desc("skey"), "doc_id")
        .limit(50)
        .select("doc_id", "n_chars", roundn(F.col("skey"), 6).alias("sample_key"))
    )


@query(
    "dedup_containment",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id, UNNEST(
            list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
            AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 3),
    cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_both
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b, CAST(n_both AS BIGINT) AS n_both,
           FLOOR(n_both * 1.0e0 / ca.n_sh * 1000000.0e0 + 0.5e0)
               / 1000000.0e0 AS cont_a_in_b,
           FLOOR(n_both * 1.0e0 / cb.n_sh * 1000000.0e0 + 0.5e0)
               / 1000000.0e0 AS cont_b_in_a
    FROM inter
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE GREATEST(n_both * 1.0e0 / ca.n_sh, n_both * 1.0e0 / cb.n_sh) >= 0.6
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: C(A→B) = |shingles(A) ∩
    shingles(B)| / |shingles(A)|. A short doc fully quoted inside a long
    one scores containment ≈ 1 while its symmetric Jaccard stays low —
    the quote/mirror/excerpt case every crawl dedup has to handle beyond
    plain Jaccard (dedup_ngram_jaccard).

    100 TB: identical shuffle shape to the shingle join (Σ|bucket|²
    candidate work, never all-pairs) — only the final scoring expression
    differs, so the hash-key shuffle mode of operators/dedup.py applies
    unchanged."""
    from gcp_de_data_pipeline_cc_spark.plans.llm import corpus_shingles

    # r10 (r9 verdict task #6 pattern): the full-corpus distinct
    # (doc_id, 3-shingle) relation is the SESSION corpus_shingles build
    # (identical rows — same tokenizer, k and distinct), shared with
    # the dedup family instead of re-tokenized per key.  It is already
    # checkpointed; it feeds both self-join sides and the size rollup.
    sh = corpus_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(
        F.count("*").alias("n_sh")
    ).localCheckpoint(eager=False)
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    c_ab = F.col("n_both") * 1.0 / F.col("n_a")
    c_ba = F.col("n_both") * 1.0 / F.col("n_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.greatest(c_ab, c_ba) >= 0.6)
        .select(
            "doc_a", "doc_b", "n_both",
            roundn(c_ab, 6).alias("cont_a_in_b"),
            roundn(c_ba, 6).alias("cont_b_in_a"),
        )
    )


@query(
    "inverted_index",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id, UNNEST(
            list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
            AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 3)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM sh
    GROUP BY term
    HAVING COUNT(*) BETWEEN 2 AND 40
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build over 3-gram shingles: term → document
    frequency and the sorted postings list — the exact-lookup structure
    under decontamination (find every training doc containing an eval
    n-gram without re-scanning the corpus) and the retrieval baseline
    beside text_bm25/text_tfidf. Indexing shingles rather than unigrams
    matters on a small-vocabulary feed: unigram df saturates at |corpus|
    while shingle df stays discriminative. Postings serialize to a CSV
    string so the driver's scalar canonicalizer can hash them; the
    df ∈ [2, 40] band bounds each list (head terms would be
    stopword-pruned, singletons carry no reuse signal).

    100 TB: one shingle explode→groupBy(term) — per-term state is the
    posting list, which the df cap bounds; real deployments shard hot
    terms (term, shard_of(doc_id)) and concatenate shards downstream,
    which this same plan expresses by adding the shard key to the
    groupBy."""
    from gcp_de_data_pipeline_cc_spark.plans.llm import corpus_shingles

    # r10: same session-shared relation as the dedup family (identical
    # distinct (doc_id, 3-shingle) rows — see dedup_containment note)
    sh = corpus_shingles(spark, sf_dir).withColumnRenamed(
        "shingle", "term"
    )
    return (
        sh.groupBy("term")
        .agg(
            F.count("*").alias("doc_freq"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .filter(F.col("doc_freq").between(2, 40))
    )


# ---------------------------------------------------------------------------
# cross-document repeated-substring spans (r4 wave)
# ---------------------------------------------------------------------------

#: token width of the duplicated-substring detector
_SPAN_K = 5


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT doc_id, i - 1 AS start,
               array_to_string(t[i:i+{_SPAN_K}-1], ' ') AS gram
        FROM d, UNNEST(range(1, len(t) - {_SPAN_K} + 2)) AS u(i)
        WHERE len(t) >= {_SPAN_K}),
    dup AS (
        SELECT gram FROM grams
        GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
    marked AS (
        SELECT DISTINCT g.doc_id, g.start
        FROM grams g JOIN dup USING (gram)),
    covered AS (
        SELECT DISTINCT doc_id, start + o AS p
        FROM marked, UNNEST(range(0, {_SPAN_K})) AS v(o)),
    isl AS (
        SELECT doc_id, p,
               p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p)
                   AS grp
        FROM covered)
    SELECT doc_id,
           CAST(MIN(p) AS BIGINT) AS span_start,
           CAST(MAX(p) AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS span_len
    FROM isl
    GROUP BY doc_id, grp
    ORDER BY doc_id, span_start
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — EXACT-SUBSTRING duplication spans (the public
    deduplicating-training-data methodology: repeated ≥{k}-token
    sequences ACROSS documents are memorization fuel even when whole
    docs aren't duplicates): every {k}-token window occurring in ≥2
    distinct documents marks its positions, and per document the
    covered positions merge into maximal spans (gaps-and-islands) —
    the span table a surgical dedup pass would cut, where whole-doc
    dedup (minhash/exact tiers) would either keep the overlap or drop
    the whole document.

    Exactness: grouping is on the raw {k}-gram STRING — collision-free
    and engine-identical; positions/spans are pure integer windows.

    100 TB: the gram build is a narrow in-array transform (no
    self-join); the duplicate filter is one groupBy (map-side combined;
    switch the group key to xxhash64(gram) to shuffle 8-byte keys —
    the dedup_ngram_hashjoin profile); coverage fan-out is bounded by
    {k}; the islands window partitions per doc_id (position-bounded
    state, never corpus-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    k = _SPAN_K
    d = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= k
    )
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - k),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("t"), i + 1, k)
                ),
            )
        ).alias("start", "gram"),
    )
    grams = grams.localCheckpoint(eager=False)  # dup filter + mark join
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    marked = grams.join(dup, "gram", "left_semi").select(
        "doc_id", "start"
    ).distinct()
    covered = marked.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("start"), F.col("start") + (k - 1))
        ).alias("p"),
    ).distinct()
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = covered.withColumn("grp", F.col("p") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            F.max("p").cast("long").alias("span_end"),
            F.count("*").cast("long").alias("span_len"),
        )
        .select("doc_id", "span_start", "span_end", "span_len")
        .orderBy("doc_id", "span_start")
    )


dedup_substring_spans.__doc__ = dedup_substring_spans.__doc__.format(
    k=_SPAN_K
)


# ---------------------------------------------------------------------------
# bigram-LM perplexity (r4n wave) — the conditional upgrade of the
# unigram filter above
# ---------------------------------------------------------------------------


@query(
    "text_bigram_lm",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pos AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(t)), i -> t[i])) AS ctx,
               UNNEST(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bg
        FROM base WHERE len(t) >= 2),
    cbg AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM pos GROUP BY 1),
    cctx AS (SELECT ctx, CAST(COUNT(*) AS BIGINT) AS c1 FROM pos GROUP BY 1),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM cctx),
    q AS (
        SELECT pos.doc_id,
               CAST(FLOOR(-log2((cbg.c2 + 1.0e0) / (cctx.c1 + v.v))
                          * 1000000.0e0 + 0.5e0) AS BIGINT) AS bq
        FROM pos JOIN cbg USING (bg) JOIN cctx USING (ctx) CROSS JOIN v)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           FLOOR(CAST(SUM(bq) AS DOUBLE) / COUNT(*) / 1000000.0e0
                 * 10000.0e0 + 0.5e0) / 10000.0e0 AS bits_per_bigram,
           POW(2.0e0,
               FLOOR(CAST(SUM(bq) AS DOUBLE) / COUNT(*) / 1000000.0e0
                     * 10000.0e0 + 0.5e0) / 10000.0e0) AS perplexity
    FROM q GROUP BY doc_id
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring — the CONDITIONAL upgrade of
    text_perplexity's unigram filter: train add-one-smoothed bigram
    probabilities p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V) on the corpus
    itself (V = context vocabulary), score every document by mean
    -log2 p and its exponential.  A document of common words in an
    UNCOMMON order (shuffled boilerplate, stitched spam) sails through
    the unigram filter and spikes here — exactly the gap the second
    rung closes; real curation stacks run both.

    Exactness: every bigram position's bit-cost is quantized to
    integer MICRO-BITS before the per-document sum (the libm log2 is
    an identical expression tree on both engines; after floor-
    quantization, summation order cannot move the total), ONE
    division at readout (4 dp), and the perplexity exponentiates the
    ALREADY-ROUNDED mean — identical doubles in, identical doubles
    out.

    100 TB: the position relation is the same explode->shuffle shape
    as the unigram key; both model tables are corpus-vocabulary-sized
    hash joins on 8-byte-hashable keys (frequency-floor + broadcast
    at deployment, documented in text_perplexity); V is a one-row
    broadcast.  No second corpus scan."""
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
                    F.expr(
                        "transform(sequence(0, size(t)-2),"
                        " i -> concat(t[i], ' ', t[i+1]))"
                    ),
                )
            ).alias("z"),
        )
        .select("doc_id", F.col("z.`0`").alias("ctx"), F.col("z.`1`").alias("bg"))
    )
    cbg = pos.groupBy("bg").agg(F.count("*").cast("long").alias("c2"))
    cctx = pos.groupBy("ctx").agg(F.count("*").cast("long").alias("c1"))
    v = cctx.agg(F.count("*").cast("long").alias("v"))
    bq = F.floor(
        -F.log2((F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("v")))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    q = (
        pos.join(cbg, "bg")
        .join(cctx, "ctx")
        .crossJoin(F.broadcast(v))
        .select("doc_id", bq.alias("bq"))
    )
    mean_bits = roundn(
        F.sum("bq").cast("double") / F.count("*") / F.lit(1000000.0), 4
    )
    return q.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        mean_bits.alias("bits_per_bigram"),
        F.pow(F.lit(2.0), mean_bits).alias("perplexity"),
    )
