"""Web-extraction tier: HTML → main-text extraction.

The single most common first stage of a web-scale LLM corpus pipeline
(WET extraction): strip markup, drop script/style payloads, separate
main content from nav/footer boilerplate, unescape entities, normalize
whitespace.  The channel is DETERMINISTIC — each document is wrapped in
a fixed page template (nav + h1 + paragraphs + script + style + entity
footer) so the extractor's recovery is exactly auditable per row, the
same discipline `fn_date_multiformat` uses for dirty dates.

Scale notes (100 TB): every step is a whole-stage-codegen
regexp_replace / regexp_extract_all projection — no shuffle, no Python;
the per-doc audit columns aggregate map-side if a rollup is stacked on
top.  Real crawl HTML varies in template, but the operator form (regex
cascade + tag-aware main-content selection) is exactly what runs at
scale; template diversity changes the patterns, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.plans.registry import query


@query(
    "text_html_extract",
    oracle="""
    WITH built AS (
        SELECT doc_id,
               TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')) AS clean_src,
               '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
               || '</title><style>p{margin:0} .nav{color:red}</style>'
               || '<script type="text/javascript">var id='
               || CAST(doc_id AS VARCHAR) || ';</script></head><body>'
               || '<nav><a href="/">Home</a> &middot; '
               || '<a href="/about">About</a></nav><h1>Doc '
               || CAST(doc_id AS VARCHAR) || '</h1><p>'
               || REPLACE(REPLACE(REPLACE(REPLACE(text,
                      '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                      ' table ', ' table</p><p>')
               || '</p><footer>&copy; 2024 Example &amp; Co.</footer>'
               || '</body></html>' AS html
        FROM documents),
    naive AS (
        SELECT doc_id, clean_src, html,
               TRIM(REGEXP_REPLACE(
                   REPLACE(REPLACE(REPLACE(
                       REGEXP_REPLACE(html, '<[^>]+>', ' ', 'g'),
                       '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
                   '\\s+', ' ', 'g')) AS naive_text
        FROM built),
    main AS (
        SELECT doc_id, clean_src, html, naive_text,
               TRIM(REGEXP_REPLACE(
                   REPLACE(REPLACE(REPLACE(
                       ARRAY_TO_STRING(
                           REGEXP_EXTRACT_ALL(html, '<p>(.*?)</p>', 1),
                           ' '),
                       '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
                   '\\s+', ' ', 'g')) AS main_text
        FROM naive)
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(html, '<[^>]+>')) AS BIGINT)
               AS tag_count,
           CAST(LENGTH(naive_text) AS BIGINT) AS n_naive,
           CAST(LENGTH(main_text) AS BIGINT) AS n_main,
           INSTR(naive_text, 'var id=') > 0 AS naive_script_leak,
           INSTR(main_text, 'var id=') > 0 AS main_script_leak,
           main_text = clean_src AS roundtrip_ok
    FROM main
    """,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus tier — HTML MAIN-TEXT EXTRACTION: wrap each document
    in a deterministic page template (title/style/script head, nav
    boilerplate, <p>-structured body with entity-escaped content,
    entity-bearing footer), then run the two extractors every crawl
    pipeline compares:

    * ``naive`` — strip all tags (``<[^>]+>``), unescape, collapse
      whitespace.  Keeps script bodies, CSS rules, nav text and footer
      — the classic leaky extraction (``naive_script_leak`` is TRUE by
      construction: ``var id=N;`` survives).
    * ``main`` — extract only ``<p>…</p>`` content regions
      (regexp_extract_all group 1), join, unescape, collapse.  Recovers
      the embedded document byte-for-byte: ``roundtrip_ok`` audits
      ``main_text = collapse(source)`` per row, exploiting that the
      paragraph splitter inserts ``</p><p>`` AT a word boundary whose
      separating space the join re-supplies.

    Escape/unescape are exact inverses by ordering (escape ``&`` first,
    unescape it last), so entity-bearing source text survives the
    channel — the law tests plant ``&``/``<``/``>`` to prove it.

    Portability: every pattern is shared Java-regex/RE2 ground —
    non-greedy ``.*?``, class ``[^>]``, ``\\s`` — no backreferences or
    lookaround; literal entity rewrites use plain REPLACE.

    100 TB: pure projection (whole-stage codegen), zero shuffles, zero
    Python; columns prune to (doc_id, text) at the scan.

    Reference parity: the reference's ingest stage moves raw files to a
    cleansed tier (gcs_sensor → transform tasks,
    dags/pipeline_orchestration_dag.py:64-120); markup-to-text is that
    cleanse step for web corpora.
    """
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    escaped = F.expr(
        "replace(replace(replace(replace(text,"
        " '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),"
        " ' table ', ' table</p><p>')"
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        did,
        F.lit("</title><style>p{margin:0} .nav{color:red}</style>"),
        F.lit('<script type="text/javascript">var id='),
        did,
        F.lit(";</script></head><body>"),
        F.lit('<nav><a href="/">Home</a> &middot; '),
        F.lit('<a href="/about">About</a></nav><h1>Doc '),
        did,
        F.lit("</h1><p>"),
        escaped,
        F.lit("</p><footer>&copy; 2024 Example &amp; Co.</footer>"),
        F.lit("</body></html>"),
    )

    # unescape (&lt; &gt; first, &amp; last — inverse of escape order),
    # collapse whitespace, trim: one shared SQL fragment per extractor.
    naive_sql = (
        "trim(regexp_replace("
        "replace(replace(replace("
        "regexp_replace(html, '<[^>]+>', ' '),"
        " '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),"
        " '\\\\s+', ' '))"
    )
    main_sql = (
        "trim(regexp_replace("
        "replace(replace(replace("
        "array_join(regexp_extract_all(html, '<p>(.*?)</p>', 1), ' '),"
        " '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),"
        " '\\\\s+', ' '))"
    )
    built = docs.select(
        "doc_id",
        F.expr("trim(regexp_replace(text, '\\\\s+', ' '))").alias(
            "clean_src"
        ),
        html.alias("html"),
    ).select(
        "doc_id",
        "clean_src",
        "html",
        F.expr(naive_sql).alias("naive_text"),
        F.expr(main_sql).alias("main_text"),
    )
    return built.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(html, '<[^>]+>', 0)"))
        .cast("long")
        .alias("tag_count"),
        F.length("naive_text").cast("long").alias("n_naive"),
        F.length("main_text").cast("long").alias("n_main"),
        (F.instr("naive_text", "var id=") > 0).alias("naive_script_leak"),
        (F.instr("main_text", "var id=") > 0).alias("main_script_leak"),
        (F.col("main_text") == F.col("clean_src")).alias("roundtrip_ok"),
    )


# --------------------------------------------------------------------------
# text_sentence_split — abbreviation-aware sentence segmentation
# --------------------------------------------------------------------------

#: the abbreviation lexicon the aware splitter protects (a period after
#: these tokens is NOT a sentence boundary)
_SENT_ABBREV = "(Dr|Mr|Mrs|Ms|etc|al|vs|approx)"

#: deterministic punctuation channel: the corpus text is unpunctuated,
#: so boundaries are planted at known words and a quoted lead-in plants
#: abbreviation traps for the naive splitter
_SENT_TXT_SQL = (
    "'Dr. Smith et al. said: ' || "
    "REPLACE(REPLACE(text, ' table ', '. '), ' query ', '! ') || '.'"
)


@query(
    "text_sentence_split",
    oracle=f"""
    WITH built AS (
        SELECT doc_id, {_SENT_TXT_SQL} AS txt FROM documents),
    counted AS (
        SELECT doc_id,
               CAST(LEN(REGEXP_EXTRACT_ALL(txt, '[.!?]+( |$)'))
                    AS BIGINT) AS n_boundaries_naive,
               CAST(LEN(REGEXP_EXTRACT_ALL(txt,
                        '{_SENT_ABBREV}\\. ')) AS BIGINT) AS n_abbrev,
               CAST(LEN(REGEXP_EXTRACT_ALL(txt, '[^ ]+')) AS BIGINT)
                   AS n_tokens
        FROM built)
    SELECT doc_id, n_boundaries_naive, n_abbrev,
           n_boundaries_naive - n_abbrev AS n_sentences,
           FLOOR(CAST(n_tokens AS DOUBLE)
                 / CAST(GREATEST(n_boundaries_naive - n_abbrev, 1)
                        AS DOUBLE) * 10000.0e0 + 0.5e0) / 10000.0e0
               AS mean_sentence_tokens
    FROM counted
    """,
)
def text_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tier — ABBREVIATION-AWARE SENTENCE SEGMENTATION: count
    sentence boundaries as terminal-punctuation runs followed by a
    space or end-of-text, then SUBTRACT the abbreviation misfires
    ("Dr.", "et al.", "vs." — the classic over-split every naive
    `split('[.!?]')` commits; the channel's lead-in plants two traps
    per document so the correction is always exercised).  Emits both
    counts so the over-split rate is itself auditable, plus the mean
    sentence length in tokens — the chunking parameter `doc_chunk`
    consumes.

    The punctuation channel is deterministic (the corpus is
    unpunctuated: boundaries are planted at known words), so every
    count has a closed-form expectation the laws pin.

    Portability: counting is `regexp_extract_all` length on both
    engines — no lookbehind (RE2 has none); the abbreviation guard is
    a plain alternation group.

    Exactness: pure integer counts; the ratio quantizes once at final
    projection with a GREATEST(n,1) floor guard.

    100 TB: whole-stage-codegen projection, zero shuffles, zero
    Python; a corpus rollup stacks one map-side aggregate on top.

    Reference parity: the reference's staging cleanse
    (dags/pipeline_orchestration_dag.py:96-120) normalizes raw text
    fields; segmentation is that normalization for document corpora.
    """
    docs = load_table(spark, sf_dir, "documents")
    built = docs.selectExpr("doc_id", f"{_SENT_TXT_SQL} AS txt")
    counted = built.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(txt, '[.!?]+( |$)', 0)"))
        .cast("long")
        .alias("n_boundaries_naive"),
        F.size(
            F.expr(f"regexp_extract_all(txt, '{_SENT_ABBREV}\\\\. ', 0)")
        )
        .cast("long")
        .alias("n_abbrev"),
        F.size(F.expr("regexp_extract_all(txt, '[^ ]+', 0)"))
        .cast("long")
        .alias("n_tokens"),
    )
    sent = F.col("n_boundaries_naive") - F.col("n_abbrev")
    return counted.select(
        "doc_id",
        "n_boundaries_naive",
        "n_abbrev",
        sent.alias("n_sentences"),
        (
            F.floor(
                F.col("n_tokens").cast("double")
                / F.greatest(sent, F.lit(1)).cast("double")
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("mean_sentence_tokens"),
    )


# --------------------------------------------------------------------------
# corpus_filter_ablation — per-rule ablation of the Gopher battery
# --------------------------------------------------------------------------

#: the same exact-integer rules as quality_gopher_rules — the ablation
#: must audit the battery actually shipped, not a copy that can drift
_ABL_RULES_SQL = """
        (n_words BETWEEN 20 AND 100000) AS r1,
        (3 * n_words <= sum_word_len
         AND sum_word_len <= 10 * n_words) AS r2,
        (n_stop >= 2) AS r3,
        (5 * n_alpha >= 4 * n_words) AS r4
"""


@query(
    "corpus_filter_ablation",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(toks, w -> length(w)))
                    AS BIGINT) AS sum_word_len,
               CAST(len(list_filter(toks, w -> w IN ('the', 'a')))
                    AS BIGINT) AS n_stop,
               CAST(len(list_filter(toks,
                        w -> regexp_matches(w, '^[a-z]+$')))
                    AS BIGINT) AS n_alpha
        FROM t),
    flags AS (SELECT doc_id, {_ABL_RULES_SQL} FROM m),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        FROM flags),
    per AS (
        SELECT 'r1_word_count' AS rule,
               CAST(SUM(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail,
               CAST(SUM(CASE WHEN NOT r1 AND r2 AND r3 AND r4
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_only
        FROM flags
        UNION ALL
        SELECT 'r2_mean_word_len',
               CAST(SUM(CASE WHEN NOT r2 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT r2 AND r1 AND r3 AND r4
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 'r3_stopwords',
               CAST(SUM(CASE WHEN NOT r3 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT r3 AND r1 AND r2 AND r4
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 'r4_alpha_fraction',
               CAST(SUM(CASE WHEN NOT r4 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT r4 AND r1 AND r2 AND r3
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags)
    SELECT p.rule, p.n_fail, p.n_fail_only,
           CAST(p.n_fail - p.n_fail_only AS BIGINT) AS n_fail_shared,
           CAST((p.n_fail * 1000000) // t.n_docs AS BIGINT)
               AS fail_ppm,
           CAST(t.n_pass + p.n_fail_only AS BIGINT)
               AS n_pass_if_relaxed,
           t.n_docs, t.n_pass
    FROM per p, tot t
    ORDER BY p.rule
    """,
)
def corpus_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-ops tier — FILTER ABLATION of the Gopher battery: for
    each of `quality_gopher_rules`' four hard rules, how many docs it
    fails, how many it ALONE removes (``n_fail_only`` — docs passing
    every other rule), how many failures are shared with other rules,
    and the corpus size recovered if the rule were relaxed — the table
    a data-quality owner reads before tightening or dropping a filter
    (a rule with n_fail_only≈0 is redundant; one with a huge unique
    share deserves a manual sample).  The rule EXPRESSIONS are the
    battery's own exact-integer comparisons, restated verbatim so the
    ablation audits the shipped filter, not a drifted copy.

    Exactness: all counts int64; the ppm rate is one integer DIV.

    100 TB: one token-grain projection (codegen, no shuffle) feeds
    four conditional aggregates that collapse map-side to 4 rows —
    the ablation costs one corpus scan regardless of rule count.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = docs.select(
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).alias("sum_word_len"),
        F.size(F.filter(toks, lambda w: w.isin("the", "a")))
        .cast("long")
        .alias("n_stop"),
        F.size(F.filter(toks, lambda w: w.rlike("^[a-z]+$")))
        .cast("long")
        .alias("n_alpha"),
    )
    flags = m.selectExpr(
        "(n_words BETWEEN 20 AND 100000) AS r1",
        "(3 * n_words <= sum_word_len"
        " AND sum_word_len <= 10 * n_words) AS r2",
        "(n_stop >= 2) AS r3",
        "(5 * n_alpha >= 4 * n_words) AS r4",
    )
    flags = flags.localCheckpoint(eager=False)  # totals + 4 rule rows
    tot = flags.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            F.when(
                F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_pass"),
    )
    names = {
        "r1": "r1_word_count",
        "r2": "r2_mean_word_len",
        "r3": "r3_stopwords",
        "r4": "r4_alpha_fraction",
    }
    rows = []
    for r, label in names.items():
        others = [o for o in names if o != r]
        cond_only = (
            ~F.col(r)
            & F.col(others[0])
            & F.col(others[1])
            & F.col(others[2])
        )
        rows.append(
            flags.agg(
                F.lit(label).alias("rule"),
                F.sum(F.when(~F.col(r), 1).otherwise(0))
                .cast("long")
                .alias("n_fail"),
                F.sum(F.when(cond_only, 1).otherwise(0))
                .cast("long")
                .alias("n_fail_only"),
            )
        )
    per = rows[0]
    for extra in rows[1:]:
        per = per.unionByName(extra)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "rule",
            "n_fail",
            "n_fail_only",
            (F.col("n_fail") - F.col("n_fail_only"))
            .cast("long")
            .alias("n_fail_shared"),
            F.expr(
                "CAST((n_fail * 1000000) DIV n_docs AS BIGINT)"
            ).alias("fail_ppm"),
            (F.col("n_pass") + F.col("n_fail_only"))
            .cast("long")
            .alias("n_pass_if_relaxed"),
            "n_docs",
            "n_pass",
        )
        .orderBy("rule")
    )
