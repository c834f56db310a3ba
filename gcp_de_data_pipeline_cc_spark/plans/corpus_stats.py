"""Corpus statistics wave: character-entropy and readability scoring.

Extends the text-analysis tier (plans/llm.py — tokens/quality/langid/
fingerprint) with the two remaining quality signals a training-data
curation pass computes per document: character-level Shannon entropy
(gibberish / compression-artifact detector) and surface readability
ratios (words per sentence, chars per word).

Both engines split text identically only when empties are filtered
explicitly — Java ``split`` and DuckDB ``regexp_split_to_array`` differ
on trailing-empty retention, so every split here is wrapped in a
non-empty filter before counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.catalog import load_table
from gcp_de_data_pipeline_cc_spark.functions.rounding import roundn, sql_roundn
from gcp_de_data_pipeline_cc_spark.plans.registry import query


@query(
    "text_entropy",
    oracle=f"""
    WITH chars AS (
        SELECT doc_id, UNNEST(string_split(text, '')) AS ch
        FROM documents),
    freq AS (
        SELECT doc_id, ch, COUNT(*) AS cnt
        FROM chars WHERE ch <> '' GROUP BY 1, 2),
    tot AS (
        SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_chars_split,
               CAST(COUNT(*) AS INT) AS n_distinct_chars
        FROM freq GROUP BY 1)
    SELECT f.doc_id, t.n_distinct_chars,
           {sql_roundn(
               "-SUM((f.cnt * 1.0 / t.n_chars_split)"
               " * log2(f.cnt * 1.0 / t.n_chars_split))", 6)} AS entropy
    FROM freq f JOIN tot t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id, t.n_distinct_chars
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document: explode characters,
    count per (doc, char), fold -Σ p·log2 p. Low entropy flags repeated-
    character junk; implausibly high entropy flags binary-in-text. The
    explode shuffles one row per character — at 100 TB prefer the
    narrow variant (aggregate over a fixed alphabet with higher-order
    functions); this formulation is the exact-alphabet reference.
    Doc-char counts are exact integers; only the final fold is float,
    ≤~100 terms per doc, rounded at 6."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("cnt"))
    tot = freq.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_chars_split"),
        F.count("*").cast("int").alias("n_distinct_chars"),
    )
    p = F.col("cnt") / F.col("n_chars_split")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id", "n_distinct_chars")
        .agg(roundn(-F.sum(p * F.log2(p)), 6).alias("entropy"))
    )


@query(
    "text_readability",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_words,
               CAST(len(list_filter(regexp_split_to_array(text, '[.!?]'),
                                    x -> trim(x) <> '')) AS BIGINT)
                   AS n_sentences,
               CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_letters
        FROM documents)
    SELECT doc_id, n_words, n_sentences,
           {sql_roundn("n_words * 1.0 / GREATEST(n_sentences, 1)", 4)}
               AS words_per_sentence,
           {sql_roundn("n_letters * 1.0 / GREATEST(n_words, 1)", 4)}
               AS chars_per_word
    FROM d
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface readability ratios per document: word count, sentence
    count (non-empty [.!?] segments), mean words/sentence and
    chars/word — the raw inputs of Flesch-style scores and a standard
    quality-filter feature. Pure codegen projections over higher-order
    size/filter — no explode, no shuffle, no UDF: the per-row narrow
    shape that scales linearly."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(
        F.filter(F.split("text", r"\s+"), lambda x: x != "")
    ).cast("bigint")
    n_sentences = F.size(
        F.filter(F.split("text", r"[.!?]"), lambda x: F.trim(x) != "")
    ).cast("bigint")
    n_letters = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "bigint"
    )
    d = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_letters.alias("n_letters"),
    )
    return d.select(
        "doc_id",
        "n_words",
        "n_sentences",
        roundn(
            F.col("n_words") * 1.0 / F.greatest("n_sentences", F.lit(1)), 4
        ).alias("words_per_sentence"),
        roundn(
            F.col("n_letters") * 1.0 / F.greatest("n_words", F.lit(1)), 4
        ).alias("chars_per_word"),
    )
