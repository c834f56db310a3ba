"""Semantic tests for the corpus-curation wave 2 (plans/corpus2.py).

The differential suite already value-checks every key against DuckDB;
these tests pin the *properties* the operators promise: sampling
determinism, ratio bounds, containment-vs-Jaccard dominance, postings
integrity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_sample_weighted_deterministic_topk(spark):
    run = lambda: REGISTRY["sample_weighted"].spark(spark, SF_DIR)  # noqa: E731
    a = run().collect()
    b = run().collect()
    assert a == b, "weighted sample must be reproducible run-to-run"
    assert len(a) == 50
    keys = [r.sample_key for r in a]
    assert keys == sorted(keys, reverse=True)
    # A-Res keys ln(u)/w are strictly negative (u < 1)
    assert all(k < 0 for k in keys)


def test_sample_weighted_prefers_heavy_docs(spark):
    """Byte-weighted sampling should overrepresent long documents: the
    sampled mean n_chars must exceed the corpus mean."""
    sampled = REGISTRY["sample_weighted"].spark(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mean_sampled = sampled.agg(F.avg("n_chars")).first()[0]
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    assert mean_sampled > mean_all


def test_dedup_blocks_ratio_bounds(spark):
    rows = REGISTRY["dedup_blocks"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert 0.0 <= r.dup_ratio <= 1.0


def test_containment_dominates_jaccard(spark):
    """For any pair, max containment >= Jaccard (|∩|/min ≥ |∩|/union),
    so every Jaccard>=0.6 pair must appear in the containment>=0.6 set."""
    cont = REGISTRY["dedup_containment"].spark(spark, SF_DIR)
    jac = REGISTRY["dedup_ngram_jaccard"].spark(spark, SF_DIR)
    cont_pairs = {(r.doc_a, r.doc_b) for r in cont.collect()}
    jac_rows = [r for r in jac.collect() if r.jaccard >= 0.6]
    for r in jac_rows:
        assert (r.doc_a, r.doc_b) in cont_pairs
    for r in cont.collect():
        assert r.doc_a < r.doc_b
        assert 0.0 < r.cont_a_in_b <= 1.0
        assert 0.0 < r.cont_b_in_a <= 1.0


def test_perplexity_is_exp_of_bits(spark):
    rows = REGISTRY["text_perplexity"].spark(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r.bits_per_token > 0
        # ppl = 2^bits up to the independent roundings of each column
        assert abs(r.perplexity - 2 ** r.bits_per_token) / r.perplexity < 1e-3


def test_inverted_index_postings_integrity(spark):
    rows = REGISTRY["inverted_index"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ids = r.postings.split(",")
        assert len(ids) == r.doc_freq
        as_ints = [int(x) for x in ids]
        assert as_ints == sorted(as_ints)
        assert len(set(as_ints)) == len(as_ints)
