"""Semantic laws for the r5d wave: curriculum schedule."""

from __future__ import annotations

from gcp_de_data_pipeline_cc_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_curriculum_phases_are_monotone_and_token_balanced(spark):
    out = (
        REGISTRY["train_curriculum_schedule"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("phase")
        .reset_index(drop=True)
    )
    assert list(out.phase) == [0, 1, 2, 3]
    # phases are contiguous ranges of the (difficulty, doc_id) total
    # order: each phase's easiest doc is no easier than the previous
    # phase's hardest
    for i in range(1, len(out)):
        assert out.min_difficulty[i] >= out.max_difficulty[i - 1]
    # equal-token split: every phase lands near 1/4 of the corpus
    # tokens (off by at most one document's weight)
    assert abs(out.token_share.sum() - 1.0) < 1e-4
    assert (out.token_share > 0.15).all() and (out.token_share < 0.35).all()


def test_curriculum_counts_cover_corpus(spark):
    from gcp_de_data_pipeline_cc_spark.catalog import load_table

    out = REGISTRY["train_curriculum_schedule"].spark(spark, SF_DIR).toPandas()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert out.n_docs.sum() == n_docs
    # easy->hard means later phases hold fewer, longer documents
    assert out.n_docs.iloc[0] > out.n_docs.iloc[-1]
